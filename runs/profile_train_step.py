#!/usr/bin/env python
"""Decompose the TSP-50/100 REINFORCE train step's on-chip time.

The quality-run pace (round 3: 0.133 s/step at TSP-50 batch 512 ≈ 2.7 ms
per decode token) is far above both the FLOP and HBM speed-of-light for
these shapes, pointing at per-token kernel overhead inside the scan. This
script times the step's pieces separately to locate the cost:

    encoder      — one batched encoder forward
    rollout_s    — sampling rollout (encode + 50-token scan)
    rollout_g    — greedy rollout (the baseline's extra forward)
    grad         — full loss backward
    step         — the complete train step (grad + baseline + adam)

Writes runs/profile_train_step.json and optionally a jax.profiler trace.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import numpy as np


def timed(fn, *args, iters=10, fetch=None):
    fetch = fetch or (lambda out: np.asarray(jax.tree_util.tree_leaves(out)[0]))
    out = fn(*args)
    fetch(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-loc", type=int, default=50)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace-dir", default=None,
                    help="also capture a jax.profiler trace of the full step")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset: encoder,rollout,grad,step")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = get_env("tsp", num_loc=args.num_loc)
    policy = AttentionModelPolicy(env_name="tsp")
    spec = DecodeSpec(kind="sampling", tanh_clipping=10.0,
                      compute_dtype="bfloat16")
    algo = REINFORCE(env=env, policy=policy, baseline="rollout",
                     train_spec=spec, lr=1e-4)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = algo.init(jax.random.PRNGKey(0))
        instances = env.generate_batch(jax.random.PRNGKey(1), args.batch)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    instances = jax.device_put(instances, dev)
    key = jax.random.PRNGKey(2)

    results = {}

    # encoder only (bf16, as in the train spec); fetch one scalar, not the
    # [B, N, D] output (13 MB over the tunnel distorts the timing)
    from rl4co_tpu.utils.dtype import cast_floating
    import jax.numpy as jnp

    if want("encoder"):
        bf16 = cast_floating(state.params, jnp.bfloat16)
        enc = jax.jit(
            lambda p, i: policy.apply(p, i, method="encode").sum())
        results["encoder_ms"] = 1e3 * timed(enc, bf16, instances,
                                            iters=args.iters, fetch=np.asarray)

    # sampling rollout fwd
    if want("rollout"):
        roll_s = jax.jit(
            lambda p, i, k: rollout(policy, p, env, i, k, spec).reward
        )
        results["rollout_sampling_ms"] = 1e3 * timed(
            roll_s, state.params, instances, key, iters=args.iters,
            fetch=np.asarray)

    # greedy rollout fwd (baseline's forward)
    gspec = DecodeSpec(kind="greedy", tanh_clipping=10.0,
                       compute_dtype="bfloat16")
    if want("rollout"):
        roll_g = jax.jit(
            lambda p, i, k: rollout(policy, p, env, i, k, gspec).reward
        )
        results["rollout_greedy_ms"] = 1e3 * timed(
            roll_g, state.params, instances, key, iters=args.iters,
            fetch=np.asarray)

    # grad of the loss (includes both rollouts + backward)
    if want("grad"):
        grad = jax.jit(lambda p, b, i, k: jax.grad(
            lambda pp: algo.loss(pp, b, i, k)[0])(p))
        results["grad_ms"] = 1e3 * timed(
            grad, state.params, state.baseline_state, instances, key,
            iters=args.iters)

    # full train step
    if want("step"):
        step = algo.make_train_step(args.batch, donate=False)
        results["train_step_ms"] = 1e3 * timed(
            step, state, key, iters=args.iters,
            fetch=lambda out: np.asarray(out[1]["loss"]))

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        for i in range(3):
            _, m = step(state, jax.random.fold_in(key, i))
        np.asarray(m["loss"])
        jax.profiler.stop_trace()
        results["trace_dir"] = args.trace_dir

    results.update(
        num_loc=args.num_loc, batch=args.batch, iters=args.iters,
        device=str(jax.devices()[0]), argv=sys.argv,
    )
    if "train_step_ms" in results:
        results["env_steps_per_s_train"] = (
            args.batch * args.num_loc / (results["train_step_ms"] / 1e3))
    out = os.path.join(ROOT, "runs", "profile_train_step.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
