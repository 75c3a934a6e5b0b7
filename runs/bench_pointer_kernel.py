#!/usr/bin/env python
"""On-chip benchmark: Pallas fused pointer decode vs XLA, N ∈ {100, 500, 1000}.

VERDICT r1 #2 done-criterion: measure the kernel against the XLA decode path
on the real TPU at small and large N, and flip the policy default where the
kernel wins. Also records the TSP-500/1000 rollout numbers SURVEY §5's
long-context levers call for (VERDICT r1 #10).

Usage (TPU):  python runs/bench_pointer_kernel.py [--batch 128] [--iters 5]
Writes runs/pointer_kernel_bench.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np


def bench_rollout(env, policy, params, batch, iters, key, num_starts=0):
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models import rollout

    if num_starts:
        spec = DecodeSpec(kind="greedy", multistart=True,
                          num_starts=num_starts, tanh_clipping=10.0)
    else:
        spec = DecodeSpec(kind="greedy", tanh_clipping=10.0)

    @jax.jit
    def fwd(params, instances, k):
        return rollout(policy, params, env, instances, k, spec).reward

    with jax.default_device(jax.devices("cpu")[0]):
        instances = env.generate_batch(key, batch)
    instances = jax.device_put(instances, jax.devices()[0])
    r = fwd(params, instances, key)
    np.asarray(r)  # compile + sync (axon: block_until_ready doesn't block)
    t0 = time.perf_counter()
    for i in range(iters):
        r = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    return dt, float(np.asarray(r).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sizes", type=int, nargs="+", default=[100, 500, 1000])
    args = ap.parse_args()

    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.models.policies.constructive import init_policy_params

    results = {}
    key = jax.random.PRNGKey(0)
    # (label, num_loc, batch, num_starts): greedy single-start at each N, plus
    # the grouped-multistart product shape (bench.py's headline protocol)
    cases = [(f"tsp{n}_greedy", n, args.batch, 0) for n in args.sizes]
    cases.append(("tsp100_multistart100", 100, 256, 100))
    for label, n, batch, starts in cases:
        env = get_env("tsp", num_loc=n)
        row = {}
        # params are impl-independent (pointer_impl changes the kernel,
        # not the parameters); init once on the CPU backend with the XLA
        # variant — tracing the pallas variant under a CPU default_device
        # would hit pallas' CPU lowering (interpret-only)
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_policy_params(
                AttentionModelPolicy(env_name="tsp", pointer_impl="xla"),
                env, key)
        params = jax.device_put(params, jax.devices()[0])
        for impl in ("xla", "pallas"):
            policy = AttentionModelPolicy(env_name="tsp", pointer_impl=impl)
            try:
                dt, r = bench_rollout(env, policy, params, batch,
                                      args.iters, jax.random.fold_in(key, n),
                                      num_starts=starts)
                row[impl] = {
                    "s_per_rollout": round(dt, 4),
                    "env_steps_per_s": round(batch * max(1, starts) * n / dt, 1),
                    "mean_reward": round(r, 3),
                }
            except Exception as e:  # record the failure mode, keep going
                row[impl] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({"case": label, "impl": impl, **row[impl]}), flush=True)
        if "error" not in row.get("xla", {}) and "error" not in row.get("pallas", {}):
            row["pallas_speedup"] = round(
                row["xla"]["s_per_rollout"] / row["pallas"]["s_per_rollout"], 3
            )
        results[label] = row

    out = {"batch": args.batch, "iters": args.iters,
           "device": str(jax.devices()[0]), "results": results}
    path = os.path.join(ROOT, "runs", "pointer_kernel_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
