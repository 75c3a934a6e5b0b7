"""Headline benchmark: env-steps/s/chip on TSP-100 AM, rollout + train step.

Two measured quantities (BASELINE.md north star is *training* throughput):

1. rollout: the reference's `multistart_greedy` evaluation protocol
   (`rl4co/tasks/eval.py:350-377`) — one batch of 256 instances decodes
   25,600 trajectories of length 100. The untiled-cache grouped decode
   shares each instance's K/V across its 100 starts (starts become the
   MXU's M dimension).
2. train: the full jitted REINFORCE train step (on-device data generation,
   sampling rollout, rollout-baseline greedy re-rollout, backward, Adam) in
   bf16-mixed — the reference recipe's per-step work. env-steps counts the
   *training* trajectories only (batch × N), matching the reference's
   samples/epoch accounting; the baseline rollout is uncounted overhead.

Prints exactly one JSON line. ``vs_baseline`` divides the train-step number
by an A100 ESTIMATE (the reference publishes no measured numbers and its
torch/tensordict stack is not installed here — see BASELINE.md); the
``baseline_kind`` field marks it as such.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

# ESTIMATE of the reference's A100 throughput on the rollout protocol
# (~150k env-steps/s: its Python decode loop re-launches kernels per token).
# No measured reference number exists (BASELINE.md: "published": {}).
A100_ESTIMATE_ENV_STEPS_PER_S = 150_000.0

BATCH = 256
NUM_STARTS = 100
NUM_LOC = 100
ITERS = 10
TRAIN_BATCH = 512
TRAIN_ITERS = 10


def bench_rollout(env, policy, params):
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models import rollout

    spec = DecodeSpec(
        kind="greedy", multistart=True, num_starts=NUM_STARTS, tanh_clipping=10.0
    )

    @jax.jit
    def fwd(params, instances, key):
        return rollout(policy, params, env, instances, key, spec).reward

    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    key = jax.random.PRNGKey(2)
    # NOTE: fetch to host for timing — on the axon platform
    # block_until_ready does not actually block.
    np.asarray(fwd(params, instances, key))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(ITERS):
        reward = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(reward)
    dt = time.perf_counter() - t0
    return BATCH * NUM_STARTS * NUM_LOC * ITERS / dt


def bench_train_step(env, policy):
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.rl.reinforce import REINFORCE

    algo = REINFORCE(
        env=env, policy=policy, baseline="rollout",
        train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0,
                              compute_dtype="bfloat16"),
    )
    state = algo.init(jax.random.PRNGKey(0))
    step = algo.make_train_step(TRAIN_BATCH)
    key = jax.random.PRNGKey(3)
    state, m = step(state, key)  # compile + warmup
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for i in range(TRAIN_ITERS):
        state, m = step(state, jax.random.fold_in(key, i))
    np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    return TRAIN_BATCH * NUM_LOC * TRAIN_ITERS / dt


def main():
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.models.policies.constructive import init_policy_params
    from rl4co_tpu.utils.dtype import cast_floating

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    params32 = init_policy_params(policy, env, jax.random.PRNGKey(0))

    rollout_rate = bench_rollout(env, policy, cast_floating(params32))
    train_rate = bench_train_step(env, policy)

    print(
        json.dumps(
            {
                "metric": "train env-steps/s/chip (TSP-100 AM REINFORCE+rollout-bl, bf16)",
                "value": round(train_rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(train_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3),
                "baseline_kind": "estimate (A100 reference unmeasured; BASELINE.md)",
                "rollout_env_steps_per_s": round(rollout_rate, 1),
                "rollout_vs_baseline_estimate": round(
                    rollout_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
