"""Headline benchmark: env-steps/s/chip on TSP-100 AM greedy rollout.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference repo publishes no numbers (BASELINE.md); the A100
anchor used here is an estimate of the reference AM TSP-100 greedy-rollout
throughput (Python decode loop, batch 1024, fp16) of ~150k env-steps/s.
north_star (BASELINE.json) asks for >=5x that.
"""

import json
import time

import jax

A100_BASELINE_ENV_STEPS_PER_S = 150_000.0

BATCH = 2048
NUM_LOC = 100
ITERS = 10


def main():
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(kind="greedy", tanh_clipping=10.0)

    @jax.jit
    def fwd(params, instances, key):
        return rollout(policy, params, env, instances, key, spec).reward

    import numpy as np

    key = jax.random.PRNGKey(2)
    # NOTE: fetch to host for timing — on the axon platform
    # block_until_ready does not actually block.
    np.asarray(fwd(params, instances, key))  # compile + warmup

    t0 = time.perf_counter()
    for i in range(ITERS):
        reward = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(reward)
    dt = time.perf_counter() - t0

    env_steps_per_s = BATCH * NUM_LOC * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (TSP-100 AM greedy rollout)",
                "value": round(env_steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps_per_s / A100_BASELINE_ENV_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
