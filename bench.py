"""Headline benchmark: env-steps/s/chip on TSP-100 AM rollout.

Protocol: the reference's `multistart_greedy` evaluation
(`rl4co/tasks/eval.py:350-377`) — every node is a start, so one batch of 256
instances decodes 25,600 trajectories of length 100. This framework's
untiled-cache grouped decode shares each instance's K/V across its 100
starts (the starts become the MXU's M dimension), which is where the TPU
design wins big over per-trajectory decoding.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md). The anchor is an
estimate of the reference's A100 throughput on the same protocol
(~150k env-steps/s: its Python decode loop re-launches kernels per token and
tiles K/V per start, so multistart does not change its per-step rate).
north_star (BASELINE.json) asks for >=5x.
"""

import json
import time

import jax
import numpy as np

A100_BASELINE_ENV_STEPS_PER_S = 150_000.0

BATCH = 256
NUM_STARTS = 100
NUM_LOC = 100
ITERS = 10


def main():
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params
    from rl4co_tpu.utils.dtype import cast_floating

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    params = cast_floating(init_policy_params(policy, env, jax.random.PRNGKey(0)))
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(
        kind="greedy", multistart=True, num_starts=NUM_STARTS, tanh_clipping=10.0
    )

    @jax.jit
    def fwd(params, instances, key):
        return rollout(policy, params, env, instances, key, spec).reward

    key = jax.random.PRNGKey(2)
    # NOTE: fetch to host for timing — on the axon platform
    # block_until_ready does not actually block.
    np.asarray(fwd(params, instances, key))  # compile + warmup

    t0 = time.perf_counter()
    for i in range(ITERS):
        reward = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(reward)
    dt = time.perf_counter() - t0

    env_steps_per_s = BATCH * NUM_STARTS * NUM_LOC * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (TSP-100 AM multistart_greedy rollout)",
                "value": round(env_steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps_per_s / A100_BASELINE_ENV_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
