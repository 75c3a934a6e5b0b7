"""The 16-variant multi-task VRP (MTVRP) environment.

Reference counterpart: `examples/other/1-mtvrp.ipynb`
(`rl4co/envs/routing/mtvrp/env.py:16-70`: one env covering all
C/O/B/L/TW feature combinations, mixed within a batch, plus classical
solver baselines `mtvrp/baselines/solve.py`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.constructive import init_policy_params

VARIANTS = ["cvrp", "ovrp", "vrpb", "vrpl", "vrptw", "ovrptw", "all"]


def main(num_loc=10, batch=16):
    policy = AttentionModelPolicy(env_name="mtvrp")
    for preset in VARIANTS:
        env = get_env("mtvrp", num_loc=num_loc, variant_preset=preset)
        params = init_policy_params(policy, env, jax.random.PRNGKey(0))
        test = env.generate_batch(jax.random.PRNGKey(1), batch)
        out = rollout(policy, params, env, test, jax.random.PRNGKey(2),
                      DecodeSpec(kind="greedy", tanh_clipping=10.0))
        # every solution is feasibility-checked for its own variant flags
        for b in range(batch):
            inst = jax.tree_util.tree_map(lambda x: x[b], test)
            env.check_solution_validity(inst, np.asarray(out.actions)[b])
        print(f"variant_preset={preset:<8} greedy mean cost "
              f"{-float(out.reward.mean()):8.4f}  (all {batch} valid)")

    # classical baseline through the env's solve hook (in-tree greedy
    # fallback; pyvrp/LKH/OR-Tools adapters activate when installed)
    env = get_env("mtvrp", num_loc=num_loc, variant_preset="cvrp")
    test = env.generate_batch(jax.random.PRNGKey(3), 4)
    actions, costs = env.solve(test, max_runtime=1.0)
    print(f"classical solve hook: mean cost {float(np.mean(costs)):.4f}")


if __name__ == "__main__":
    main()
