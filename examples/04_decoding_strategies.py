"""Decoding strategies side by side on one trained-ish policy.

Reference counterpart: `examples/modeling/1-decoding-strategies.ipynb`
(greedy / sampling / top-k / top-p / multistart / augmentation / beam
search — `rl4co/utils/decoding.py:17-35`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.beam_search import beam_search_rollout
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.tasks.eval import evaluate_policy


def main(num_loc=10, batch=64):
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    test = env.generate_batch(jax.random.PRNGKey(1), batch)

    # --- low-level: DecodeSpec drives the scan rollout directly ---
    specs = {
        "greedy": DecodeSpec(kind="greedy", tanh_clipping=10.0),
        "sampling(x8)": DecodeSpec(kind="sampling", num_samples=8,
                                   select_best=True, tanh_clipping=10.0),
        "top-k=5": DecodeSpec(kind="sampling", top_k=5, num_samples=8,
                              select_best=True, tanh_clipping=10.0),
        "top-p=0.9": DecodeSpec(kind="sampling", top_p=0.9, num_samples=8,
                                select_best=True, tanh_clipping=10.0),
        "temp=0.5": DecodeSpec(kind="sampling", temperature=0.5,
                               num_samples=8, select_best=True,
                               tanh_clipping=10.0),
        "multistart_greedy": DecodeSpec(kind="greedy", multistart=True,
                                        num_starts=num_loc,
                                        tanh_clipping=10.0),
    }
    for name, spec in specs.items():
        out = rollout(policy, params, env, test, jax.random.PRNGKey(2), spec)
        print(f"{name:<20} mean cost {-float(out.reward.mean()):8.4f}")

    # beam search keeps `beam_width` partial tours with parent backtracking
    beam = beam_search_rollout(policy, params, env, test,
                               jax.random.PRNGKey(3), beam_width=4,
                               spec=DecodeSpec(kind="greedy",
                                               tanh_clipping=10.0))
    print(f"{'beam_search(4)':<20} mean cost {-float(beam.reward.mean()):8.4f}")

    # --- high-level: the eval harness (reference `tasks/eval.py`) ---
    for method in ("greedy", "augment_dihedral_8", "beam_search"):
        res = evaluate_policy(env, policy, params, test, method=method,
                              check_solutions=True)
        print(f"eval[{method:<20}] mean cost {-res['mean_reward']:8.4f}")


if __name__ == "__main__":
    main()
