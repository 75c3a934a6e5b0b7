"""Canonical reference-convention datasets: generate, load, evaluate.

The reference pins its optimality-gap experiments to stored npz test sets
(test seed 1234 / val seed 4321, 10k instances — reference
`configs/env/tsp.yaml:8-10`, `rl4co/data/generate_data.py:214-313`).
`--convention reference` reproduces those numpy streams bit-for-bit, so a
model trained here can be scored on the *same instances* as one trained on
the reference. This example generates a small set, loads it through the
reference-format converter, and evaluates an (untrained) policy on it.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/13_canonical_datasets.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl4co_tpu.data.generate import generate_reference_convention
from rl4co_tpu.data.io import load_reference_npz, save_instances_npz
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.tasks.eval import evaluate_policy


def main(num_loc=10, n=64):
    with tempfile.TemporaryDirectory() as td:
        # 1. generate with the reference's exact numpy stream (CLI
        #    equivalent: python -m rl4co_tpu.data.generate --problem tsp
        #    --num-loc 10 --seed 1234 --convention reference)
        path = os.path.join(td, f"test{num_loc}_seed1234.npz")
        raw = generate_reference_convention("tsp", num_loc, n, seed=1234)
        save_instances_npz(raw, path)

        # 2. load through the reference-format converter (for CVRP this
        #    also normalizes integer demands by capacity)
        instances = load_reference_npz(path, "tsp")
        print("loaded", {k: v.shape for k, v in instances.items()})

        # 3. evaluate any policy on the pinned instances
        env = get_env("tsp", num_loc=num_loc)
        policy = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                      num_encoder_layers=1, num_heads=4,
                                      feedforward_hidden=64)
        params = init_policy_params(policy, env, jax.random.PRNGKey(0))
        res = evaluate_policy(env, policy, params, instances,
                              method="greedy", check_solutions=True)
        print(f"greedy mean tour length (untrained): {-res['mean_reward']:.3f} "
              f"on {len(res['rewards'])} canonical instances")


if __name__ == "__main__":
    main()
