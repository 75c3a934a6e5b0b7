"""Quickstart: train AttentionModel on TSP and evaluate greedily.

Reference counterpart: `examples/1-quickstart.ipynb` / `2b-train-simple.py`
(env → policy → REINFORCE w/ rollout baseline → trainer → greedy eval).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.trainer import Trainer, TrainerConfig


def main(num_loc=10, epochs=2):
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name=env.name)
    algo = REINFORCE(env=env, policy=policy, baseline="rollout", lr=1e-4)

    trainer = Trainer(algo, TrainerConfig(
        epochs=epochs, batch_size=64, train_data_size=2_048,
        val_data_size=256, val_batch_size=256,
    ))
    state = trainer.fit()

    # greedy evaluation on fresh instances
    test = env.generate_batch(jax.random.PRNGKey(4321), 256)
    out = rollout(policy, state.params, env, test, jax.random.PRNGKey(0),
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    print(f"greedy mean tour length on TSP-{num_loc}: "
          f"{-float(out.reward.mean()):.4f}")
    return state


if __name__ == "__main__":
    main()
