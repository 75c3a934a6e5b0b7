"""Reptile meta-learning over a task distribution of problem sizes.

Reference counterpart: `examples/2d-meta_train.py`
(`rl4co/utils/meta_trainer.py:16-190` ReptileCallback: per-epoch task
sampling, inner-loop training, outer θ_meta ← θ_meta + β(θ_task − θ_meta)).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl4co_tpu.envs import get_env
from rl4co_tpu.meta import Reptile, ReptileConfig
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.rl.reinforce import REINFORCE


def make_algo(task: dict):
    env = get_env("tsp", **task)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=64,
                                  num_encoder_layers=2)
    return REINFORCE(env=env, policy=policy, baseline="exponential", lr=1e-4)


def main():
    cfg = ReptileConfig(
        meta_beta=0.9,
        beta_decay=True,
        tasks=({"num_loc": 8}, {"num_loc": 10}, {"num_loc": 12}),
    )
    reptile = Reptile(make_algo, cfg)
    meta_params = reptile.run(jax.random.PRNGKey(0), epochs=3,
                              steps_per_task=4, batch_size=32)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(meta_params))
    print(f"meta-trained params: {n_params} weights across "
          f"{len(cfg.tasks)} task sizes")


if __name__ == "__main__":
    main()
