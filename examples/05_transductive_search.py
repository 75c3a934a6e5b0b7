"""Transductive (test-time) search: ActiveSearch, EAS-Emb, EAS-Lay.

Reference counterpart: `examples/modeling/2-transductive-methods.ipynb`
(`rl4co/models/zoo/active_search/search.py`, `zoo/eas/search.py`).
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
from rl4co_tpu.models.zoo.eas import ActiveSearch, EASEmb, EASLay


def main(num_loc=10, n_instances=4):
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), n_instances)

    base = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                   DecodeSpec(kind="greedy", tanh_clipping=10.0))
    print(f"zero-shot greedy cost: {-float(base.reward.mean()):.4f}")

    searches = {
        # full fine-tune per instance batch (reference ActiveSearch)
        "active_search": ActiveSearch(env=env, policy=policy, max_iters=10,
                                      lr=1e-3),
        # only per-instance node embeddings are adapted (EAS-Emb)
        "eas_emb": EASEmb(env=env, policy=policy, max_iters=10,
                          augment_size=1),
        # a small added layer is adapted (EAS-Lay)
        "eas_lay": EASLay(env=env, policy=policy, max_iters=10,
                          hidden_dim=16),
    }
    for name, search in searches.items():
        res = search.search(params, instances, jax.random.PRNGKey(3))
        cost = -float(np.asarray(res["best_reward"]).mean())
        print(f"{name:<14} best cost after search: {cost:.4f}")


if __name__ == "__main__":
    main()
