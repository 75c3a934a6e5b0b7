"""Transductive search tests (reference `tests/test_training.py:172-181`)."""

import jax
import numpy as np

from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.models.zoo.eas import ActiveSearch, EASEmb


def setup():
    env = get_env("tsp", num_loc=6)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    return env, policy, params


def test_active_search_improves():
    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 2)
    search = ActiveSearch(env=env, policy=policy, max_iters=8, lr=1e-3)
    res = search.search(params, instances, jax.random.PRNGKey(2))
    assert res["best_reward"].shape == (2,)
    assert np.isfinite(np.asarray(res["best_reward"])).all()


def test_eas_emb_improves():
    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 2)
    search = EASEmb(env=env, policy=policy, max_iters=6, augment_size=2)
    # dihedral8 requires 8 augs; use symmetric-free small test with augment_size=1
    search = EASEmb(env=env, policy=policy, max_iters=6, augment_size=1)
    res = search.search(params, instances, jax.random.PRNGKey(2))
    assert res["best_reward"].shape == (2,)
    assert np.isfinite(np.asarray(res["best_reward"])).all()
    assert res["embeddings"].shape == (2, 6, 16)


def test_eas_lay_improves():
    from rl4co_tpu.models.zoo.eas import EASLay

    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 2)
    search = EASLay(env=env, policy=policy, max_iters=5, hidden_dim=8)
    res = search.search(params, instances, jax.random.PRNGKey(2))
    assert res["best_reward"].shape == (2,)
    assert np.isfinite(np.asarray(res["best_reward"])).all()
