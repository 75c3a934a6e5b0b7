"""POMO + augmentation tests (reference `tests/test_training.py:134-169`)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.data.transforms import augment_instances, dihedral_8_transform
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.models.zoo.pomo import POMO, make_pomo_policy
from rl4co_tpu.utils.ops import get_tour_length


def test_dihedral8_reward_invariance():
    # tour length is invariant under all 8 dihedral transforms
    locs = jax.random.uniform(jax.random.PRNGKey(0), (10, 2))
    base = get_tour_length(locs)
    for idx in range(8):
        t = dihedral_8_transform(locs, jnp.int32(idx))
        np.testing.assert_allclose(
            float(get_tour_length(t)), float(base), rtol=1e-5
        )


def test_augment_instances_layout():
    env = get_env("tsp", num_loc=5)
    instances = env.generate_batch(jax.random.PRNGKey(0), 3)
    aug = augment_instances(instances, 8, "dihedral8")
    assert aug["locs"].shape == (24, 5, 2)
    # copy 0 (first B rows, repeat-major) is the identity
    np.testing.assert_allclose(
        np.asarray(aug["locs"][:3]), np.asarray(instances["locs"]), rtol=1e-6
    )


def test_pomo_train_and_eval():
    env = get_env("tsp", num_loc=6)
    policy = make_pomo_policy("tsp", embed_dim=16, num_encoder_layers=1,
                              feedforward_hidden=32, num_heads=2)
    algo = POMO(env=env, policy=policy,
                train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    assert algo.num_starts == 6
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=4)
    state, metrics = train_step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["max_reward"]) >= float(metrics["reward"]) - 1e-6

    eval_step = algo.make_eval_step()
    val = env.generate_batch(jax.random.PRNGKey(2), 4)
    m = eval_step(state.params, val, jax.random.PRNGKey(3))
    assert float(m["max_aug_reward"]) >= float(m["max_reward"]) - 1e-6
    assert float(m["max_reward"]) >= float(m["reward"]) - 1e-6


def test_symnco_train_step():
    from rl4co_tpu.models.zoo.symnco import SymNCO, SymNCOPolicy

    env = get_env("tsp", num_loc=6)
    policy = SymNCOPolicy(env_name="tsp", embed_dim=16, num_encoder_layers=1,
                          feedforward_hidden=32, num_heads=2)
    algo = SymNCO(env=env, policy=policy, num_starts=6,
                  train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=4)
    state, m = train_step(state, jax.random.PRNGKey(1))
    for k in ("loss", "loss_ps", "loss_ss", "loss_inv"):
        assert np.isfinite(float(m[k])), k
