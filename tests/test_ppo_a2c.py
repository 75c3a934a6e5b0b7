"""PPO / A2C training-step tests (reference `tests/test_training.py:64-79`)."""

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.rl.a2c import A2C
from rl4co_tpu.rl.ppo import PPO


def tiny_policy(env_name="tsp"):
    return AttentionModelPolicy(env_name=env_name, embed_dim=16,
                                num_encoder_layers=1, feedforward_hidden=32,
                                num_heads=2)


def test_ppo_train_step():
    env = get_env("tsp", num_loc=6)
    algo = PPO(env=env, policy=tiny_policy(),
               train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=8)
    state, metrics = train_step(state, jax.random.PRNGKey(1))
    state, metrics = train_step(state, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    for k in ("loss", "surrogate_loss", "value_loss", "entropy", "reward"):
        assert np.isfinite(float(metrics[k])), k

    eval_step = algo.make_eval_step()
    val = env.generate_batch(jax.random.PRNGKey(2), 4)
    m = eval_step(state.params, val, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["reward"]))


def test_a2c_train_step():
    env = get_env("cvrp", num_loc=6)
    algo = A2C(env=env, policy=tiny_policy("cvrp"), critic_lr=5e-4,
               train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=8)
    state, metrics = train_step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["bl_val"]))


def test_stepwise_ppo_l2d_fjsp():
    from rl4co_tpu.envs.scheduling.fjsp import FJSP
    from rl4co_tpu.models.zoo.l2d import L2DPolicy
    from rl4co_tpu.rl.stepwise_ppo import StepwisePPO

    env = FJSP(num_jobs=3, num_mas=2, max_ops_per_job=3)
    policy = L2DPolicy(embed_dim=16, num_encoder_layers=1, actor_hidden_dim=16,
                       with_critic=True)
    algo = StepwisePPO(env=env, policy=policy, mini_batch_size=8)
    state = algo.init(jax.random.PRNGKey(0))
    ts = algo.make_train_step(batch_size=4)
    state, m = ts(state, jax.random.PRNGKey(1))
    for k in ("loss", "surrogate_loss", "value_loss", "entropy", "reward"):
        assert np.isfinite(float(m[k])), k
