"""Training integration tests (reference `tests/test_training.py`):
each algorithm trains for 1 epoch on a tiny dataset end-to-end."""

import jax
import numpy as np
import pytest

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.trainer import Trainer, TrainerConfig


def tiny_setup(env_name="tsp", baseline="rollout"):
    env = get_env(env_name, num_loc=6)
    policy = AttentionModelPolicy(env_name=env_name, embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2)
    algo = REINFORCE(env=env, policy=policy, baseline=baseline,
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    cfg = TrainerConfig(epochs=1, batch_size=4, train_data_size=12,
                        val_data_size=8, val_batch_size=8, seed=0)
    return algo, cfg


@pytest.mark.parametrize("baseline", ["no", "exponential", "mean", "rollout"])
def test_reinforce_trains_one_epoch(baseline):
    algo, cfg = tiny_setup(baseline=baseline)
    trainer = Trainer(algo, cfg, logger=lambda m: None)
    state = trainer.fit()
    assert int(state.step) == 3
    assert np.isfinite(trainer.history[-1]["val/reward"])


def test_reinforce_improves_on_tsp():
    # A few hundred steps on TSP-6 should beat the initial policy clearly.
    env = get_env("tsp", num_loc=6)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                  num_encoder_layers=1, feedforward_hidden=64,
                                  num_heads=4)
    algo = REINFORCE(env=env, policy=policy, baseline="exponential", lr=5e-3,
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=64)
    eval_step = algo.make_eval_step()
    val = env.generate_batch(jax.random.PRNGKey(1), 64)
    before = float(eval_step(state.params, val, jax.random.PRNGKey(2))["reward"])
    for i in range(60):
        state, _ = train_step(state, jax.random.PRNGKey(3))
    after = float(eval_step(state.params, val, jax.random.PRNGKey(2))["reward"])
    assert after > before + 0.05, (before, after)


def test_rollout_baseline_ttest_updates():
    algo, cfg = tiny_setup(baseline="rollout")
    state = algo.init(jax.random.PRNGKey(0))
    host = {"eval_instances": algo.env.generate_batch(jax.random.PRNGKey(1), 32)}
    host["eval_rewards"] = np.asarray(
        algo.greedy_reward_fn()(state.params, host["eval_instances"])
    ) - 100.0  # incumbent is terrible -> challenge must succeed
    state2, host2 = algo.epoch_end(state, host)
    assert (np.asarray(host2["eval_rewards"]) > -50).all()  # updated rewards
