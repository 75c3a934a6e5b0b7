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


def test_optim_factories_and_schedules():
    """By-name optimizer/schedule factories (reference `optim_helpers.py:25-49`,
    POMO MultiStepLR config)."""
    import optax

    from rl4co_tpu.utils.optim import get_lr_schedule, get_optimizer

    sched = get_lr_schedule("multistep", 1e-3, milestones=(2, 4), gamma=0.1,
                            steps_per_epoch=10)
    assert np.isclose(sched(0), 1e-3)
    assert np.isclose(sched(25), 1e-4)
    assert np.isclose(sched(45), 1e-5)

    cos = get_lr_schedule("cosine", 1e-3, total_steps=100, warmup_steps=10)
    assert np.isclose(cos(0), 0.0)
    assert np.isclose(cos(10), 1e-3)
    assert cos(109) < 1e-4

    tx = get_optimizer("adamw", sched, grad_clip=1.0, weight_decay=0.01)
    assert isinstance(tx, optax.GradientTransformation)
    with pytest.raises(ValueError):
        get_optimizer("nope")

    # end-to-end: REINFORCE with a scheduled SGD optimizer still trains
    algo, cfg = tiny_setup(baseline="mean")
    algo = REINFORCE(env=algo.env, policy=algo.policy, baseline="mean",
                     optimizer="sgd", lr_schedule=sched,
                     train_spec=algo.train_spec)
    trainer = Trainer(algo, cfg, logger=lambda m: None)
    state = trainer.fit()
    assert np.isfinite(trainer.history[-1]["val/reward"])


def test_trainer_test_phase_named_datasets():
    """fit -> test with multiple named datasets (reference
    `tasks/train.py:79-86`, `rl/common/base.py:281-316`)."""
    algo, cfg = tiny_setup(baseline="mean")
    trainer = Trainer(algo, cfg, logger=lambda m: None)
    state = trainer.fit()
    env = algo.env
    datasets = {
        "uniform": env.generate_batch(jax.random.PRNGKey(7), 8),
        "uniform2": env.generate_batch(jax.random.PRNGKey(8), 8),
    }
    record = trainer.test(state, datasets)
    assert set(record) == {"test/uniform/reward", "test/uniform2/reward"}
    assert all(np.isfinite(v) for v in record.values())
    # default: generated test set
    record2 = trainer.test(state)
    assert np.isfinite(record2["test/test/reward"])
