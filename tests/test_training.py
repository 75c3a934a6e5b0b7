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


def test_named_val_datasets_and_ragged_tail():
    """Multiple named val sets during fit (reference `rl/common/base.py:281-316`)
    + every instance counted even when val size % batch != 0."""
    env = get_env("tsp", num_loc=6)
    # instance norm: per-instance outputs independent of batch composition,
    # so the weighted batch-mean must equal the full-set mean exactly
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    algo = REINFORCE(env=env, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    cfg = TrainerConfig(epochs=1, batch_size=4, train_data_size=12,
                        val_data_size=8, val_batch_size=3, seed=0)
    trainer = Trainer(algo, cfg, logger=lambda m: None)
    sets = {
        "a": env.generate_batch(jax.random.PRNGKey(10), 8),
        "b": env.generate_batch(jax.random.PRNGKey(11), 5),
    }
    trainer.fit(val_datasets=sets)
    rec = trainer.history[-1]
    assert "val/a/reward" in rec and "val/b/reward" in rec
    # ragged-tail correctness: weighted mean == full-batch mean
    eval_step = algo.make_eval_step()
    state = algo.init(jax.random.PRNGKey(0))
    exact = float(eval_step(state.params, sets["a"], jax.random.PRNGKey(0))["reward"])
    weighted = trainer._validate(eval_step, state.params, sets["a"],
                                 jax.random.PRNGKey(0))["reward"]
    np.testing.assert_allclose(weighted, exact, rtol=1e-5)


def test_checkpoint_resume_reproduces_uninterrupted_run(tmp_path):
    """Kill-and-resume: 2+2 epochs with a restart must match 4 straight epochs
    (VERDICT #4 done-criterion; reference `trainer.fit(ckpt_path)`)."""
    def make(ckpt_dir):
        algo, cfg = tiny_setup(baseline="rollout")
        cfg.epochs = 4
        cfg.ckpt_dir = ckpt_dir
        return algo, Trainer(algo, cfg, logger=lambda m: None)

    # uninterrupted
    _, tr_full = make(None)
    state_full = tr_full.fit()
    curve_full = [r["val/reward"] for r in tr_full.history if "val/reward" in r]

    # interrupted after epoch 2
    algo, tr_a = make(str(tmp_path / "ck"))
    tr_a.config.epochs = 2
    tr_a.fit()
    algo_b, tr_b = make(str(tmp_path / "ck"))
    state_b = tr_b.fit(resume_from=str(tmp_path / "ck" / "last"))
    curve_b = [r["val/reward"] for r in tr_b.history if "val/reward" in r]

    assert int(state_b.step) == int(state_full.step)
    np.testing.assert_allclose(curve_b, curve_full[2:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_full.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    # best checkpoint exists alongside last (reference ModelCheckpoint top-1)
    assert (tmp_path / "ck" / "best").exists()


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
    assert {"test/uniform/reward", "test/uniform2/reward"} <= set(record)
    assert all(np.isfinite(v) for v in record.values())
    # default: generated test set
    record2 = trainer.test(state)
    assert np.isfinite(record2["test/test/reward"])


def test_chunked_train_step_matches_stepwise():
    """`make_train_step(chunk=K)` runs K scanned steps per dispatch with the
    SAME RNG schedule as K separate dispatches (each step folds the dispatch
    key with state.step) — params must match bit-exactly."""
    env = get_env("tsp", num_loc=6)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2)
    algo = REINFORCE(env=env, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    key = jax.random.PRNGKey(7)

    s1 = algo.init(jax.random.PRNGKey(0))
    step1 = algo.make_train_step(4, donate=False)
    for _ in range(4):
        s1, m1 = step1(s1, key)

    s2 = algo.init(jax.random.PRNGKey(0))
    step4 = algo.make_train_step(4, donate=False, chunk=4)
    s2, m4 = step4(s2, key)

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m4["loss"].shape == (4,)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"][-1]))


def test_trainer_uses_chunked_dispatch():
    """Trainer auto-picks a chunk dividing steps_per_epoch and still logs
    per-step metrics under global step indices."""
    algo, cfg = tiny_setup(baseline="mean")
    # steps_per_epoch = 12/4 = 3; log_every=50 → chunk = 3 (one dispatch)
    records = []
    trainer = Trainer(algo, cfg, logger=records.append)
    assert trainer._pick_chunk(3) == 3
    state = trainer.fit()
    assert int(state.step) == 3
    its = [r["it"] for r in records if "it" in r and "loss" in r]
    assert its == [2]  # one dispatch, logged under its last global step


def test_fused_rollout_baseline_matches_unfused():
    """fused_rollout_baseline runs the sampling rollout and the baseline's
    greedy re-rollout in ONE vmapped scan (member 1: snapshot params at
    τ→0 = exact greedy). Same key -> identical sampled trajectory, so
    loss, bl_val, and grads must match the unfused path."""
    import numpy as np

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = get_env("tsp", num_loc=10)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                  num_encoder_layers=1,
                                  feedforward_hidden=64, num_heads=2)

    def mk(fused):
        return REINFORCE(env=env, policy=policy, baseline="rollout",
                         train_spec=DecodeSpec(kind="sampling",
                                               tanh_clipping=10.0),
                         fused_rollout_baseline=fused)

    a0, a1 = mk(False), mk(True)
    s0 = a0.init(jax.random.PRNGKey(0))
    s1 = a1.init(jax.random.PRNGKey(0))
    inst = env.generate_batch(jax.random.PRNGKey(5), 16)
    key = jax.random.PRNGKey(7)
    (l0, (m0, _)), g0 = jax.value_and_grad(a0.loss, has_aux=True)(
        s0.params, s0.baseline_state, inst, key)
    (l1, (m1, _)), g1 = jax.value_and_grad(a1.loss, has_aux=True)(
        s1.params, s1.baseline_state, inst, key)
    np.testing.assert_allclose(float(m0["bl_val"]), float(m1["bl_val"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-4, atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=2e-5)
