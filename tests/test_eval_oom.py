"""evaluate_policy auto-degrading memory behavior (VERDICT r4 #6).

The reference's auto-batcher (`rl4co/tasks/eval.py:302-330`) divides a
constant ceiling and dies on RESOURCE_EXHAUSTED; ours sizes the dispatch
from model/N/HBM and halves-and-retries on device OOM.
"""

import jax
import numpy as np
import pytest

import rl4co_tpu.tasks.eval as eval_mod
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params


@pytest.fixture(scope="module")
def setup():
    env = get_env("tsp", num_loc=6)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                  num_encoder_layers=1, num_heads=4,
                                  feedforward_hidden=64)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = jax.device_get(env.generate_batch(jax.random.PRNGKey(1), 16))
    return env, policy, params, instances


def test_oom_halves_and_retries(setup, monkeypatch):
    env, policy, params, instances = setup
    real_rollout = eval_mod.rollout
    calls = []

    def fake_oom_rollout(policy, params, env, batch, key, spec):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        calls.append(b)
        if b > 4:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to allocate")
        return real_rollout(policy, params, env, batch, key, spec)

    monkeypatch.setattr(eval_mod, "rollout", fake_oom_rollout)
    res = eval_mod.evaluate_policy(env, policy, params, instances,
                                   method="greedy", batch_size=16)
    assert res["oom_halvings"] == 2
    assert res["batch_size"] == 4
    assert res["rewards"].shape == (16,)
    assert 16 in calls and 8 in calls and 4 in calls


def test_non_oom_errors_propagate(setup, monkeypatch):
    env, policy, params, instances = setup

    def broken_rollout(*a, **k):
        raise ValueError("some unrelated tracer error")

    monkeypatch.setattr(eval_mod, "rollout", broken_rollout)
    with pytest.raises(ValueError, match="unrelated"):
        eval_mod.evaluate_policy(env, policy, params, instances,
                                 method="greedy", batch_size=8)


def test_warmup_flag(setup):
    # warmup=True (default) reports a nonzero warmup_s; warmup=False skips
    # the extra rollout explicitly (callers that don't need clean timing).
    # NOTE a process-level auto-skip was tried and reverted: run_batch is a
    # fresh jit closure per call, so "already warm" was a false premise and
    # the retrace landed inside the timed region (r5 review finding #1).
    env, policy, params, instances = setup
    r1 = eval_mod.evaluate_policy(env, policy, params, instances,
                                  method="greedy", batch_size=8)
    r2 = eval_mod.evaluate_policy(env, policy, params, instances,
                                  method="greedy", batch_size=8,
                                  warmup=False)
    assert r1["warmup_s"] > 0.0
    assert r2["warmup_s"] == 0.0
    np.testing.assert_allclose(r1["rewards"], r2["rewards"], rtol=1e-5)


def test_hbm_cap_scales_sanely():
    policy = AttentionModelPolicy(env_name="tsp")
    cap_small = eval_mod._hbm_instance_cap(policy, 100, 1, 1)
    cap_aug = eval_mod._hbm_instance_cap(policy, 100, 1, 8)
    cap_big_n = eval_mod._hbm_instance_cap(policy, 1000, 1, 1)
    assert cap_small >= 8 * cap_aug  # augmentation divides the budget
    assert cap_big_n < cap_small     # bigger N -> fewer instances
    assert cap_small > 1000          # AM-128 at N=100 comfortably batches


def test_default_ceiling_unchanged_for_am_tsp100(setup, monkeypatch):
    # the HBM cap must not shrink the plain-AM greedy dispatch at N=100
    # (the production quality-run regime: ceiling 8192 is already safe)
    policy = AttentionModelPolicy(env_name="tsp")
    monkeypatch.delenv("RL4CO_EVAL_HBM_BUDGET", raising=False)
    assert eval_mod._hbm_instance_cap(policy, 100, 1, 1) >= 8192
