"""Eval harness + io + checkpoint tests (reference `tests/test_tasks.py:62-70`)."""

import os

import jax
import numpy as np
import pytest

from rl4co_tpu.data.io import load_instances_npz, save_instances_npz
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.tasks.eval import evaluate_policy


def setup():
    env = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    return env, policy, params


@pytest.mark.parametrize(
    "method", ["greedy", "sampling", "multistart_greedy",
               "augment_dihedral_8", "multistart_greedy_augment_dihedral_8",
               "beam_search"]
)
def test_evaluate_policy_methods(method):
    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 10)
    kwargs = {"num_samples": 4} if method == "sampling" else {}
    res = evaluate_policy(env, policy, params, instances, method=method,
                          batch_size=4, **kwargs)
    assert res["rewards"].shape == (10,)
    assert np.isfinite(res["rewards"]).all()


def test_stronger_methods_dominate_greedy():
    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 8)
    greedy = evaluate_policy(env, policy, params, instances, "greedy", batch_size=8)
    ms = evaluate_policy(env, policy, params, instances, "multistart_greedy", batch_size=8)
    aug = evaluate_policy(env, policy, params, instances, "augment_dihedral_8", batch_size=8)
    # float-order differences between the grouped [B,S,N] and flat [B,N]
    # pointer matmuls can flip individual argmax decisions, so assert
    # aggregate dominance rather than per-instance exactness
    assert ms["mean_reward"] >= greedy["mean_reward"] - 0.02
    assert aug["mean_reward"] >= greedy["mean_reward"] - 0.02


@pytest.mark.parametrize("env_name", ["tsp", "cvrp"])
def test_evaluate_policy_checks_solution_validity(env_name):
    """check_solutions=True asserts env.check_solution_validity on the best
    actions of every eval batch (VERDICT: validity-checked eval protocol)."""
    env = get_env(env_name, num_loc=6)
    policy = AttentionModelPolicy(env_name=env_name, embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 7)
    res = evaluate_policy(env, policy, params, instances,
                          method="multistart_greedy_augment_dihedral_8",
                          batch_size=4, check_solutions=True)
    assert res["rewards"].shape == (7,)
    assert res["actions"].shape[0] == 7


def test_beam_search_dominates_greedy():
    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 8)
    greedy = evaluate_policy(env, policy, params, instances, "greedy", batch_size=8)
    beam = evaluate_policy(env, policy, params, instances, "beam_search", batch_size=8)
    # beam 0 reproduces the greedy trajectory, so the beam max can't be worse
    assert beam["mean_reward"] >= greedy["mean_reward"] - 1e-4


def test_decode_spec_compute_dtype_bf16():
    """compute_dtype='bfloat16' casts params for the forward pass (TPU analog
    of the reference's 16-mixed precision, `rl4co/utils/trainer.py:57`)."""
    import jax.numpy as jnp

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models.policies.constructive import rollout

    env, policy, params = setup()
    instances = env.generate_batch(jax.random.PRNGKey(1), 6)
    spec = DecodeSpec(kind="greedy", compute_dtype="bfloat16")
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(0), spec)
    f32 = rollout(policy, params, env, instances, jax.random.PRNGKey(0),
                  DecodeSpec(kind="greedy"))
    assert out.reward.shape == (6,)
    assert np.isfinite(np.asarray(out.reward)).all()
    # bf16 forward should stay close to the f32 tour quality on tiny instances
    assert abs(float(out.reward.mean()) - float(f32.reward.mean())) < 0.5
    # params themselves must remain untouched (f32 master copy)
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(params)
               if jnp.issubdtype(x.dtype, jnp.floating))


def test_npz_roundtrip(tmp_path):
    env = get_env("cvrp", num_loc=6)
    instances = jax.device_get(env.generate_batch(jax.random.PRNGKey(0), 5))
    p = os.path.join(tmp_path, "data.npz")
    save_instances_npz(instances, p)
    loaded = load_instances_npz(p)
    for k in instances:
        np.testing.assert_allclose(np.asarray(instances[k]), loaded[k], rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from rl4co_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.rl.reinforce import REINFORCE

    env, policy, _ = setup()
    algo = REINFORCE(env=env, policy=policy, baseline="exponential",
                     train_spec=DecodeSpec(kind="sampling"))
    state = algo.init(jax.random.PRNGKey(0))
    train_step = algo.make_train_step(batch_size=4, donate=False)
    state2, _ = train_step(state, jax.random.PRNGKey(1))
    path = save_checkpoint(os.path.join(tmp_path, "ckpt"), state2, step=1)
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 1
    l1 = jax.tree_util.tree_leaves(restored.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_solomon_loader(tmp_path):
    from rl4co_tpu.data.solomon import load_solomon_instance

    content = """R101

VEHICLE
NUMBER     CAPACITY
  25         200

CUSTOMER
CUST NO.  XCOORD.   YCOORD.   DEMAND    READY TIME  DUE DATE   SERVICE TIME

    0      35         35          0          0       230          0
    1      41         49         10        161       171         10
    2      35         17          7         50        60         10
"""
    p = os.path.join(tmp_path, "r101.txt")
    with open(p, "w") as f:
        f.write(content)
    inst = load_solomon_instance(p)
    assert inst["locs"].shape == (2, 2)
    assert abs(inst["demand"][0] - 10 / 200) < 1e-6
    assert inst["time_windows"].shape == (3, 2)
    assert inst["capacity"] == 200.0

    # loader -> env integration: greedy rollout on the loaded instance
    from rl4co_tpu.data.solomon import solomon_to_env_batch
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models.policies.constructive import rollout as do_rollout

    env2, batch = solomon_to_env_batch(inst)
    policy2 = AttentionModelPolicy(env_name="cvrptw", embed_dim=16,
                                   num_encoder_layers=1, feedforward_hidden=32,
                                   num_heads=2)
    params2 = init_policy_params(policy2, env2, jax.random.PRNGKey(0))
    out = do_rollout(policy2, params2, env2, batch, jax.random.PRNGKey(1),
                     DecodeSpec(kind="greedy", tanh_clipping=10.0))
    assert np.isfinite(np.asarray(out.reward)).all()
    one = jax.tree_util.tree_map(lambda x: np.asarray(x)[0],
                                 jax.device_get(batch))
    env2.check_solution_validity(one, np.asarray(out.actions)[0])
