"""In-tree multi-device correctness tests (SURVEY.md §2.10; VERDICT r1 #3).

Runs on the simulated 8-device CPU mesh from conftest.py. The contract
mirrors the reference's DDP guarantee (`rl4co/utils/trainer.py:73-86`):
data-parallel training must be numerically equivalent to single-device
training — GSPMD's psum gradient reduction is the all-reduce.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rl4co_tpu.rl.reinforce import REINFORCE


def make_algo(baseline="mean"):
    env = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    return REINFORCE(env=env, policy=policy, baseline=baseline,
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(dp=4, model=2)
    assert mesh2.shape == {"dp": 4, "model": 2}


def test_shard_batch_places_on_dp():
    mesh = make_mesh()
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("dp")
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_train_steps_match_unsharded():
    """3 REINFORCE train steps on a dp=8 mesh == 3 unsharded steps.

    Same RNG keys -> identical generated instances and trajectories; the psum
    gradient reduction must reproduce the single-device gradient up to
    float reassociation.
    """
    algo = make_algo()
    batch = 16  # divisible by dp=8

    state_ref = algo.init(jax.random.PRNGKey(0))
    step_ref = algo.make_train_step(batch, donate=False)

    mesh = make_mesh()
    state_sh = algo.init(jax.random.PRNGKey(0))
    state_sh = replicate(state_sh, mesh)
    step_sh = algo.make_train_step(batch, mesh=mesh, donate=False)

    for i in range(3):
        k = jax.random.PRNGKey(42 + i)
        state_ref, m_ref = step_ref(state_ref, k)
        state_sh, m_sh = step_sh(state_sh, k)
        np.testing.assert_allclose(float(m_ref["reward"]), float(m_sh["reward"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_ref["loss"]), float(m_sh["loss"]),
                                   rtol=2e-4, atol=1e-5)

    # Adam amplifies float-reassociation sign noise on near-zero gradients
    # into ±lr param differences, so bound absolute drift by a few update
    # sizes rather than demanding elementwise closeness.
    for a, b in zip(jax.tree_util.tree_leaves(state_ref.params),
                    jax.tree_util.tree_leaves(state_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_psum_gradient_equivalence():
    """The gradient of the dp-sharded loss equals the single-device gradient
    (GSPMD psum == DDP all-reduce; reference `utils/trainer.py:73-86`)."""
    algo = make_algo()
    mesh = make_mesh()
    state = algo.init(jax.random.PRNGKey(0))
    instances = algo.env.generate_batch(jax.random.PRNGKey(1), 16)
    kroll = jax.random.PRNGKey(2)

    def loss_fn(params, inst):
        return algo.loss(params, state.baseline_state, inst, kroll)[0]

    g_ref = jax.jit(jax.grad(loss_fn))(state.params, instances)

    sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def sharded_grad(params, inst):
        inst = jax.lax.with_sharding_constraint(inst, sharding)
        return jax.grad(loss_fn)(params, inst)

    g_sh = sharded_grad(replicate(state.params, mesh),
                        shard_batch(instances, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_rollout_baseline_and_eval():
    """Rollout-baseline training executes sharded, and greedy eval rewards of
    a dp-sharded batch match the unsharded rewards exactly per instance."""
    algo = make_algo(baseline="rollout")
    mesh = make_mesh()
    state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
    step = algo.make_train_step(16, mesh=mesh, donate=False)
    state, metrics = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    env = algo.env
    instances = env.generate_batch(jax.random.PRNGKey(2), 16)
    fn = jax.jit(algo.greedy_reward_fn())
    r_plain = np.asarray(fn(jax.device_get(state.params), instances))
    r_shard = np.asarray(fn(state.params, shard_batch(instances, mesh)))
    np.testing.assert_allclose(r_plain, r_shard, rtol=1e-5)


def test_scaling_proxy_dp_counts():
    """The full jitted train step compiles and runs at dp in {1, 2, 4, 8}
    (the driver's dryrun_multichip exercises 8; this pins every power of two
    so a mesh-shape regression can't hide)."""
    algo = make_algo()
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(devices=jax.devices()[:dp], dp=dp)
        state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
        step = algo.make_train_step(16, mesh=mesh, donate=False)
        state, metrics = step(state, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"])), dp


def test_model_axis_sharding_matches_replicated():
    """Column-sharding dense kernels over the `model` axis (GSPMD tensor
    parallelism, `shard_params_model_axis`) must not change the math:
    train-step loss equals the dp-only replicated run up to reduction-order
    float noise."""
    from rl4co_tpu.parallel.mesh import shard_params_model_axis

    algo = make_algo()
    key = jax.random.PRNGKey(1)

    mesh_dp = make_mesh(devices=jax.devices()[:4], dp=4, model=1)
    s1 = replicate(algo.init(jax.random.PRNGKey(0)), mesh_dp)
    step1 = algo.make_train_step(16, mesh=mesh_dp, donate=False)
    _, m1 = step1(s1, key)

    mesh_2d = make_mesh(devices=jax.devices()[:4], dp=2, model=2)
    s2 = replicate(algo.init(jax.random.PRNGKey(0)), mesh_2d)
    s2 = s2.replace(params=shard_params_model_axis(s2.params, mesh_2d,
                                                   min_dim=8))
    # at least one kernel must actually be sharded over `model`
    sharded = [
        x for x in jax.tree_util.tree_leaves(s2.params)
        if getattr(x, "ndim", 0) == 2
        and "model" in str(x.sharding.spec)
    ]
    assert sharded, "no kernel picked up the model-axis sharding"
    step2 = algo.make_train_step(16, mesh=mesh_2d, donate=False)
    _, m2 = step2(s2, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3, atol=1e-4)


def test_trainer_fit_on_mesh():
    """Trainer.fit with a dp mesh must place the init state over the mesh
    (ADVICE r3 high: a device-0-committed state conflicts with the step's
    with_sharding_constraint and the first dispatch raises
    'Received incompatible devices for jitted computation')."""
    import tempfile

    from rl4co_tpu.trainer import Trainer, TrainerConfig

    algo = make_algo()
    mesh = make_mesh()
    cfg = TrainerConfig(epochs=1, batch_size=16, train_data_size=32,
                        val_data_size=16, val_batch_size=16, log_every=1)
    with tempfile.TemporaryDirectory() as d:
        cfg.ckpt_dir = d
        trainer = Trainer(algo, cfg, mesh=mesh, logger=lambda m: None)
        state = trainer.fit()
    # state came back mesh-placed, not single-device
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_expert_parallel_moe_matches_replicated():
    """MoE expert params (leading expert axis) shard over `model` (expert
    parallelism — beyond the reference, whose MoE is in-process only,
    SURVEY §2.10): train-step loss must equal the replicated dp-only run."""
    from rl4co_tpu.models.zoo.mvmoe import MVMoEPolicy
    from rl4co_tpu.parallel.mesh import shard_params_model_axis

    env = get_env("tsp", num_loc=8)
    policy = MVMoEPolicy(env_name="tsp", embed_dim=16, num_encoder_layers=1,
                         feedforward_hidden=32, num_heads=2,
                         normalization="instance", num_experts=4, moe_topk=2)
    algo = REINFORCE(env=env, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    key = jax.random.PRNGKey(1)

    mesh_dp = make_mesh(devices=jax.devices()[:4], dp=4, model=1)
    s1 = replicate(algo.init(jax.random.PRNGKey(0)), mesh_dp)
    _, m1 = algo.make_train_step(16, mesh=mesh_dp, donate=False)(s1, key)

    mesh_2d = make_mesh(devices=jax.devices()[:4], dp=2, model=2)
    s2 = algo.init(jax.random.PRNGKey(0))
    s2 = replicate(s2, mesh_2d)
    s2 = s2.replace(params=shard_params_model_axis(s2.params, mesh_2d,
                                                   min_dim=8))
    from jax.tree_util import keystr, tree_flatten_with_path

    flat, _ = tree_flatten_with_path(s2.params)
    expert_sharded = [
        keystr(p) for p, x in flat
        if "experts']" in keystr(p) and "model" in str(x.sharding.spec)
    ]
    assert expert_sharded, "no expert param picked up the model-axis sharding"
    _, m2 = algo.make_train_step(16, mesh=mesh_2d, donate=False)(s2, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3, atol=1e-4)


def test_tp_roles_match_fragment_placement_and_survive_rename():
    """Structural TPDense markers (VERDICT r4 #8): role-based placement must
    (a) reproduce the historical path-fragment placement exactly on the
    stock AM policy, and (b) keep row-sharding when modules are renamed —
    where the fragment match silently degrades to column/replicated."""
    import flax.linen as nn

    from rl4co_tpu.models.nn.attention import MultiHeadAttention
    from rl4co_tpu.models.nn.ops import TransformerFFN
    from rl4co_tpu.models.policies.constructive import (
        init_policy_params, policy_tp_roles,
    )
    from rl4co_tpu.parallel.mesh import shard_params_model_axis, tp_role_lookup

    env = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    roles = policy_tp_roles(policy, env)
    lookup = tp_role_lookup(roles)
    assert any(v == "row" for v in lookup.values()), lookup

    mesh_2d = make_mesh(devices=jax.devices()[:4], dp=2, model=2)
    by_fragment = shard_params_model_axis(params, mesh_2d, min_dim=8)
    by_roles = shard_params_model_axis(params, mesh_2d, min_dim=8,
                                       roles=roles)
    frag_flat, _ = jax.tree_util.tree_flatten_with_path(by_fragment)
    role_flat, _ = jax.tree_util.tree_flatten_with_path(by_roles)
    for (p1, x1), (p2, x2) in zip(frag_flat, role_flat):
        assert str(x1.sharding.spec) == str(x2.sharding.spec), (
            jax.tree_util.keystr(p1), x1.sharding.spec, x2.sharding.spec)

    # (b) renamed scopes: 'attn'/'feedforward' defeat the "mha']['out_proj"
    # and "ffn']['Dense_1" fragments but not the structural markers
    class RenamedBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = MultiHeadAttention(embed_dim=16, num_heads=2, name="attn")(x)
            return TransformerFFN(embed_dim=16, feedforward_hidden=32,
                                  name="feedforward")(x)

    block = RenamedBlock()
    x = jnp.ones((2, 8, 16))
    variables = block.init(jax.random.PRNGKey(0), x,
                           mutable=["params", "intermediates"])
    bparams = {"params": variables["params"]}
    broles = variables["intermediates"]

    def row_leaves(tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        return sorted(
            jax.tree_util.keystr(p) for p, x in flat
            if getattr(x, "ndim", 0) == 2
            and len(x.sharding.spec) >= 1 and x.sharding.spec[0] == "model"
        )

    renamed_frag = shard_params_model_axis(bparams, mesh_2d, min_dim=8)
    renamed_roles = shard_params_model_axis(bparams, mesh_2d, min_dim=8,
                                            roles=broles)
    assert row_leaves(renamed_frag) == []  # fragment rule silently degrades
    rows = row_leaves(renamed_roles)
    assert any("out_proj" in r for r in rows), rows
    assert any("Dense_1" in r for r in rows), rows
