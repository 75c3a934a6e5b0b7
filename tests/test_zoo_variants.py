"""Zoo variant tests: GFACS, PolyNet, MVMoE."""

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models.policies.constructive import init_policy_params, rollout


def test_gfacs_train_step():
    from rl4co_tpu.models.zoo.gfacs import GFACS, GFACSEncoder

    env = get_env("tsp", num_loc=8)
    enc = GFACSEncoder(env_name="tsp", embed_dim=16,
                       num_layers_graph_encoder=2,
                       num_layers_heatmap_generator=2)
    algo = GFACS(env=env, encoder=enc, n_ants_train=4, n_ants_eval=4,
                 n_iterations_eval=2)
    state = algo.init(jax.random.PRNGKey(0))
    ts = algo.make_train_step(batch_size=2)
    state, m = ts(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["logZ"]))


def test_gfacs_train_with_local_search():
    """Off-policy LS TB term (reference `gfacs/model.py:126-138`): second logZ
    head, ls_reward ≥ reward, finite loss."""
    import pytest

    try:
        from rl4co_tpu.native import get_lib

        get_lib()
    except Exception:
        pytest.skip("native lib build failed")
    from rl4co_tpu.models.zoo.gfacs import GFACS, GFACSEncoder

    env = get_env("tsp", num_loc=8)
    enc = GFACSEncoder(env_name="tsp", embed_dim=16,
                       num_layers_graph_encoder=2,
                       num_layers_heatmap_generator=2,
                       z_out_dim=2)
    algo = GFACS(env=env, encoder=enc, n_ants_train=4, n_ants_eval=4,
                 n_iterations_eval=2, train_with_local_search=True,
                 alpha=0.5)
    assert algo.use_local_search  # forced on (deepaco/policy.py:92-93)
    state = algo.init(jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(2), 2)
    (loss, metrics), grads = jax.value_and_grad(algo.loss, has_aux=True)(
        state.params, None, instances, jax.random.PRNGKey(1)
    )
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    assert np.isfinite(float(loss))
    assert float(metrics["ls_reward"]) >= float(metrics["reward"]) - 1e-5


def test_gfacs_host_segmented_ls_training():
    """Backend-portable LS training (VERDICT r2 §4): with
    ls_mode='host_segments' (what 'auto' resolves to on the axon TPU, which
    rejects in-jit host callbacks) the GFACS train step runs end-to-end —
    sample on device, C++ LS on host, differentiable replay + update — and
    DeepACO's segmented ACO eval improves monotonically."""
    import pytest

    try:
        from rl4co_tpu.native import get_lib

        get_lib()
    except Exception:
        pytest.skip("native lib build failed")
    from rl4co_tpu.models.zoo.deepaco import DeepACO
    from rl4co_tpu.models.zoo.gfacs import GFACS, GFACSEncoder
    from rl4co_tpu.models.zoo.nargnn import NARGNNEncoder

    env = get_env("tsp", num_loc=8)
    enc = GFACSEncoder(env_name="tsp", embed_dim=16,
                       num_layers_graph_encoder=2,
                       num_layers_heatmap_generator=2,
                       z_out_dim=2)
    algo = GFACS(env=env, encoder=enc, n_ants_train=4, n_ants_eval=4,
                 n_iterations_eval=2, train_with_local_search=True,
                 alpha=0.5, ls_mode="host_segments")
    assert algo._resolved_ls_mode() == "host_segments"
    state = algo.init(jax.random.PRNGKey(0))
    step = algo.make_train_step(batch_size=2)
    state, m = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["logZ"]))
    assert float(m["ls_reward"]) >= float(m["reward"]) - 1e-5
    assert int(state.step) == 1

    # segmented eval: LS feedback reaches the pheromone between iterations
    d = DeepACO(env=env, encoder=NARGNNEncoder(
                    env_name="tsp", embed_dim=16, num_layers_graph_encoder=2,
                    num_layers_heatmap_generator=2),
                n_ants_eval=4, n_iterations_eval=3,
                use_local_search=True, ls_mode="host_segments")
    dstate = d.init(jax.random.PRNGKey(0))
    ev = d.make_eval_step()
    out = ev(dstate.params, env.generate_batch(jax.random.PRNGKey(2), 2),
             jax.random.PRNGKey(3))
    assert np.isfinite(float(out["reward"]))


def test_gfacs_segmented_loss_matches_in_jit():
    """The segmented loss replays the SAME trajectories the in-jit loss
    samples, so with identical LS inputs both paths give the same value."""
    import pytest

    try:
        from rl4co_tpu.native import get_lib

        get_lib()
    except Exception:
        pytest.skip("native lib build failed")
    import jax.numpy as jnp

    from rl4co_tpu.models.policies.nonautoregressive import (
        nar_rollout,
        random_feasible_starts,
    )
    from rl4co_tpu.models.zoo.gfacs import GFACS, GFACSEncoder
    from rl4co_tpu.utils.ops import batchify

    env = get_env("tsp", num_loc=8)
    enc = GFACSEncoder(env_name="tsp", embed_dim=16,
                       num_layers_graph_encoder=2,
                       num_layers_heatmap_generator=2, z_out_dim=2)
    algo = GFACS(env=env, encoder=enc, n_ants_train=4,
                 train_with_local_search=True, alpha=0.5)
    state = algo.init(jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(2), 2)
    key = jax.random.PRNGKey(1)
    loss_injit, m_injit = algo.loss(state.params, None, instances, key)

    # reproduce the sampling the in-jit loss performed, then feed the same
    # trajectories + host-LS results through the segmented loss
    kstart, kroll = jax.random.split(key)
    heat, _ = enc.apply(state.params, instances)
    spec = DecodeSpec(kind="sampling", multistart=True, num_starts=4,
                      temperature=algo.temperature, top_k=algo.top_k)
    first = random_feasible_starts(env, instances, 4, kstart)
    out = nar_rollout(env, instances, heat, kroll, spec, first_actions=first)
    host_ls = algo._host_ls_fn()
    inst_tiled = jax.device_get(batchify(instances, 4))
    a_h, r_h = host_ls(inst_tiled, np.asarray(out.actions),
                       np.asarray(out.reward))
    loss_seg, m_seg = algo._segmented_loss(
        state.params, instances, kroll, out.actions, out.reward,
        jnp.asarray(a_h), jnp.asarray(r_h))
    np.testing.assert_allclose(float(loss_seg), float(loss_injit),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(m_seg["reward"]), float(m_injit["reward"]),
                               rtol=1e-5)


def test_gfacs_alpha_beta_schedules():
    from rl4co_tpu.models.zoo.gfacs import GFACS
    env = get_env("tsp", num_loc=8)
    algo = GFACS(env=env, total_epochs=20, alpha_min=0.5, alpha_max=1.0,
                 beta_min=1.0, beta_max=2.0)
    assert abs(algo.alpha_at_epoch(0) - 0.5) < 1e-9
    assert abs(algo.alpha_at_epoch(100) - 1.0) < 1e-9
    assert abs(algo.beta_at_epoch(0) - 1.0) < 1e-9
    assert algo.beta_at_epoch(5) > 1.0
    assert abs(algo.beta_at_epoch(1000) - 2.0) < 1e-9


def test_gfacs_log_pb_cvrp():
    import jax.numpy as jnp
    from rl4co_tpu.models.zoo.gfacs import log_pb_uniform

    actions = jnp.array([[1, 2, 0, 3, 0, 0], [1, 0, 2, 0, 3, 0]])
    lp = np.asarray(log_pb_uniform("cvrp", actions))
    assert lp.shape == (2,)
    assert np.isfinite(lp).all()


def test_polynet_train_and_eval():
    from rl4co_tpu.models.zoo.polynet import PolyNet, PolyNetPolicy

    env = get_env("tsp", num_loc=6)
    policy = PolyNetPolicy(env_name="tsp", embed_dim=16, num_encoder_layers=1,
                           feedforward_hidden=32, num_heads=2, k=4,
                           poly_layer_dim=16)
    algo = PolyNet(env=env, policy=policy, k=4, val_num_solutions=4,
                   train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    ts = algo.make_train_step(batch_size=3)
    state, m = ts(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["max_reward"]) >= float(m["reward"]) - 1e-6
    ev = algo.make_eval_step()
    val = env.generate_batch(jax.random.PRNGKey(2), 3)
    res = ev(state.params, val, jax.random.PRNGKey(3))
    assert float(res["max_reward"]) >= float(res["reward"]) - 1e-6


def test_mvmoe_policy_rollout():
    from rl4co_tpu.models.zoo.mvmoe import MVMoEPolicy

    env = get_env("cvrp", num_loc=6)
    policy = MVMoEPolicy(env_name="cvrp", embed_dim=16, num_encoder_layers=1,
                         feedforward_hidden=32, num_heads=2, num_experts=2,
                         moe_topk=1)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    assert np.isfinite(np.asarray(out.reward)).all()
    for b in range(3):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(out.actions)[b])


def test_matnet_atsp_rollout_and_train():
    from rl4co_tpu.models.zoo.matnet import MatNetPolicy
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = get_env("atsp", num_loc=6)
    policy = MatNetPolicy(env_name="atsp", embed_dim=16, num_heads=2,
                          num_encoder_layers=1, feedforward_hidden=32)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    assert np.isfinite(np.asarray(out.reward)).all()
    for b in range(3):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(out.actions)[b])

    algo = REINFORCE(env=env, policy=policy, baseline="shared" if False else "mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(3))
    ts = algo.make_train_step(batch_size=2)
    state, m = ts(state, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))


def test_ptrnet_rollout_and_train():
    from rl4co_tpu.models.zoo.ptrnet import (
        PointerNetwork, PointerNetworkModel, ptrnet_rollout,
    )

    env = get_env("tsp", num_loc=6)
    policy = PointerNetwork(embed_dim=16, hidden_dim=16)
    model = PointerNetworkModel(env=env, policy=policy)
    state = model.init(jax.random.PRNGKey(0))
    inst = env.generate_batch(jax.random.PRNGKey(1), 3)
    out = ptrnet_rollout(policy, state.params, env, inst, jax.random.PRNGKey(2),
                         DecodeSpec(kind="greedy", tanh_clipping=10.0))
    for b in range(3):
        env.check_solution_validity(
            jax.tree_util.tree_map(lambda x: x[b], inst),
            np.asarray(out.actions)[b],
        )
    ts = model.make_train_step(batch_size=4)
    state, m = ts(state, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_mdam_train_and_eval():
    from rl4co_tpu.models.zoo.mdam import MDAM, MDAMPolicy

    env = get_env("tsp", num_loc=6)
    policy = MDAMPolicy(env_name="tsp", embed_dim=16, num_encoder_layers=1,
                        feedforward_hidden=32, num_heads=2, num_paths=2)
    algo = MDAM(env=env, policy=policy,
                train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    ts = algo.make_train_step(batch_size=3)
    state, m = ts(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    ev = algo.make_eval_step()
    res = ev(state.params, env.generate_batch(jax.random.PRNGKey(2), 3),
             jax.random.PRNGKey(3))
    assert float(res["max_reward"]) >= float(res["reward"]) - 1e-6


def test_mdam_embedding_glimpse():
    """EG (reference `mdam/decoder.py:165-174`): re-running the last encoder
    layer with an all-True key mask must reproduce the full encoder output,
    and the segmented EG eval path must run when eg_step_gap < max_steps."""
    import jax.numpy as jnp
    from rl4co_tpu.models.zoo.mdam import MDAM, MDAMPolicy

    env = get_env("tsp", num_loc=6)
    policy = MDAMPolicy(env_name="tsp", embed_dim=16, num_encoder_layers=2,
                        feedforward_hidden=32, num_heads=2, num_paths=2,
                        eg_step_gap=2)
    algo = MDAM(env=env, policy=policy)
    state = algo.init(jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)

    emb, h_old = policy.apply(state.params, instances, method="encode_with_hidden")
    full_mask = jnp.ones(emb.shape[:-1], dtype=bool)
    emb2 = policy.apply(state.params, h_old, full_mask, method="change_embeddings")
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-5)

    ev = algo.make_eval_step()
    res = ev(state.params, instances, jax.random.PRNGKey(2))
    assert np.isfinite(float(res["reward"]))
    assert float(res["max_reward"]) >= float(res["reward"]) - 1e-6


def test_glop_vrp_adapter():
    """GLOP VRP adapter (reference `glop/adapter/vrp_adapter.py`): per-route
    sub-TSP re-solve never worsens cost and preserves route membership."""
    import jax.numpy as jnp
    from rl4co_tpu.models.zoo.glop import (
        GLOPVRPAdapter,
        partition_vrp_actions,
        vrp_route_cost,
    )
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models.policies.constructive import rollout
    from rl4co_tpu.models.zoo.am import AttentionModelPolicy

    env = get_env("cvrp", num_loc=12)
    policy = AttentionModelPolicy(env_name="cvrp", embed_dim=16,
                                  num_encoder_layers=1,
                                  feedforward_hidden=32, num_heads=2)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 4)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                  DecodeSpec(kind="sampling"))

    locs = jnp.concatenate(
        [instances["depot"][:, None, :], instances["locs"]], axis=1
    )
    t = out.actions.shape[1]
    base_cost = np.asarray(vrp_route_cost(locs, out.actions))
    # sanity: matches env reward magnitude
    np.testing.assert_allclose(base_cost, -np.asarray(out.reward), atol=1e-4)

    adapter = GLOPVRPAdapter(max_routes=t, max_route_len=12, min_node_count=2)
    new_actions, new_cost = jax.jit(adapter.improve)(
        locs, out.actions, jax.random.PRNGKey(3)
    )
    assert (np.asarray(new_cost) <= base_cost + 1e-4).all()
    # every customer appears exactly once before and after
    for b in range(4):
        old = sorted(x for x in np.asarray(out.actions[b]).tolist() if x > 0)
        new = sorted(x for x in np.asarray(new_actions[b]).tolist() if x > 0)
        assert old == new

    # undersized grid must fall back to the original (still-valid) solution
    small = GLOPVRPAdapter(max_routes=1, max_route_len=2, min_node_count=2)
    fb_actions, fb_cost = small.improve(locs, out.actions, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(fb_cost), base_cost, atol=1e-4)
    for b in range(4):
        old = sorted(x for x in np.asarray(out.actions[b]).tolist() if x > 0)
        new = sorted(x for x in np.asarray(fb_actions[b]).tolist() if x > 0)
        assert old == new

    # partition grid keeps all customers
    grid = partition_vrp_actions(out.actions, t, 12)
    for b in range(4):
        old = sorted(x for x in np.asarray(out.actions[b]).tolist() if x > 0)
        got = sorted(x for x in np.asarray(grid[b]).reshape(-1).tolist() if x > 0)
        assert old == got


def test_glop_random_insertion_and_revision():
    import jax.numpy as jnp
    from rl4co_tpu.models.zoo.glop import GLOP, batched_random_insertion
    from rl4co_tpu.utils.ops import get_tour_length

    locs = jax.random.uniform(jax.random.PRNGKey(0), (4, 40, 2))
    tours = batched_random_insertion(locs, jax.random.PRNGKey(1))
    for b in range(4):
        assert sorted(np.asarray(tours[b]).tolist()) == list(range(40))
    base_len = jax.vmap(lambda lo, t: get_tour_length(lo[t]))(locs, tours)

    glop = GLOP(seg_len=10, n_rounds=3)
    tours2, len2 = glop.improve(locs, tours, jax.random.PRNGKey(3))
    for b in range(4):
        assert sorted(np.asarray(tours2[b]).tolist()) == list(range(40))
    # revision never worsens the tour it starts from
    assert (np.asarray(len2) <= np.asarray(base_len) + 1e-5).all()

    # ...and at larger N it must ACTUALLY improve (round-4 regression: the
    # closed-cycle segment re-solve ignored junction nodes and accepted
    # zero revisions — the endpoint-respecting path insertion fixes it)
    locs_big = jax.random.uniform(jax.random.PRNGKey(5), (4, 150, 2))
    g0 = GLOP(seg_len=25, n_rounds=0)
    g = GLOP(seg_len=25, n_rounds=12)
    _, l0 = jax.jit(g0.solve)(locs_big, jax.random.PRNGKey(6))
    _, l1 = jax.jit(g.solve)(locs_big, jax.random.PRNGKey(6))
    assert float(l1.mean()) < float(l0.mean()) - 1e-3, (
        f"revision accepted nothing: {float(l0.mean())} -> {float(l1.mean())}")


def test_l2d_trains_on_fjsp():
    from rl4co_tpu.envs.scheduling.fjsp import FJSP
    from rl4co_tpu.models.zoo.l2d import L2DModel, L2DPolicy

    env = FJSP(num_jobs=3, num_mas=2, max_ops_per_job=3)
    policy = L2DPolicy(embed_dim=16, num_encoder_layers=1, actor_hidden_dim=16)
    model = L2DModel(env=env, policy=policy)
    state = model.init(jax.random.PRNGKey(0))
    ts = model.make_train_step(batch_size=3)
    state, m = ts(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_l2d_attn_trains_on_jssp():
    """Encode-once attention variant with JSSPDynamicEmbedding deltas
    (reference `l2d/policy.py:95-151`, `dynamic.py:81-117`)."""
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs.scheduling.fjsp import JSSP
    from rl4co_tpu.models.zoo.l2d import L2DAttnModel, L2DAttnPolicy, l2d_attn_rollout

    env = JSSP(num_jobs=3, num_mas=2)
    policy = L2DAttnPolicy(embed_dim=16, num_heads=2, num_encoder_layers=1)
    model = L2DAttnModel(env=env, policy=policy)
    state = model.init(jax.random.PRNGKey(0))
    ts = model.make_train_step(batch_size=3)
    state, m = ts(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # greedy rollout produces feasible schedules
    instances = env.generate_batch(jax.random.PRNGKey(2), 4)
    out = l2d_attn_rollout(policy, state.params, env, instances,
                           jax.random.PRNGKey(3), DecodeSpec(kind="greedy"))
    assert out.reward.shape == (4,)
    assert np.isfinite(np.asarray(out.reward)).all()
    # reward = -makespan must be strictly negative
    assert (np.asarray(out.reward) < 0).all()


def test_ham_policy_on_pdp():
    from rl4co_tpu.models.zoo.ham import HAMPolicy

    env = get_env("pdp", num_loc=8)
    policy = HAMPolicy(env_name="pdp", embed_dim=16, num_encoder_layers=1,
                       feedforward_hidden=32, num_heads=2)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    assert np.isfinite(np.asarray(out.reward)).all()
    for b in range(3):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(out.actions)[b])


def test_matnet_ffsp_policy():
    from rl4co_tpu.envs.scheduling.ffsp import FFSP
    from rl4co_tpu.models.zoo.matnet_ffsp import MatNetFFSPPolicy
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = FFSP(num_stage=2, num_machine=3, num_job=4)
    policy = MatNetFFSPPolicy(num_stage=2, num_machine=3, embed_dim=16,
                              num_heads=2, num_encoder_layers=1,
                              feedforward_hidden=32)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                  DecodeSpec(kind="sampling", tanh_clipping=10.0))
    assert (np.asarray(out.reward) < 0).all()
    algo = REINFORCE(env=env, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(3))
    ts = algo.make_train_step(batch_size=2)
    state, m = ts(state, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss"]))


def test_reference_model_class_exports():
    """Every model class the reference exports from `rl4co.models`
    (`models/__init__.py:23-42`) resolves here and constructs."""
    from rl4co_tpu import models as M

    names = [
        "AttentionModel", "AMPPO", "AttentionModelPolicy", "POMO", "SymNCO",
        "SymNCOPolicy", "PolyNet", "PolyNetPolicy", "MDAM", "MDAMPolicy",
        "MatNet", "MatNetPolicy", "HeterogeneousAttentionModel",
        "HeterogeneousAttentionModelPolicy", "MVMoE_AM", "MVMoE_POMO",
        "DACT", "DACTPolicy", "N2S", "N2SPolicy", "NeuOpt", "NeuOptPolicy",
        "DeepACO", "GFACS", "GLOP", "NARGNNPolicy", "ActiveSearch", "EAS",
        "EASEmb", "EASLay", "PointerNetwork", "PointerNetworkPolicy",
        "L2DModel", "L2DPolicy",
    ]
    for n in names:
        assert getattr(M, n) is not None, n

    # thin constructors actually build an algo object
    env = get_env("tsp", num_loc=6)
    small = dict(embed_dim=16, num_encoder_layers=1,
                 feedforward_hidden=32, num_heads=2)
    algo = M.AttentionModel(env, policy_kwargs=small, baseline="mean")
    assert algo.env is env
    from rl4co_tpu.envs.routing.tsp_kopt import TSPkopt
    d = M.DACT(env=TSPkopt(num_loc=8, k_max=2),
               policy_kwargs=dict(embed_dim=16, num_heads=2,
                                  num_encoder_layers=1, feedforward_hidden=16))
    assert d.action_dim == 2
    nopt = M.NeuOpt(env=TSPkopt(num_loc=8, k_max=4),
                    policy_kwargs=dict(embed_dim=16, num_heads=2,
                                       num_encoder_layers=1,
                                       feedforward_hidden=16))
    assert nopt.action_dim == 12


def test_random_insertion_path_endpoints():
    """Open-path cheapest insertion fixes endpoints 0 and N-1 (SHPP
    semantics for GLOP segment re-solve) and yields a permutation."""
    from rl4co_tpu.models.zoo.glop import batched_random_insertion_path

    locs = jax.random.uniform(jax.random.PRNGKey(0), (6, 12, 2))
    orders = batched_random_insertion_path(locs, jax.random.PRNGKey(1))
    o = np.asarray(orders)
    assert (o[:, 0] == 0).all() and (o[:, -1] == 11).all()
    for b in range(6):
        assert sorted(o[b].tolist()) == list(range(12))
