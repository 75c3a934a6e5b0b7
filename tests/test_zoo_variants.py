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
