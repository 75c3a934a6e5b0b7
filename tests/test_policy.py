"""Policy rollout tests (reference `tests/test_policy.py:9-70`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.utils.ops import unbatchify

BATCH = 3
NUM_LOC = 8


ENV_KWARGS = {
    "mcp": dict(num_items=20, num_sets=10, n_sets_to_choose=3),
    "flp": dict(num_loc=10, to_choose=3),
    "smtwtp": dict(num_job=8),
}


def make_env(env_name, num_loc=10):
    return get_env(env_name, **ENV_KWARGS.get(env_name, {"num_loc": num_loc}))


def make_policy(env_name):
    env = make_env(env_name, NUM_LOC)
    policy = AttentionModelPolicy(env_name=env_name, embed_dim=32,
                                  num_encoder_layers=2, feedforward_hidden=64)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    return env, policy, params


@pytest.mark.parametrize("env_name", ["tsp", "cvrp", "op", "pctsp", "sdvrp", "mtsp", "shpp", "pdp", "cvrptw", "flp", "mcp", "smtwtp", "mtvrp", "svrp", "mdcpdp", "mpdp"])
@pytest.mark.parametrize("kind", ["greedy", "sampling"])
def test_rollout_shapes_and_validity(env_name, kind):
    env, policy, params = make_policy(env_name)
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(kind=kind, tanh_clipping=10.0)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec)
    assert out.reward.shape == (BATCH,)
    assert out.actions.shape == (BATCH, env.max_steps)
    assert out.log_likelihood.shape == (BATCH,)
    assert np.isfinite(np.asarray(out.reward)).all()
    assert (np.asarray(out.log_likelihood) <= 1e-5).all()
    for b in range(BATCH):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(out.actions)[b])


def test_multistart_rollout_tsp():
    env, policy, params = make_policy("tsp")
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    s = env.get_num_starts()
    spec = DecodeSpec(kind="greedy", multistart=True, num_starts=s, tanh_clipping=10.0)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec)
    assert out.reward.shape == (BATCH * s,)
    # first actions must be the forced start nodes, repeat-major layout
    acts = unbatchify(out.actions, s)  # [B, S, T]
    first = np.asarray(acts)[:, :, 0]
    for b in range(BATCH):
        np.testing.assert_array_equal(np.sort(first[b]), np.arange(s))
    # forced first action has zero logprob
    lp = unbatchify(out.logprobs, s)
    np.testing.assert_allclose(np.asarray(lp)[:, :, 0], 0.0)


def test_multistart_select_best_improves():
    env, policy, params = make_policy("tsp")
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    s = env.get_num_starts()
    spec_all = DecodeSpec(kind="greedy", multistart=True, num_starts=s)
    out_all = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec_all)
    spec_best = DecodeSpec(kind="greedy", multistart=True, num_starts=s, select_best=True)
    out_best = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec_best)
    assert out_best.reward.shape == (BATCH,)
    grouped = np.asarray(unbatchify(out_all.reward, s))
    np.testing.assert_allclose(
        np.asarray(out_best.reward), grouped.max(axis=1), rtol=1e-5
    )


def test_evaluate_mode_replays_actions():
    env, policy, params = make_policy("tsp")
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(kind="sampling", tanh_clipping=10.0)
    out = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec)
    spec_eval = DecodeSpec(kind="evaluate", tanh_clipping=10.0)
    out_eval = rollout(policy, params, env, instances, jax.random.PRNGKey(3), spec_eval,
                       replay_actions=out.actions)
    np.testing.assert_array_equal(np.asarray(out.actions), np.asarray(out_eval.actions))
    np.testing.assert_allclose(
        np.asarray(out.log_likelihood), np.asarray(out_eval.log_likelihood), rtol=1e-4
    )


def test_greedy_deterministic():
    env, policy, params = make_policy("cvrp")
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(kind="greedy")
    o1 = rollout(policy, params, env, instances, jax.random.PRNGKey(2), spec)
    o2 = rollout(policy, params, env, instances, jax.random.PRNGKey(7), spec)
    np.testing.assert_array_equal(np.asarray(o1.actions), np.asarray(o2.actions))


def test_beam_search_beats_greedy():
    from rl4co_tpu.models.policies.beam_search import beam_search_rollout

    env, policy, params = make_policy("tsp")
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    greedy = rollout(policy, params, env, instances, jax.random.PRNGKey(2),
                     DecodeSpec(kind="greedy", tanh_clipping=10.0))
    beam = beam_search_rollout(policy, params, env, instances,
                               jax.random.PRNGKey(2), beam_width=4,
                               spec=DecodeSpec(kind="greedy", tanh_clipping=10.0))
    assert beam.reward.shape == (BATCH,)
    # beam contains the greedy trajectory -> must be at least as good
    assert (np.asarray(beam.reward) >= np.asarray(greedy.reward) - 1e-5).all()
    for b in range(BATCH):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(beam.actions)[b])


def test_beam_search_no_select_best_shapes():
    from rl4co_tpu.models.policies.beam_search import beam_search_rollout

    env, policy, params = make_policy("cvrp")
    instances = env.generate_batch(jax.random.PRNGKey(1), 2)
    out = beam_search_rollout(policy, params, env, instances,
                              jax.random.PRNGKey(2), beam_width=3,
                              select_best=False)
    assert out.reward.shape == (6,)


def test_matnet_init_embedding_modes():
    """MatNetInitEmbedding (reference `init.py:71-112`): zero rows + random
    one-hot / uniform columns derived from the cost matrix."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rl4co_tpu.models.nn.env_embeddings.init import MatNetInitEmbedding

    dmat = jax.random.uniform(jax.random.PRNGKey(0), (3, 5, 5))
    for mode in ("RandomOneHot", "Random"):
        mod = MatNetInitEmbedding(embed_dim=8, mode=mode)
        params = mod.init({"params": jax.random.PRNGKey(1),
                           "embed": jax.random.PRNGKey(2)},
                          {"cost_matrix": dmat})
        row, col, out = mod.apply(params, {"cost_matrix": dmat},
                                  rngs={"embed": jax.random.PRNGKey(3)})
        assert row.shape == (3, 5, 8) and (np.asarray(row) == 0).all()
        assert col.shape == (3, 5, 8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(dmat))
        if mode == "RandomOneHot":
            s = np.asarray(col).sum(axis=-1)
            assert (s == 1).all()                       # one-hot rows
            assert (np.asarray(col).sum(axis=1) <= 1).all()  # distinct slots
