"""Env smoke tests: random-policy rollouts + solution validity.

Mirrors the reference test strategy (`tests/test_envs.py:41-64` rolls a
random policy until done and checks reward shape); adds validity checks and
fixed-seed reproducibility the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl4co_tpu.envs import get_env

BATCH = 4


ENV_KWARGS = {
    "mcp": dict(num_items=20, num_sets=10, n_sets_to_choose=3),
    "flp": dict(num_loc=10, to_choose=3),
    "smtwtp": dict(num_job=8),
}


def make_env(env_name, num_loc=10):
    return get_env(env_name, **ENV_KWARGS.get(env_name, {"num_loc": num_loc}))


@pytest.mark.parametrize("env_name", ["tsp", "cvrp", "op", "pctsp", "spctsp", "atsp", "sdvrp", "mtsp", "shpp", "pdp", "cvrptw", "flp", "mcp", "smtwtp", "mtvrp", "svrp", "cvrpmvc", "mdcpdp", "mpdp"])
def test_random_rollout(env_name):
    env = make_env(env_name, 10)
    key = jax.random.PRNGKey(0)
    instances, state, actions, reward = env.rollout_random(key, BATCH)
    assert reward.shape == (BATCH,)
    assert bool(state.done.all())
    assert np.isfinite(np.asarray(reward)).all()
    # validity per instance
    for b in range(BATCH):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], instances)
        env.check_solution_validity(inst_b, np.asarray(actions)[b])


MTVRP_VARIANTS = [
    "cvrp", "ovrp", "vrpb", "vrpl", "vrptw", "ovrptw", "ovrpb", "ovrpl",
    "vrpbl", "vrpbtw", "vrpltw", "ovrpbl", "ovrpbtw", "ovrpltw", "vrpbltw",
    "ovrpbltw",
]


@pytest.mark.parametrize("variant", MTVRP_VARIANTS)
def test_mtvrp_all_16_variants_rollout_valid(variant):
    """All 16 MTVRP variants roll out to valid solutions (reference
    parametrizes the same matrix, `tests/test_envs.py:67-90`)."""
    env = get_env("mtvrp", num_loc=8, variant_preset=variant,
                  use_combinations=False)
    instances, state, actions, reward = env.rollout_random(
        jax.random.PRNGKey(3), 4)
    assert bool(state.done.all())
    assert np.isfinite(np.asarray(reward)).all()
    inst_np = jax.device_get(instances)
    # preset flags actually took effect
    is_open = bool(np.asarray(inst_np["open_route"]).all())
    assert is_open == variant.startswith("o")
    has_b = bool((np.asarray(inst_np["demand_backhaul"]) > 0).any())
    assert has_b == ("b" in variant[1:] if variant.startswith("o") else "b" in variant)
    for b in range(4):
        inst_b = jax.tree_util.tree_map(lambda x: x[b], inst_np)
        env.check_solution_validity(inst_b, np.asarray(actions)[b])


@pytest.mark.parametrize("env_name", ["tsp", "cvrp", "op", "pctsp"])
def test_rollout_deterministic_given_seed(env_name):
    env = make_env(env_name, 8)
    key = jax.random.PRNGKey(42)
    _, _, a1, r1 = env.rollout_random(key, BATCH)
    _, _, a2, r2 = env.rollout_random(key, BATCH)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_tsp_reward_matches_manual():
    env = get_env("tsp", num_loc=5)
    key = jax.random.PRNGKey(1)
    inst = env.generate(key)
    state = env.reset(inst)
    actions = jnp.array([2, 0, 4, 1, 3], dtype=jnp.int32)
    for a in actions:
        state = env.step(state, a)
    locs = np.asarray(inst["locs"])
    order = np.asarray(actions)
    manual = 0.0
    for i in range(5):
        manual += np.linalg.norm(locs[order[i]] - locs[order[(i + 1) % 5]])
    r = float(env.reward(state, actions))
    assert abs(-manual - r) < 1e-5


def test_cvrp_capacity_respected_in_mask():
    env = get_env("cvrp", num_loc=6)
    inst = env.generate(jax.random.PRNGKey(3))
    state = env.reset(inst)
    # visit customers until capacity nearly exhausted; mask must exclude
    # customers whose demand exceeds remaining capacity
    mask = env.action_mask(state)
    assert bool(mask[1:].all())  # initially all customers feasible
    assert not bool(mask[0])  # depot masked at start (current==depot, unserved)
    demand = np.asarray(inst["demand"])
    # greedily take largest demands
    order = list(np.argsort(-demand))
    used = 0.0
    for c in order:
        if used + demand[c] > 1.0 + 1e-5:
            break
        state = env.step(state, jnp.int32(c + 1))
        used += demand[c]
    mask = np.asarray(env.action_mask(state))
    for c in range(6):
        visited = bool(np.asarray(state.visited)[c + 1])
        exceeds = used + demand[c] > 1.0 + 1e-5
        assert mask[c + 1] == (not visited and not exceeds)


def test_cvrp_absorbing_after_done():
    env = get_env("cvrp", num_loc=4)
    key = jax.random.PRNGKey(0)
    _, state, actions, reward = env.rollout_random(key, 2)
    # stepping the absorbing action (depot) must not change reward
    state2 = env.step_batch(state, jnp.zeros((2,), dtype=jnp.int32))
    actions2 = jnp.concatenate([actions, jnp.zeros((2, 1), jnp.int32)], axis=1)
    reward2 = env.reward_batch(state2, actions2)
    np.testing.assert_allclose(np.asarray(reward), np.asarray(reward2), rtol=1e-5)


def test_ffsp_rollout_completes():
    from rl4co_tpu.envs.scheduling.ffsp import FFSP

    env = FFSP(num_stage=2, num_machine=3, num_job=4)
    _, state, actions, reward = env.rollout_random(jax.random.PRNGKey(0), 4)
    assert bool(np.asarray(state.done).all())
    assert (np.asarray(reward) < 0).all()
    # all jobs completed all stages
    assert (np.asarray(state.job_location)[:, :4] == 2).all()


def test_dpp_rollout_and_validity():
    from rl4co_tpu.envs.eda.dpp import DPP

    env = DPP(size=6, max_decaps=5, num_keepout_max=8, num_freq=10)
    instances, state, actions, reward = env.rollout_random(jax.random.PRNGKey(0), 4)
    assert np.isfinite(np.asarray(reward)).all()
    for b in range(4):
        env.check_solution_validity(
            jax.tree_util.tree_map(lambda x: x[b], instances),
            np.asarray(actions)[b],
        )


def test_mdpp_reward_finite():
    import jax.numpy as jnp
    from rl4co_tpu.envs.eda.dpp import MDPP

    env = MDPP(size=6, max_decaps=4, num_keepout_max=6, num_freq=8)
    inst = env.generate_batch(jax.random.PRNGKey(1), 2)
    state = env.reset_batch(inst)
    actions = []
    for t in range(4):
        mask = env.action_mask_batch(state)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        a = jax.random.categorical(
            jax.random.fold_in(jax.random.PRNGKey(2), t), logits, axis=-1
        )
        state = env.step_batch(state, a)
        actions.append(a)
    acts = jnp.stack(actions, axis=1)
    r = env.reward_batch(state, acts)
    assert np.isfinite(np.asarray(r)).all()


def test_fjsp_jssp_rollout_and_lower_bound_invariant():
    from rl4co_tpu.envs.scheduling.fjsp import FJSP, INIT_FINISH, JSSP

    for env in [FJSP(num_jobs=4, num_mas=3), JSSP(num_jobs=3, num_mas=3)]:
        _, state, actions, reward = env.rollout_random(jax.random.PRNGKey(0), 4)
        assert bool(np.asarray(state.done).all())
        sched = np.asarray(state.op_scheduled)
        pad = np.asarray(state.pad_mask)
        ft = np.asarray(state.finish_times)
        assert (sched | pad).all()
        # reference invariant (`fjsp/utils.py:256`): LB == finish time for
        # scheduled ops
        lbs = np.asarray(jax.vmap(env.calc_lower_bound)(state))
        assert np.allclose(lbs[sched], ft[sched], atol=1e-3)


def test_dense_reward_tsp_sums_to_tour_length():
    import jax.numpy as jnp
    from rl4co_tpu.envs.routing.tsp import DenseRewardTSP

    env = DenseRewardTSP(num_loc=8)
    instances = env.generate_batch(jax.random.PRNGKey(0), 3)
    state = env.reset_batch(instances)
    total = np.zeros(3)
    actions = []
    for t in range(8):
        mask = env.action_mask_batch(state)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        a = jax.random.categorical(jax.random.fold_in(jax.random.PRNGKey(1), t),
                                   logits, axis=-1)
        state, r = env.step_with_reward_batch(state, a)
        total += np.asarray(r)
        actions.append(a)
    acts = jnp.stack(actions, axis=1)
    final_reward = np.asarray(env.reward_batch(state, acts))
    np.testing.assert_allclose(total, final_reward, rtol=1e-4)


def test_jssp_lower_bound_golden():
    # Ported from the reference golden test (`tests/test_envs.py:115-136`):
    # identical instance, actions, and expected lower bounds.
    import jax.numpy as jnp
    from rl4co_tpu.envs.scheduling.fjsp import JSSP

    env = JSSP(num_jobs=2, num_mas=2)
    inst = {
        "proc_times": jnp.array([[1.0, 0.0, 0.0, 4.0], [0.0, 2.0, 3.0, 0.0]]),
        "pad_mask": jnp.zeros((4,), bool),
        "start_op_per_job": jnp.array([0, 2], jnp.int32),
        "end_op_per_job": jnp.array([1, 3], jnp.int32),
    }
    state = env.reset(inst)
    for a in [0, 1, 1]:
        state = env.step(state, jnp.int32(a + 1))
    lbs = np.asarray(env.calc_lower_bound(state))
    np.testing.assert_allclose(lbs, [1.0, 5.0, 3.0, 7.0])


def test_fjsp_file_roundtrip(tmp_path):
    # reference `tests/test_envs.py:146-158` write -> parse roundtrip
    import os

    from rl4co_tpu.envs.scheduling.fjsp import FJSP
    from rl4co_tpu.envs.scheduling.parser import load_fjsp_dir, write_fjsp_file

    env = FJSP(num_jobs=3, num_mas=2, max_ops_per_job=3)
    instances = jax.device_get(env.generate_batch(jax.random.PRNGKey(0), 2))
    for b in range(2):
        inst = jax.tree_util.tree_map(lambda x: x[b], instances)
        write_fjsp_file(os.path.join(tmp_path, f"inst_{b}.fjs"), inst)
    loaded = load_fjsp_dir(str(tmp_path), n_ops_max=env.n_ops_max)
    np.testing.assert_allclose(loaded["proc_times"], instances["proc_times"])
    np.testing.assert_array_equal(loaded["pad_mask"], instances["pad_mask"])
    np.testing.assert_array_equal(
        loaded["start_op_per_job"], instances["start_op_per_job"]
    )


def test_mtvrp_classical_solve():
    """In-tree classical baseline (reference `mtvrp/baselines/solve.py`):
    valid across variant presets, multistart never worse than pure greedy,
    external solvers raise ImportError when absent."""
    env = get_env("mtvrp", num_loc=10, variant_preset="all")
    inst = env.generate_batch(jax.random.PRNGKey(0), 3)
    actions, cost = env.solve(inst, num_samples=4, key=jax.random.PRNGKey(1))
    for b in range(3):
        ib = jax.tree_util.tree_map(lambda x: x[b], inst)
        env.check_solution_validity(ib, np.asarray(actions)[b])
    _, c1 = env.solve(inst, num_samples=1, key=jax.random.PRNGKey(1))
    assert (np.asarray(cost) <= np.asarray(c1) + 1e-5).all()
    with pytest.raises((ImportError, NotImplementedError)):
        env.solve(inst, solver="pyvrp")
    with pytest.raises(ValueError):
        env.solve(inst, solver="nope")


def test_mtvrp_validity_check_tracks_current_node():
    """Regression: the replay check must measure each leg from the previous
    node, not the depot (a tour teleporting legs from the depot must fail
    the distance-limit check it would otherwise pass)."""
    env = get_env("mtvrp", num_loc=6, variant_preset="all")
    inst = env.generate_batch(jax.random.PRNGKey(5), 2)
    # build a valid greedy solution, then verify its reward equals the
    # replayed leg lengths (closed-route instances only)
    actions, cost = env.solve(inst, num_samples=1, key=jax.random.PRNGKey(6))
    for b in range(2):
        ib = jax.tree_util.tree_map(lambda x: x[b], inst)
        locs = np.asarray(ib["locs"])
        acts = np.asarray(actions)[b]
        path = np.concatenate([[0], acts])
        legs = np.linalg.norm(locs[path[1:]] - locs[path[:-1]], axis=-1)
        if not bool(ib["open_route"]):
            assert abs(legs.sum() - float(cost[b])) < 1e-3
