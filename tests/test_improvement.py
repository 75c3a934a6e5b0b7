"""Improvement MDP tests (TSP k-opt; reference `tests/test_training.py:237-299`)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.envs.routing.tsp_kopt import (
    TSPkopt,
    compute_visited_time,
    linked_list_cost,
    random_linked_tour,
    two_opt_move,
)


def test_random_linked_tour_is_cycle():
    rec = np.asarray(random_linked_tour(jax.random.PRNGKey(0), 10))
    cur, seen = 0, set()
    for _ in range(10):
        assert cur not in seen
        seen.add(cur)
        cur = int(rec[cur])
    assert cur == 0


def test_two_opt_preserves_tour_and_changes_cost():
    env = TSPkopt(num_loc=10)
    inst = env.generate(jax.random.PRNGKey(0))
    state = env.reset(inst, jax.random.PRNGKey(1))
    env.check_solution_validity(inst, state.rec_current)
    # apply a 2-opt move on nodes at tour positions 2 and 5
    vt = np.asarray(state.visited_time)
    order = np.argsort(vt)
    first, second = int(order[2]), int(order[5])
    new_rec = two_opt_move(state.rec_current, jnp.int32(first), jnp.int32(second))
    env.check_solution_validity(inst, new_rec)


def test_step_reward_tracks_bsf():
    env = TSPkopt(num_loc=8)
    instances = env.generate_batch(jax.random.PRNGKey(0), 4)
    state = env.reset_batch(instances, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    total = np.zeros(4)
    for t in range(10):
        k1, k2, key = jax.random.split(key, 3)
        first = jax.random.randint(k1, (4,), 0, 8)
        second = jax.random.randint(k2, (4,), 0, 8)
        action = jnp.stack([first, second], axis=-1)
        state, reward = env.step_batch(state, action)
        total += np.asarray(reward)
        assert (np.asarray(reward) >= -1e-6).all()
    # bsf decrease accumulated == initial - final bsf
    init_state = env.reset_batch(instances, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        total,
        np.asarray(init_state.cost_bsf) - np.asarray(state.cost_bsf),
        rtol=1e-4,
    )
    # rec_best always valid
    for b in range(4):
        env.check_solution_validity(None, np.asarray(state.rec_best)[b])


def test_visited_time_consistent():
    rec = random_linked_tour(jax.random.PRNGKey(3), 12)
    vt = np.asarray(compute_visited_time(rec))
    order = np.argsort(vt)
    # order follows the linked list from node 0
    cur = 0
    for i in range(1, 12):
        cur = int(np.asarray(rec)[cur])
        assert vt[cur] == i or (cur == 0)
