"""TSP k-opt improvement environment (DACT k=2 / NeuOpt k>2).

TPU-native re-design of `rl4co/envs/routing/tsp/env.py:195-530` (`TSPkoptEnv`)
and `rl4co/envs/common/base.py:336-401` (`ImprovementEnvBase`).

The solution is a linked list ``rec[i] = j`` (edge i→j in the tour). The MDP
improves an initial random tour; the per-step reward is the decrease of the
best-so-far cost. The reference's data-dependent Python loops (2-opt segment
reversal, visited-time walk) become fixed-trip-count `lax.fori_loop`s
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Instance
from rl4co_tpu.utils.ops import inverse_permutation, mark_vector_set, scatter_permutation, set_at


@struct.dataclass
class TSPkoptState:
    locs: jax.Array           # [N, 2]
    rec_current: jax.Array    # [N] linked list
    rec_best: jax.Array       # [N]
    cost_current: jax.Array   # f32
    cost_bsf: jax.Array       # f32
    visited_time: jax.Array   # [N] position of node in tour (1-based, node0=0)
    i: jax.Array              # i32 steps taken


def linked_list_cost(locs: jax.Array, rec: jax.Array) -> jax.Array:
    """Tour length of a linked-list solution (reference `base.py:364-372`)."""
    return jnp.linalg.norm(locs[rec] - locs, axis=-1).sum()


def compute_visited_time(rec: jax.Array) -> jax.Array:
    """Walk the linked list from node 0 recording visit order
    (reference `tsp/env.py:262-271`)."""
    n = rec.shape[0]

    def body(i, carry):
        vt, pre = carry
        cur = rec[pre]
        vt = set_at(vt, cur, i + 1)
        return vt, cur

    vt, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((n,), jnp.int32), jnp.int32(0)))
    return vt


def random_linked_tour(key: jax.Array, n: int) -> jax.Array:
    """Random tour as a linked list (reference `tsp/generator.py:61-75`)."""
    perm = jax.random.permutation(key, n)
    nxt = jnp.roll(perm, -1)
    return scatter_permutation(perm, nxt.astype(jnp.int32))


def two_opt_move(rec: jax.Array, first: jax.Array, second: jax.Array) -> jax.Array:
    """Apply a 2-opt move on the linked list (reference `tsp/env.py:330-348`):
    remove edges (pre(first)→first) and (second→post(second)), reconnect
    pre(first)→second and first→post(second), reversing the segment."""
    n = rec.shape[0]
    argsort = inverse_permutation(rec)  # pre-node
    new_rec = rec
    pre_first = argsort[first]
    pre_first = jnp.where(pre_first != second, pre_first, first)
    new_rec = set_at(new_rec, pre_first, second)
    post_second = rec[second]
    post_second = jnp.where(post_second != first, post_second, second)
    new_rec = set_at(new_rec, first, post_second)

    def body(i, carry):
        nr, cur = carry
        cur_next = rec[cur]
        val = jnp.where(cur != second, cur, nr[cur_next])
        nr = set_at(nr, cur_next, val)
        cur = jnp.where(cur != second, cur_next, cur)
        return nr, cur

    new_rec, _ = jax.lax.fori_loop(0, n, body, (new_rec, first))
    return new_rec


def k_opt_move(rec: jax.Array, action: jax.Array, k_max: int) -> jax.Array:
    """NeuOpt k-opt move (reference `tsp/env.py:350-381`): ``action`` packs
    [selected_index (k), left (k), right (k)]."""
    n = rec.shape[0]
    selected = action[:k_max]
    left = action[k_max : 2 * k_max]
    right = action[2 * k_max :]
    right_nodes = rec[selected]
    argsort = inverse_permutation(rec)
    new_rec = mark_vector_set(rec, left, right)

    def body(i, carry):
        nr, cur = carry
        next_cur = nr[cur]
        pre_next_wrt_old = argsort[next_cur]
        reverse = (cur != pre_next_wrt_old) & ~(next_cur == right_nodes).any()
        next_next = nr[next_cur]
        nr = set_at(nr, next_cur, jnp.where(reverse, pre_next_wrt_old, next_next))
        return nr, next_cur

    new_rec, _ = jax.lax.fori_loop(0, n - 2, body, (new_rec, left[0]))
    return new_rec


@dataclasses.dataclass(frozen=True)
class TSPkopt:
    """Improvement env config (not a constructive `Env`: reset needs a key for
    the initial solution and rewards are per step)."""

    name = "tsp_kopt"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    k_max: int = 2

    @property
    def two_opt_mode(self) -> bool:
        return self.k_max == 2

    def generate(self, key: jax.Array) -> Instance:
        locs = jax.random.uniform(
            key, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        return {"locs": locs}

    def generate_batch(self, key: jax.Array, batch_size: int) -> Instance:
        return jax.vmap(self.generate)(jax.random.split(key, batch_size))

    def reset(self, instance: Instance, key: jax.Array) -> TSPkoptState:
        rec = random_linked_tour(key, self.num_loc)
        cost = linked_list_cost(instance["locs"], rec)
        return TSPkoptState(
            locs=instance["locs"],
            rec_current=rec,
            rec_best=rec,
            cost_current=cost,
            cost_bsf=cost,
            visited_time=compute_visited_time(rec),
            i=jnp.int32(0),
        )

    def reset_batch(self, instances: Instance, key: jax.Array) -> TSPkoptState:
        b = jax.tree_util.tree_leaves(instances)[0].shape[0]
        return jax.vmap(self.reset)(instances, jax.random.split(key, b))

    def step(self, state: TSPkoptState, action: jax.Array):
        """Returns (next_state, reward); reward = decrease of best-so-far cost
        (reference `tsp/env.py:240-285`)."""
        if self.two_opt_mode:
            next_rec = two_opt_move(state.rec_current, action[0], action[1])
        else:
            next_rec = k_opt_move(state.rec_current, action, self.k_max)
        return self._advance(state, next_rec, count_step=True)

    def step_to_solution(self, state: TSPkoptState, rec: jax.Array):
        """Force the current solution (reference `base.py:355-357`)."""
        return self._advance(state, rec, count_step=False)

    def _advance(self, state: TSPkoptState, next_rec: jax.Array, count_step: bool):
        new_cost = linked_list_cost(state.locs, next_rec)
        now_bsf = jnp.minimum(new_cost, state.cost_bsf)
        reward = state.cost_bsf - now_bsf
        improved = reward > 0.0
        rec_best = jnp.where(improved, next_rec, state.rec_best)
        next_state = state.replace(
            rec_current=next_rec,
            rec_best=rec_best,
            cost_current=new_cost,
            cost_bsf=now_bsf,
            visited_time=compute_visited_time(next_rec),
            i=state.i + (1 if count_step else 0),
        )
        return next_state, reward

    def step_batch(self, state, action):
        return jax.vmap(self.step)(state, action)

    @property
    def num_actions(self) -> int:
        return self.num_loc

    def get_best_tour(self, state: TSPkoptState) -> jax.Array:
        """Convert best linked list to a visiting-order permutation
        (reference `base.py:374-384`)."""
        vt = jax.vmap(compute_visited_time)(state.rec_best)
        return jnp.argsort(vt % self.num_loc, axis=-1)

    def check_solution_validity(self, instance: Instance, rec) -> None:
        rec = np.asarray(rec)
        assert (np.sort(rec) == np.arange(self.num_loc)).all(), "Not a tour"
        # single cycle check
        seen, cur = set(), 0
        for _ in range(self.num_loc):
            assert cur not in seen, "Subtour detected"
            seen.add(cur)
            cur = int(rec[cur])
        assert cur == 0 and len(seen) == self.num_loc
