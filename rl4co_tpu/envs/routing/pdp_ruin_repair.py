"""PDP ruin-repair improvement environment (N2S, Ma et al. 2022).

TPU-native re-design of `rl4co/envs/routing/pdp/env.py:239-524`
(`PDPRuinRepairEnv`): the solution is a linked list over ``num_loc + 1``
nodes (depot 0, pickups 1..n/2, deliveries n/2+1..n). An action
``(pair, first, second)`` removes pickup-delivery pair ``pair+1`` and
reinserts the pickup after node ``first`` and the delivery after node
``second``; per-step reward is the best-so-far cost decrease.

``action_record`` keeps a rolling history of removed pairs consumed by the
N2S removal decoder (`zoo/n2s/decoder.py:60-63`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Instance
from rl4co_tpu.envs.routing.tsp_kopt import compute_visited_time, linked_list_cost
from rl4co_tpu.utils.ops import inverse_permutation, scatter_permutation, set_at


@struct.dataclass
class PDPRRState:
    locs: jax.Array           # [N+1, 2]
    rec_current: jax.Array    # [N+1] linked list
    rec_best: jax.Array
    cost_current: jax.Array
    cost_bsf: jax.Array
    visited_time: jax.Array   # [N+1]
    action_record: jax.Array  # [hist, N/2]
    i: jax.Array


def ruin_repair_move(rec: jax.Array, pair_index, first, second) -> jax.Array:
    """Remove pair and reinsert (reference `pdp/env.py:389-419`)."""
    gs = rec.shape[0]
    half = gs // 2
    # remove pickup
    argsort = inverse_permutation(rec)
    pre_p = argsort[pair_index]
    post_p = rec[pair_index]
    rec = set_at(rec, pre_p, post_p)
    rec = set_at(rec, pair_index, pair_index)
    # remove delivery
    argsort = inverse_permutation(rec)
    d = pair_index + half
    pre_d = argsort[d]
    post_d = rec[d]
    rec = set_at(rec, pre_d, post_d)
    # reinsert delivery after `second`
    post_second = rec[second]
    rec = set_at(rec, second, d)
    rec = set_at(rec, d, post_second)
    # reinsert pickup after `first`
    post_first = rec[first]
    rec = set_at(rec, first, pair_index)
    rec = set_at(rec, pair_index, post_first)
    return rec


def reinsertion_mask(visited_time: jax.Array, selected_node: jax.Array) -> jax.Array:
    """Feasible (first, second) insertion positions (reference
    `pdp/env.py:494-511`): pickup must precede delivery and neither may
    attach to the removed pair itself."""
    gs = visited_time.shape[0]
    half = gs // 2
    vt = visited_time % gs
    order = vt[:, None] > vt[None, :]
    mask = order
    d = selected_node + half
    rows = jnp.arange(gs)
    row_hit = (rows == selected_node) | (rows == d)
    mask = mask | row_hit[:, None] | row_hit[None, :]
    return ~mask


@dataclasses.dataclass(frozen=True)
class PDPRuinRepair:
    name = "pdp_ruin_repair"
    num_loc: int = 20  # even; gs = num_loc + 1
    min_loc: float = 0.0
    max_loc: float = 1.0
    history: int = 4   # rolling action-record slots (last 3 + mean in decoder)

    def __post_init__(self):
        assert self.num_loc % 2 == 0

    @property
    def gs(self) -> int:
        return self.num_loc + 1

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot = jax.random.split(key)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        return {"locs": locs, "depot": depot}

    def generate_batch(self, key: jax.Array, batch_size: int) -> Instance:
        return jax.vmap(self.generate)(jax.random.split(key, batch_size))

    def reset(self, instance: Instance, key: jax.Array) -> PDPRRState:
        gs, half = self.gs, self.gs // 2
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        # feasible random init: visit pairs in random order, pickup then delivery
        perm = jax.random.permutation(key, half) + 1  # pickups 1..half
        seq = jnp.stack([perm, perm + half], axis=-1).reshape(-1)  # p1 d1 p2 d2 ...
        order = jnp.concatenate([jnp.zeros((1,), seq.dtype), seq])
        nxt = jnp.roll(order, -1)
        rec = scatter_permutation(order, nxt.astype(jnp.int32))
        cost = linked_list_cost(locs, rec)
        return PDPRRState(
            locs=locs,
            rec_current=rec,
            rec_best=rec,
            cost_current=cost,
            cost_bsf=cost,
            visited_time=compute_visited_time(rec),
            action_record=jnp.zeros((self.history, half)),
            i=jnp.int32(0),
        )

    def reset_batch(self, instances: Instance, key: jax.Array) -> PDPRRState:
        b = jax.tree_util.tree_leaves(instances)[0].shape[0]
        return jax.vmap(self.reset)(instances, jax.random.split(key, b))

    def step(self, state: PDPRRState, action: jax.Array):
        pair_index = action[0].astype(jnp.int32) + 1
        first = action[1].astype(jnp.int32)
        second = action[2].astype(jnp.int32)
        next_rec = ruin_repair_move(state.rec_current, pair_index, first, second)
        new_cost = linked_list_cost(state.locs, next_rec)
        now_bsf = jnp.minimum(new_cost, state.cost_bsf)
        reward = state.cost_bsf - now_bsf
        rec_best = jnp.where(reward > 0.0, next_rec, state.rec_best)
        record = jnp.concatenate(
            [state.action_record[1:], jnp.zeros_like(state.action_record[:1])], axis=0
        )
        record = record.at[-1].set(set_at(record[-1], action[0], 1.0))
        next_state = state.replace(
            rec_current=next_rec,
            rec_best=rec_best,
            cost_current=new_cost,
            cost_bsf=now_bsf,
            visited_time=compute_visited_time(next_rec),
            action_record=record,
            i=state.i + 1,
        )
        return next_state, reward

    def step_batch(self, state, action):
        return jax.vmap(self.step)(state, action)

    def step_to_solution(self, state: PDPRRState, rec: jax.Array):
        new_cost = linked_list_cost(state.locs, rec)
        now_bsf = jnp.minimum(new_cost, state.cost_bsf)
        reward = state.cost_bsf - now_bsf
        rec_best = jnp.where(reward > 0.0, rec, state.rec_best)
        return (
            state.replace(
                rec_current=rec, rec_best=rec_best,
                cost_current=new_cost, cost_bsf=now_bsf,
                visited_time=compute_visited_time(rec),
            ),
            reward,
        )

    def check_solution_validity(self, instance: Instance, rec) -> None:
        rec = np.asarray(rec)
        gs, half = self.gs, self.gs // 2
        assert (np.sort(rec) == np.arange(gs)).all(), "Not a tour"
        seen, cur = [], 0
        for _ in range(gs):
            assert cur not in seen, "Subtour detected"
            seen.append(cur)
            cur = int(rec[cur])
        assert cur == 0 and len(seen) == gs
        pos = {node: t for t, node in enumerate(seen)}
        for p in range(1, half + 1):
            assert pos[p] < pos[p + half], f"Delivery {p + half} before pickup {p}"
