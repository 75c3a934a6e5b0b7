"""Capacitated Vehicle Routing Problem environment.

TPU-native re-design of `rl4co/envs/routing/cvrp/env.py:22-256` (`CVRPEnv`)
and `rl4co/envs/routing/cvrp/generator.py` (capacity table from Kool et al.,
`cvrp/generator.py:15-30`).

Node 0 is the depot; customers are ``1..num_loc``. Demands are normalized by
vehicle capacity (so ``vehicle_capacity == 1.0``). Mask: a customer is
infeasible if already visited or its demand exceeds remaining capacity; the
depot is infeasible right after a depot visit while customers remain
(reference `cvrp/env.py:126-136`). Episodes end when all customers AND the
depot have been marked visited; afterwards the depot is the absorbing action
(depot→depot arcs add zero length, so padded scan steps don't change reward).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import get_tour_length, set_at

# Kool et al. 2019 / Hottung et al. 2022 / Kim et al. 2023 capacity schedule
# (reference `rl4co/envs/routing/cvrp/generator.py:15-30`).
CAPACITIES = {
    10: 20.0, 15: 25.0, 20: 30.0, 30: 33.0, 40: 37.0, 50: 40.0, 60: 43.0,
    75: 45.0, 100: 50.0, 125: 55.0, 150: 60.0, 200: 70.0, 500: 100.0,
    1000: 150.0,
}


def default_capacity(num_loc: int) -> float:
    if num_loc in CAPACITIES:
        return CAPACITIES[num_loc]
    closest = min(CAPACITIES, key=lambda k: abs(k - num_loc))
    return CAPACITIES[closest]


@struct.dataclass
class CVRPState:
    locs: jax.Array           # [N+1, 2] depot at 0
    demand: jax.Array         # [N] normalized by capacity
    used_capacity: jax.Array  # f32 scalar
    current_node: jax.Array   # i32 scalar
    visited: jax.Array        # bool [N+1] incl. depot slot
    i: jax.Array              # i32 scalar
    done: jax.Array           # bool scalar


@dataclasses.dataclass(frozen=True)
class CVRP(Env):
    name = "cvrp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    min_demand: int = 1
    max_demand: int = 10
    capacity: float | None = None  # None -> Kool et al. table
    vehicle_capacity: float = 1.0

    @property
    def _capacity(self) -> float:
        return self.capacity if self.capacity is not None else default_capacity(self.num_loc)

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot, kdem = jax.random.split(key, 3)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(
            kdepot, (2,), minval=self.min_loc, maxval=self.max_loc
        )
        # Integer demands in [min_demand, max_demand - 1], normalized by
        # capacity. The reference samples Uniform[min-1, max-1), floors, and
        # adds 1 (`cvrp/generator.py:96-98,126-127`) — with the defaults
        # (1, 10) that is integers 1..9, Kool et al.'s distribution. Round
        # 1-3 sampled 1..10 here (~10% more total demand per instance),
        # which inflates route counts and biases every gap measured against
        # the Kool/LKH anchors upward.
        demand = jax.random.randint(
            kdem, (self.num_loc,), self.min_demand, self.max_demand
        ).astype(jnp.float32)
        demand = demand / self._capacity
        return {"locs": locs, "depot": depot, "demand": demand}

    def reset(self, instance: Instance) -> CVRPState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        return CVRPState(
            locs=locs,
            demand=instance["demand"],
            used_capacity=jnp.float32(0.0),
            current_node=jnp.int32(0),
            visited=jnp.zeros((self.num_loc + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: CVRPState, action: jax.Array) -> CVRPState:
        action = action.astype(jnp.int32)
        is_depot = action == 0
        selected_demand = state.demand[jnp.clip(action - 1, 0, self.num_loc - 1)]
        used = jnp.where(is_depot, 0.0, state.used_capacity + selected_demand)
        visited = set_at(state.visited, action, True)
        done = visited.all()
        new = CVRPState(
            locs=state.locs,
            demand=state.demand,
            used_capacity=used,
            current_node=action,
            visited=visited,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(state.done, o, n), new, state
        )

    def action_mask(self, state: CVRPState) -> jax.Array:
        exceeds = state.demand + state.used_capacity > self.vehicle_capacity + 1e-5
        mask_loc = state.visited[1:] | exceeds  # True = infeasible
        unserved = (~mask_loc).sum() > 0
        mask_depot = (state.current_node == 0) & unserved
        feasible = jnp.concatenate([jnp.logical_not(mask_depot)[None], ~mask_loc])
        pad = jnp.zeros_like(feasible).at[0].set(True)  # absorbing: depot only
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: CVRPState, actions: jax.Array) -> jax.Array:
        # Prepend the depot (tour starts there); trailing pad zeros are
        # depot→depot arcs with zero length (reference `cvrp/env.py:139-147`).
        ordered = jnp.concatenate(
            [state.locs[0:1], state.locs[actions]], axis=0
        )
        return -get_tour_length(ordered)

    @property
    def num_actions(self) -> int:
        return self.num_loc + 1

    @property
    def max_steps(self) -> int:
        # Worst case alternates customer/depot: 2 * num_loc steps.
        return 2 * self.num_loc

    def get_num_starts(self) -> int:
        # POMO starts at each customer (reference `utils/ops.py:147-156`).
        return self.num_loc

    def select_start_nodes(self, instance: Instance, num_starts: int) -> jax.Array:
        return jnp.arange(1, num_starts + 1, dtype=jnp.int32)

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # Reference `cvrp/env.py:149-177`.
        actions = np.asarray(actions)
        demand = np.asarray(instance["demand"])
        n = self.num_loc
        sorted_pi = np.sort(actions, axis=-1)
        assert (sorted_pi[..., -n:] == np.arange(1, n + 1)).all(), "Invalid tour"
        assert (sorted_pi[..., :-n] == 0).all(), "Invalid tour (repeated customers)"
        d = np.concatenate([[-self.vehicle_capacity], demand])[actions]
        used = 0.0
        for t in range(actions.shape[-1]):
            used = max(used + d[t], 0.0)
            assert used <= self.vehicle_capacity + 1e-5, "Used more than capacity"
