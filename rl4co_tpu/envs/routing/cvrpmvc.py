"""CVRP with maximum-vehicle-count constraint (GLOP variant).

TPU-native re-design of `rl4co/envs/routing/cvrpmvc/env.py:12-89`
(`CVRPMVCEnv(CVRPEnv)`): the depot is additionally masked when the
unassigned vehicles' total capacity could no longer cover the remaining
demand (max vehicles = ceil(total demand / capacity) + 1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from rl4co_tpu.envs.base import Instance
from rl4co_tpu.envs.routing.cvrp import CVRP
from rl4co_tpu.utils.ops import set_at


@struct.dataclass
class CVRPMVCState:
    locs: jax.Array
    demand: jax.Array
    used_capacity: jax.Array
    vehicles_used: jax.Array     # i32
    demand_remaining: jax.Array  # f32
    max_vehicle: jax.Array       # f32
    current_node: jax.Array
    visited: jax.Array
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class CVRPMVC(CVRP):
    name = "cvrpmvc"

    def reset(self, instance: Instance) -> CVRPMVCState:
        base = super().reset(instance)
        demand_remaining = instance["demand"].sum()
        return CVRPMVCState(
            locs=base.locs,
            demand=base.demand,
            used_capacity=base.used_capacity,
            vehicles_used=jnp.int32(1),
            demand_remaining=demand_remaining,
            max_vehicle=jnp.ceil(demand_remaining / self.vehicle_capacity) + 1,
            current_node=base.current_node,
            visited=base.visited,
            i=base.i,
            done=base.done,
        )

    def step(self, state: CVRPMVCState, action: jax.Array) -> CVRPMVCState:
        action = action.astype(jnp.int32)
        is_depot = action == 0
        vehicles_used = state.vehicles_used + (
            is_depot & (state.current_node != 0)
        )
        selected_demand = state.demand[jnp.clip(action - 1, 0, self.num_loc - 1)]
        used = jnp.where(is_depot, 0.0, state.used_capacity + selected_demand)
        demand_remaining = state.demand_remaining - jnp.where(
            is_depot, 0.0, selected_demand
        )
        visited = set_at(state.visited, action, True)
        new = state.replace(
            current_node=action,
            used_capacity=used,
            vehicles_used=vehicles_used,
            demand_remaining=demand_remaining,
            visited=visited,
            i=state.i + 1,
            done=visited.all(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: CVRPMVCState) -> jax.Array:
        exceeds = state.demand + state.used_capacity > self.vehicle_capacity
        mask_loc = state.visited[1:] | exceeds
        capacity_remaining = (
            state.max_vehicle - state.vehicles_used
        ) * self.vehicle_capacity
        mask_depot = (
            (state.current_node == 0) | (state.demand_remaining > capacity_remaining)
        ) & ~mask_loc.all()
        feasible = jnp.concatenate([jnp.logical_not(mask_depot)[None], ~mask_loc])
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)
