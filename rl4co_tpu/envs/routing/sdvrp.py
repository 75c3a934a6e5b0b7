"""Split-Delivery VRP environment.

TPU-native re-design of `rl4co/envs/routing/sdvrp/env.py:15-193` (`SDVRPEnv`):
CVRP where customers may be visited multiple times, each visit delivering
``min(remaining demand, remaining capacity)``. Requires the SDVRP dynamic
embedding (remaining demand → K/V updates,
`rl4co/models/nn/env_embeddings/dynamic.py:60-78`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Instance
from rl4co_tpu.envs.routing.cvrp import CVRP
from rl4co_tpu.utils.ops import add_at, get_tour_length


@struct.dataclass
class SDVRPState:
    locs: jax.Array               # [N+1, 2]
    demand: jax.Array             # [N] original demands
    demand_with_depot: jax.Array  # [N+1] remaining demands (depot slot = 0)
    used_capacity: jax.Array
    current_node: jax.Array
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class SDVRP(CVRP):
    name = "sdvrp"

    def reset(self, instance: Instance) -> SDVRPState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        return SDVRPState(
            locs=locs,
            demand=instance["demand"],
            demand_with_depot=jnp.concatenate([jnp.zeros((1,)), instance["demand"]]),
            used_capacity=jnp.float32(0.0),
            current_node=jnp.int32(0),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: SDVRPState, action: jax.Array) -> SDVRPState:
        action = action.astype(jnp.int32)
        is_depot = action == 0
        selected = state.demand_with_depot[action]
        delivered = jnp.minimum(selected, self.vehicle_capacity - state.used_capacity)
        used = jnp.where(is_depot, 0.0, state.used_capacity + delivered)
        demand_wd = add_at(state.demand_with_depot, action, -delivered)
        done = ~(demand_wd > 0).any()
        new = state.replace(
            demand_with_depot=demand_wd,
            used_capacity=used,
            current_node=action,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: SDVRPState) -> jax.Array:
        mask_loc = (state.demand_with_depot[1:] == 0) | (
            state.used_capacity >= self.vehicle_capacity
        )
        unserved = (~mask_loc).sum() > 0
        mask_depot = (state.current_node == 0) & unserved
        feasible = jnp.concatenate([jnp.logical_not(mask_depot)[None], ~mask_loc])
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: SDVRPState, actions: jax.Array) -> jax.Array:
        ordered = jnp.concatenate([state.locs[0:1], state.locs[actions]], axis=0)
        return -get_tour_length(ordered)

    @property
    def max_steps(self) -> int:
        # Customer visits either finish a customer (<= N) or fill the vehicle
        # exactly (<= ceil(total_demand) <= N * max_demand / capacity), each
        # possibly followed by a depot visit -> 3N is a safe static bound for
        # the Kool capacity schedule (max_demand/capacity <= 1/3).
        return 3 * self.num_loc

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # all demand must be delivered following capacity rules
        # (reference `sdvrp/env.py:126-160`)
        actions = np.asarray(actions)
        demand = np.asarray(instance["demand"]).copy()
        cap = self.vehicle_capacity
        used = 0.0
        for a in actions:
            if a == 0:
                used = 0.0
            else:
                d = min(demand[a - 1], cap - used)
                demand[a - 1] -= d
                used += d
                assert used <= cap + 1e-5, "Capacity exceeded"
        assert (demand <= 1e-5).all(), "Unserved demand remains"
