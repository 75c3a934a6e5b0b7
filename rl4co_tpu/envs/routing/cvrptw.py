"""CVRP with Time Windows environment.

TPU-native re-design of `rl4co/envs/routing/cvrptw/env.py:15-220`
(`CVRPTWEnv(CVRPEnv)`) and `cvrptw/generator.py`: CVRP plus integer time
windows within [0, max_time] guaranteeing depot-return feasibility; service
durations default to zero (as the reference generator). Reward remains the
negative tour length (time windows are constraints only).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Instance
from rl4co_tpu.envs.routing.cvrp import CVRP
from rl4co_tpu.utils.ops import get_tour_length, set_at


@struct.dataclass
class CVRPTWState:
    locs: jax.Array          # [N+1, 2]
    demand: jax.Array        # [N]
    time_windows: jax.Array  # [N+1, 2]
    durations: jax.Array     # [N+1]
    current_time: jax.Array  # f32
    used_capacity: jax.Array
    current_node: jax.Array
    visited: jax.Array
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class CVRPTW(CVRP):
    name = "cvrptw"
    max_loc: float = 150.0  # reference generator default (`cvrptw/generator.py:22,55`)
    max_time: float = 480.0
    scale: bool = False

    def generate(self, key: jax.Array) -> Instance:
        kbase, kt1, kt2 = jax.random.split(key, 3)
        base = super().generate(kbase)
        locs, depot = base["locs"], base["depot"]
        n = self.num_loc
        durations = jnp.zeros((n + 1,))
        dist = jnp.concatenate(
            [jnp.zeros((1,)), jnp.linalg.norm(locs - depot[None, :], axis=-1)]
        )
        upper = self.max_time - dist - durations
        ts1 = jax.random.uniform(kt1, (n + 1,))
        ts2 = jax.random.uniform(kt2, (n + 1,))
        min_ts = jnp.floor(dist + (upper - dist) * ts1)
        max_ts = jnp.floor(dist + (upper - dist) * ts2)
        min_t = jnp.minimum(min_ts, max_ts)
        max_t = jnp.maximum(min_ts, max_ts)
        min_t = min_t.at[0].set(0.0)
        max_t = max_t.at[0].set(self.max_time)
        # avoid degenerate equal windows (reference `generator.py:110-130`)
        eq = min_t == max_t
        min_t = jnp.where(eq, jnp.maximum(jnp.floor(dist), min_t - 1), min_t)
        eq = min_t == max_t
        max_t = jnp.where(eq, jnp.minimum(jnp.floor(upper), max_t + 1), max_t)
        tw = jnp.stack([min_t, max_t], axis=-1)
        if self.scale:
            base["locs"] = locs / self.max_time
            base["depot"] = depot / self.max_time
            durations = durations / self.max_time
            tw = tw / self.max_time
        return {**base, "durations": durations, "time_windows": tw}

    def reset(self, instance: Instance) -> CVRPTWState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        return CVRPTWState(
            locs=locs,
            demand=instance["demand"],
            time_windows=instance["time_windows"],
            durations=instance["durations"],
            current_time=jnp.float32(0.0),
            used_capacity=jnp.float32(0.0),
            current_node=jnp.int32(0),
            visited=jnp.zeros((self.num_loc + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: CVRPTWState, action: jax.Array) -> CVRPTWState:
        action = action.astype(jnp.int32)
        is_depot = action == 0
        dist = jnp.linalg.norm(state.locs[action] - state.locs[state.current_node])
        start = state.time_windows[action, 0]
        duration = state.durations[action]
        current_time = jnp.where(
            is_depot,
            0.0,
            jnp.maximum(state.current_time + dist, start) + duration,
        )
        selected_demand = state.demand[jnp.clip(action - 1, 0, self.num_loc - 1)]
        used = jnp.where(is_depot, 0.0, state.used_capacity + selected_demand)
        visited = set_at(state.visited, action, True)
        new = state.replace(
            current_time=current_time,
            used_capacity=used,
            visited=visited,
            current_node=action,
            i=state.i + 1,
            done=visited.all(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: CVRPTWState) -> jax.Array:
        exceeds = state.demand + state.used_capacity > self.vehicle_capacity + 1e-5
        mask_loc = state.visited[1:] | exceeds
        unserved = (~mask_loc).sum() > 0
        mask_depot = (state.current_node == 0) & unserved
        feasible = jnp.concatenate([jnp.logical_not(mask_depot)[None], ~mask_loc])
        # time-window reachability (reference `cvrptw/env.py:92-105`)
        dist = jnp.linalg.norm(state.locs - state.locs[state.current_node][None, :], axis=-1)
        can_reach = state.current_time + dist <= state.time_windows[:, 1]
        feasible = feasible & can_reach
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: CVRPTWState, actions: jax.Array) -> jax.Array:
        ordered = jnp.concatenate([state.locs[0:1], state.locs[actions]], axis=0)
        return -get_tour_length(ordered)

    def check_solution_validity(self, instance: Instance, actions) -> None:
        super().check_solution_validity(instance, actions)
        # time-window replay (reference `cvrptw/env.py:155-186`)
        actions = np.asarray(actions)
        locs = np.concatenate(
            [np.asarray(instance["depot"])[None, :], np.asarray(instance["locs"])]
        )
        tw = np.asarray(instance["time_windows"])
        dur = np.asarray(instance["durations"])
        t, cur = 0.0, 0
        for a in actions:
            d = np.linalg.norm(locs[a] - locs[cur])
            t = max(t + d, tw[a, 0])
            assert t <= tw[a, 1] + 1e-4, "vehicle cannot start service before deadline"
            t += dur[a]
            cur = a
            if a == 0:
                t = 0.0
