"""MTVRP — unified 16-variant multi-task VRP environment.

TPU-native re-design of `rl4co/envs/routing/mtvrp/env.py:16-478` (`MTVRPEnv`,
the RouteFinder/MVMoE foundation env; variant table at `mtvrp/env.py:38-56`)
and `mtvrp/generator.py` (presets `generator.py:31-56`, mixed-batch variant
subsampling `generator.py:229-307`).

Variants are combinations of four features toggled per instance:
    O  (open routes: no return arc to depot)
    TW (time windows + service times)
    L  (route distance limit)
    B  (backhauls: pickups after all linehauls on a route)
Disabled features take neutral defaults (TW = [0, inf), L = inf, O = False,
B folded into linehaul), so a single jitted step/mask covers all 16 variants
— exactly the mixed-batch training setup of Berto et al. 2024.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import set_at

INF = 1e18  # finite stand-in for inf (avoids inf*0 NaNs in masks)


def get_vehicle_capacity(num_loc: int) -> float:
    """Liu et al. 2024 / Ye et al. 2024 demand scaler (reference
    `mtvrp/generator.py:16-28`)."""
    if num_loc > 1000:
        extra = 1000 // 5 + (num_loc - 1000) // 33.3
    elif num_loc > 20:
        extra = num_loc // 5
    else:
        extra = 0
    return 30.0 + extra


VARIANT_PRESETS = {
    "all": {"O": 0.5, "TW": 0.5, "L": 0.5, "B": 0.5},
    "single_feat": {"O": 0.5, "TW": 0.5, "L": 0.5, "B": 0.5},
    "single_feat_otw": {"O": 0.5, "TW": 0.5, "L": 0.5, "B": 0.5, "OTW": 0.5},
    "cvrp": {"O": 0.0, "TW": 0.0, "L": 0.0, "B": 0.0},
    "ovrp": {"O": 1.0, "TW": 0.0, "L": 0.0, "B": 0.0},
    "vrpb": {"O": 0.0, "TW": 0.0, "L": 0.0, "B": 1.0},
    "vrpl": {"O": 0.0, "TW": 0.0, "L": 1.0, "B": 0.0},
    "vrptw": {"O": 0.0, "TW": 1.0, "L": 0.0, "B": 0.0},
    "ovrptw": {"O": 1.0, "TW": 1.0, "L": 0.0, "B": 0.0},
    "ovrpb": {"O": 1.0, "TW": 0.0, "L": 0.0, "B": 1.0},
    "ovrpl": {"O": 1.0, "TW": 0.0, "L": 1.0, "B": 0.0},
    "vrpbl": {"O": 0.0, "TW": 0.0, "L": 1.0, "B": 1.0},
    "vrpbtw": {"O": 0.0, "TW": 1.0, "L": 0.0, "B": 1.0},
    "vrpltw": {"O": 0.0, "TW": 1.0, "L": 1.0, "B": 0.0},
    "ovrpbl": {"O": 1.0, "TW": 0.0, "L": 1.0, "B": 1.0},
    "ovrpbtw": {"O": 1.0, "TW": 1.0, "L": 0.0, "B": 1.0},
    "ovrpltw": {"O": 1.0, "TW": 1.0, "L": 1.0, "B": 0.0},
    "vrpbltw": {"O": 0.0, "TW": 1.0, "L": 1.0, "B": 1.0},
    "ovrpbltw": {"O": 1.0, "TW": 1.0, "L": 1.0, "B": 1.0},
}


@struct.dataclass
class MTVRPState:
    locs: jax.Array                   # [N+1, 2] depot at 0
    demand_linehaul: jax.Array        # [N+1]
    demand_backhaul: jax.Array        # [N+1]
    time_windows: jax.Array           # [N+1, 2]
    service_time: jax.Array           # [N+1]
    distance_limit: jax.Array         # f32
    open_route: jax.Array             # bool
    speed: jax.Array                  # f32
    current_node: jax.Array
    current_time: jax.Array
    current_route_length: jax.Array
    used_capacity_linehaul: jax.Array
    used_capacity_backhaul: jax.Array
    visited: jax.Array                # bool [N+1]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class MTVRP(Env):
    name = "mtvrp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    capacity: float | None = None
    min_demand: int = 1
    max_demand: int = 10
    min_backhaul: int = 1
    max_backhaul: int = 10
    scale_demand: bool = True
    max_time: float = 4.6
    backhaul_ratio: float = 0.2
    distance_limit: float = 3.0
    speed: float = 1.0
    variant_preset: str = "all"
    use_combinations: bool = True

    @property
    def _capacity(self) -> float:
        return self.capacity if self.capacity is not None else get_vehicle_capacity(self.num_loc)

    # ---- generation (reference `mtvrp/generator.py:168-307`) ----

    def generate(self, key: jax.Array) -> Instance:
        n = self.num_loc
        kloc, kdl, kdb, kmix, ksvc, ktwl, ktws, kvar = jax.random.split(key, 8)
        locs = jax.random.uniform(
            kloc, (n + 1, 2), minval=self.min_loc, maxval=self.max_loc
        )
        # demands (reference `generator.py:318-346`)
        line = jnp.floor(
            jax.random.uniform(kdl, (n,), minval=self.min_demand - 1, maxval=self.max_demand - 1)
        ) + 1.0
        back = jnp.floor(
            jax.random.uniform(kdb, (n,), minval=self.min_backhaul - 1, maxval=self.max_backhaul - 1)
        ) + 1.0
        is_linehaul = jax.random.uniform(kmix, (n,)) > self.backhaul_ratio
        line = line * is_linehaul
        back = back * (~is_linehaul)

        # time windows (reference `generator.py:348-390`, Liu et al. 2024)
        a, b, c = 0.15, 0.18, 0.2
        service = a + (b - a) * jax.random.uniform(ksvc, (n,))
        tw_len = b + (c - b) * jax.random.uniform(ktwl, (n,))
        d0i = jnp.linalg.norm(locs[1:] - locs[0][None, :], axis=-1)
        h_max = (self.max_time - service - tw_len) / d0i * self.speed - 1.0
        tw_start = (1 + (h_max - 1) * jax.random.uniform(ktws, (n,))) * d0i / self.speed
        tw_end = tw_start + tw_len
        time_windows = jnp.stack(
            [
                jnp.concatenate([jnp.zeros((1,)), tw_start]),
                jnp.concatenate([jnp.full((1,), self.max_time), tw_end]),
            ],
            axis=-1,
        )
        service_time = jnp.concatenate([jnp.zeros((1,)), service])

        cap = self._capacity
        demand_linehaul = jnp.concatenate([jnp.zeros((1,)), line])
        demand_backhaul = jnp.concatenate([jnp.zeros((1,)), back])
        if self.scale_demand:
            demand_linehaul = demand_linehaul / cap
            demand_backhaul = demand_backhaul / cap

        inst = {
            "locs": locs,
            "demand_linehaul": demand_linehaul,
            "demand_backhaul": demand_backhaul,
            "time_windows": time_windows,
            "service_time": service_time,
            "distance_limit": jnp.float32(self.distance_limit),
            "open_route": jnp.bool_(True),
            "speed": jnp.float32(self.speed),
        }
        return self._subsample_variant(inst, kvar)

    def _subsample_variant(self, inst: Instance, key: jax.Array) -> Instance:
        """Per-instance variant selection (reference `generator.py:229-307`)."""
        probs = VARIANT_PRESETS[self.variant_preset]
        if self.use_combinations and self.variant_preset in ("all",):
            u = jax.random.uniform(key, (4,))
            keep = u >= jnp.array([probs["O"], probs["TW"], probs["L"], probs["B"]])
        elif self.variant_preset in ("single_feat", "single_feat_otw"):
            n_opts = len(probs) + 1  # + plain CVRP
            logits = jnp.log(jnp.array(list(probs.values()) + [0.5]))
            idx = jax.random.categorical(key, logits)
            keep6 = set_at(jnp.zeros((n_opts,), dtype=bool), idx, True)
            keep = keep6[:4]
            if self.variant_preset == "single_feat_otw":
                keep = keep.at[0].set(keep[0] | keep6[4])
                keep = keep.at[1].set(keep[1] | keep6[4])
        else:
            keep = jnp.array(
                [probs["O"] > 0, probs["TW"] > 0, probs["L"] > 0, probs["B"] > 0]
            )
        keep_o, keep_tw, keep_l, keep_b = keep[0], keep[1], keep[2], keep[3]

        inst = dict(inst)
        inst["open_route"] = jnp.where(keep_o, inst["open_route"], False)
        default_tw = jnp.stack(
            [jnp.zeros_like(inst["time_windows"][:, 0]),
             jnp.full_like(inst["time_windows"][:, 1], INF)],
            axis=-1,
        )
        inst["time_windows"] = jnp.where(keep_tw, inst["time_windows"], default_tw)
        inst["service_time"] = jnp.where(keep_tw, inst["service_time"], 0.0)
        inst["distance_limit"] = jnp.where(keep_l, inst["distance_limit"], INF)
        inst["demand_linehaul"] = jnp.where(
            keep_b, inst["demand_linehaul"],
            inst["demand_linehaul"] + inst["demand_backhaul"],
        )
        inst["demand_backhaul"] = jnp.where(keep_b, inst["demand_backhaul"], 0.0)
        return inst

    # ---- MDP (reference `mtvrp/env.py:92-263`) ----

    def reset(self, instance: Instance) -> MTVRPState:
        n = self.num_loc
        return MTVRPState(
            locs=instance["locs"],
            demand_linehaul=instance["demand_linehaul"],
            demand_backhaul=instance["demand_backhaul"],
            time_windows=instance["time_windows"],
            service_time=instance["service_time"],
            distance_limit=instance["distance_limit"],
            open_route=instance["open_route"],
            speed=instance["speed"],
            current_node=jnp.int32(0),
            current_time=jnp.float32(0.0),
            current_route_length=jnp.float32(0.0),
            used_capacity_linehaul=jnp.float32(0.0),
            used_capacity_backhaul=jnp.float32(0.0),
            visited=jnp.zeros((n + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: MTVRPState, action: jax.Array) -> MTVRPState:
        action = action.astype(jnp.int32)
        not_depot = action != 0
        dist = jnp.linalg.norm(state.locs[action] - state.locs[state.current_node])
        start = state.time_windows[action, 0]
        service = state.service_time[action]
        current_time = not_depot * (
            jnp.maximum(state.current_time + dist / state.speed, start) + service
        )
        current_route_length = not_depot * (state.current_route_length + dist)
        used_line = not_depot * (
            state.used_capacity_linehaul + state.demand_linehaul[action]
        )
        used_back = not_depot * (
            state.used_capacity_backhaul + state.demand_backhaul[action]
        )
        visited = set_at(state.visited, action, True)
        new = state.replace(
            current_node=action,
            current_time=current_time,
            current_route_length=current_route_length,
            used_capacity_linehaul=used_line,
            used_capacity_backhaul=used_back,
            visited=visited,
            i=state.i + 1,
            done=visited.all(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: MTVRPState) -> jax.Array:
        locs = state.locs
        d_ij = jnp.linalg.norm(locs - locs[state.current_node][None, :], axis=-1)
        d_j0 = jnp.linalg.norm(locs - locs[0][None, :], axis=-1)
        early, late = state.time_windows[:, 0], state.time_windows[:, 1]
        arrival = state.current_time + d_ij / state.speed
        can_reach_customer = arrival < late
        can_reach_depot = (
            (jnp.maximum(arrival, early) + state.service_time + d_j0 / state.speed)
            * (~state.open_route)
        ) < late[0]
        exceeds_dist = (
            state.current_route_length + d_ij + d_j0 * (~state.open_route)
            > state.distance_limit
        )
        linehauls_missing = (state.demand_linehaul * ~state.visited).sum() > 0
        is_carrying_backhaul = state.demand_backhaul[state.current_node] > 0
        exceeds_cap_line = state.demand_linehaul + state.used_capacity_linehaul > 1.0
        exceeds_cap_back = state.demand_backhaul + state.used_capacity_backhaul > 1.0
        meets_demand = (
            linehauls_missing
            & ~exceeds_cap_line
            & ~is_carrying_backhaul
            & (state.demand_linehaul > 0)
        ) | (~exceeds_cap_back & (state.demand_backhaul > 0))
        can_visit = (
            can_reach_customer
            & can_reach_depot
            & meets_demand
            & ~exceeds_dist
            & ~state.visited
        )
        depot_ok = ~((state.current_node == 0) & (can_visit[1:].sum() > 0))
        can_visit = can_visit.at[0].set(depot_ok)
        pad = jnp.zeros_like(can_visit).at[0].set(True)
        return jnp.where(state.done, pad, can_visit)

    def reward(self, state: MTVRPState, actions: jax.Array) -> jax.Array:
        # negative tour length; open routes skip the return arcs to depot
        # (reference `mtvrp/env.py:264-278`)
        go_from = jnp.concatenate([jnp.zeros((1,), jnp.int32), actions])
        go_to = jnp.roll(go_from, -1)
        dists = jnp.linalg.norm(state.locs[go_to] - state.locs[go_from], axis=-1)
        skip = (go_to == 0) & state.open_route
        return -(dists * ~skip).sum()

    @property
    def num_actions(self) -> int:
        return self.num_loc + 1

    @property
    def max_steps(self) -> int:
        return 2 * self.num_loc

    def get_num_starts(self) -> int:
        return self.num_loc

    def select_start_nodes(self, instance: Instance, num_starts: int) -> jax.Array:
        return jnp.arange(1, num_starts + 1, dtype=jnp.int32)

    def solve(self, instances: Instance, max_runtime: float = 10.0, **kwargs):
        """Classical baseline (reference `mtvrp/baselines/solve.py:29-83`);
        default in-tree multistart nearest-feasible-neighbor, optional
        pyvrp/lkh/ortools via ``solver=``."""
        from rl4co_tpu.envs.routing.mtvrp_baselines import solve

        return solve(instances, max_runtime, env=self, **kwargs)

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # Replay-based checks (reference `mtvrp/env.py:280-380`)
        actions = np.asarray(actions)
        n = self.num_loc
        s = np.sort(actions)
        assert (s[-n:] == np.arange(1, n + 1)).all() and (s[:-n] == 0).all(), "Invalid tour"
        locs = np.asarray(instance["locs"])
        tw = np.asarray(instance["time_windows"])
        st = np.asarray(instance["service_time"])
        open_route = bool(instance["open_route"])
        dlim = float(instance["distance_limit"])
        line = np.asarray(instance["demand_linehaul"])
        back = np.asarray(instance["demand_backhaul"])
        speed = float(instance["speed"])
        t, length, cur = 0.0, 0.0, 0
        used_l = used_b = 0.0
        for a in actions:
            d = np.linalg.norm(locs[a] - locs[cur])
            if open_route and a == 0:
                # open route: the return arc to the depot is neither driven
                # nor timed (reference `mtvrp/env.py:317-318`)
                d = 0.0
            length += d
            assert length <= dlim + 1e-4, "Route exceeds distance limit"
            t = max(t + d / speed, tw[a, 0])
            assert t <= tw[a, 1] + 1e-4, "Time window violated"
            t += st[a]
            if a == 0:
                t, length, used_l, used_b = 0.0, 0.0, 0.0, 0.0
            else:
                used_l += line[a]
                used_b += back[a]
                assert used_l <= 1.0 + 1e-5 and used_b <= 1.0 + 1e-5, "Capacity exceeded"
            cur = a
