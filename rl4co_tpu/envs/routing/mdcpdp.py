"""MDCPDP — Multi-Depot Capacitated Pickup-and-Delivery environment.

TPU-native re-design of `rl4co/envs/routing/mdcpdp/env.py:13-430`
(`MDCPDPEnv`, the single-agent serialization of PARCO's multi-agent env):
``num_agents`` depots, ``num_loc/2`` pickup-delivery pairs; selecting a
depot hands the tour to that agent; carry capacity limits simultaneous
pickups. Reward modes: minsum / minmax / lateness(_square); problem modes
open (no return-arc cost) / close.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import add_at, set_at


@struct.dataclass
class MDCPDPState:
    locs: jax.Array             # [A + N, 2] (depots first)
    capacity: jax.Array         # [A] carry capacities
    lateness_weight: jax.Array  # f32
    current_node: jax.Array
    current_depot: jax.Array    # i32
    current_carry: jax.Array    # i32
    current_length: jax.Array   # [A]
    arrivetime: jax.Array       # [A + N]
    available: jax.Array        # bool [A + N]
    to_deliver: jax.Array       # bool [A + N]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class MDCPDP(Env):
    name = "mdcpdp"
    num_loc: int = 20          # even: pairs
    num_agents: int = 3
    min_capacity: int = 3
    max_capacity: int = 3
    min_lateness_weight: float = 1.0
    max_lateness_weight: float = 1.0
    depot_mode: str = "multi"  # single | multi
    dist_mode: str = "L2"
    reward_mode: str = "lateness"   # lateness | lateness_square | minmax | minsum
    problem_mode: str = "open"      # open | close

    @property
    def total_nodes(self) -> int:
        return self.num_agents + self.num_loc

    def _dist(self, a, b):
        if self.dist_mode == "L1":
            return jnp.abs(a - b).sum(-1)
        return jnp.linalg.norm(a - b, axis=-1)

    def generate(self, key: jax.Array) -> Instance:
        kl, kd, kc, kw = jax.random.split(key, 4)
        locs = jax.random.uniform(kl, (self.num_loc, 2))
        if self.depot_mode == "single":
            depot = jnp.tile(jax.random.uniform(kd, (1, 2)), (self.num_agents, 1))
        else:
            depot = jax.random.uniform(kd, (self.num_agents, 2))
        capacity = jax.random.randint(
            kc, (self.num_agents,), self.min_capacity, self.max_capacity + 1
        )
        lateness_weight = jax.random.uniform(
            kw, (), minval=self.min_lateness_weight, maxval=self.max_lateness_weight
        )
        return {
            "locs": locs, "depots": depot, "capacity": capacity,
            "lateness_weight": lateness_weight,
        }

    def reset(self, instance: Instance) -> MDCPDPState:
        a, n = self.num_agents, self.num_loc
        locs = jnp.concatenate([instance["depots"], instance["locs"]], axis=0)
        to_deliver = jnp.concatenate(
            [jnp.ones((n // 2 + a,), bool), jnp.zeros((n // 2,), bool)]
        )
        return MDCPDPState(
            locs=locs,
            capacity=instance["capacity"].astype(jnp.int32),
            lateness_weight=instance["lateness_weight"],
            current_node=jnp.int32(0),
            current_depot=jnp.int32(0),
            current_carry=jnp.int32(0),
            current_length=jnp.zeros((a,)),
            arrivetime=jnp.zeros((a + n,)),
            available=jnp.ones((a + n,), bool),
            to_deliver=to_deliver,
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: MDCPDPState, action: jax.Array) -> MDCPDPState:
        a, n = self.num_agents, self.num_loc
        pd_split = n // 2 + a
        cur = action.astype(jnp.int32)
        new_to_deliver_idx = (cur + n // 2) % (n + a)
        back_flag = (cur < a) & (cur == state.current_depot) & (state.i > 0)
        available = jnp.where(
            state.i > 0, set_at(state.available, cur, False), state.available
        )
        to_deliver = set_at(state.to_deliver, new_to_deliver_idx, True)
        carry = (
            state.current_carry
            + ((cur < pd_split) & (cur >= a)).astype(jnp.int32)
            - (cur >= pd_split).astype(jnp.int32)
        )
        current_depot = jnp.where(cur < a, cur, state.current_depot)
        prev_loc = state.locs[state.current_node]
        cur_loc = state.locs[cur]
        step_len = self._dist(prev_loc, cur_loc)
        step_len = jnp.where((cur < a) & (state.current_node < a), 0.0, step_len)
        if self.problem_mode == "open":
            step_len = jnp.where(
                (cur < a) & (state.current_node >= a), 0.0, step_len
            )
        current_length = add_at(state.current_length, current_depot, step_len)
        arrivetime = set_at(state.arrivetime, cur, current_length[current_depot])
        done = available[a:].sum() == 0
        new = state.replace(
            current_node=cur,
            current_depot=current_depot,
            current_carry=carry,
            current_length=current_length,
            arrivetime=arrivetime,
            available=available,
            to_deliver=to_deliver,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: MDCPDPState) -> jax.Array:
        # Faithful to `mdcpdp/env.py:140-210`: ``back_flag`` (just returned
        # to the own depot) switches the mask from touring (customers + own
        # depot) to handover (unvisited depots only).
        a, n = self.num_agents, self.num_loc
        pd_split = n // 2 + a
        first_mask = jnp.zeros((a + n,), bool).at[: a].set(True)
        cur = state.current_node
        # state.i - 1 = reference's pre-increment step counter at mask time
        back_flag = (cur < a) & (cur == state.current_depot) & (state.i > 1)
        # if no depots remain for handover, the last agent keeps touring
        # (guards the reference's dead-end when it returns home early)
        back_flag = back_flag & (state.available[:a].sum() > 0)
        mask = state.available & state.to_deliver
        over_capacity = state.current_carry >= state.capacity[state.current_depot]
        idx = jnp.arange(a + n)
        is_pickup = (idx >= a) & (idx < pd_split)
        mask = mask & ~(is_pickup & over_capacity)
        mask = jnp.where((idx >= a) & back_flag, False, mask)
        # depots: on handover (back_flag) unvisited depots; while touring only
        # the own depot — and never while carrying, after the last handover,
        # or right after arriving at a new depot (`mdcpdp/env.py:183-197`)
        depot_mask = mask & back_flag
        depot_mask = set_at(depot_mask, state.current_depot, ~back_flag)
        last_depot = state.available[:a].sum() == 0
        carry_flag = state.current_carry > 0
        prev_depot = (cur < a) & (state.i > 1) & ~back_flag
        depot_mask = depot_mask & ~last_depot & ~carry_flag & ~prev_depot
        mask = jnp.where(idx < a, depot_mask, mask)
        mask = jnp.where(state.i == 0, first_mask, mask)
        pad = set_at(jnp.zeros_like(mask), state.current_depot, True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: MDCPDPState, actions: jax.Array) -> jax.Array:
        # reference `mdcpdp/env.py:366-401`
        a, n = self.num_agents, self.num_loc
        if self.reward_mode == "minmax":
            cost = state.current_length.max()
        elif self.reward_mode == "minsum":
            cost = state.current_length.sum()
        else:
            cost = state.current_length.sum()
            lateness = state.arrivetime[a + n // 2 :]
            if self.reward_mode == "lateness_square":
                lateness = lateness**2
            w = state.lateness_weight
            cost = cost * (1 - w) + lateness.sum() * w
        return -cost

    @property
    def num_actions(self) -> int:
        return self.total_nodes

    @property
    def max_steps(self) -> int:
        # 1 depot choice + N customer visits + up to N/2 depot returns + pad
        return 1 + self.num_loc + self.num_loc // 2 + self.num_agents

    def check_solution_validity(self, instance: Instance, actions) -> None:
        a, n = self.num_agents, self.num_loc
        actions = np.asarray(actions)
        customers = actions[actions >= a]
        assert sorted(customers.tolist()) == list(range(a, a + n)), (
            "Each customer must be visited exactly once"
        )
        pos = {int(node): t for t, node in enumerate(actions)}
        for p in range(a, a + n // 2):
            assert pos[p] < pos[p + n // 2], "Delivery before pickup"
