"""Multiple TSP environment.

TPU-native re-design of `rl4co/envs/routing/mtsp/env.py:14-238` (`MTSPEnv`):
``num_agents`` salesmen each tour from/to the depot (node 0); cost is either
the max subtour length (``minmax``, default) or the total length (``sum``).
A depot visit hands over to the next agent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import get_tour_length, set_at


@struct.dataclass
class MTSPState:
    locs: jax.Array                # [N, 2] depot at 0
    num_agents: jax.Array          # i32
    agent_idx: jax.Array           # i32
    current_length: jax.Array     # f32
    max_subtour_length: jax.Array  # f32
    first_node: jax.Array
    current_node: jax.Array
    available: jax.Array           # bool [N]; True = selectable next
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class MTSP(Env):
    name = "mtsp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    min_num_agents: int = 5
    max_num_agents: int = 5
    cost_type: str = "minmax"  # minmax | sum

    def generate(self, key: jax.Array) -> Instance:
        kloc, kag = jax.random.split(key)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        num_agents = jax.random.randint(
            kag, (), self.min_num_agents, self.max_num_agents + 1
        )
        return {"locs": locs, "num_agents": num_agents}

    def reset(self, instance: Instance) -> MTSPState:
        available = jnp.ones((self.num_loc,), dtype=bool).at[0].set(False)
        return MTSPState(
            locs=instance["locs"],
            num_agents=instance["num_agents"].astype(jnp.int32),
            agent_idx=jnp.int32(0),
            current_length=jnp.float32(0.0),
            max_subtour_length=jnp.float32(0.0),
            first_node=jnp.int32(0),
            current_node=jnp.int32(0),
            available=available,
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: MTSPState, action: jax.Array) -> MTSPState:
        action = action.astype(jnp.int32)
        first_node = jnp.where(state.i == 0, action, state.first_node)
        cur_loc = state.locs[action]
        prev_loc = state.locs[state.current_node]
        depot_loc = state.locs[0]
        cur_agent_idx = state.agent_idx + (action == 0).astype(jnp.int32)
        available = set_at(state.available, action, False)
        done = (~available[1:]).all()
        current_length = state.current_length + jnp.linalg.norm(cur_loc - prev_loc)
        current_length = jnp.where(
            done, current_length + jnp.linalg.norm(cur_loc - depot_loc), current_length
        )
        max_subtour_length = jnp.maximum(state.max_subtour_length, current_length)
        current_length = current_length * (cur_agent_idx == state.agent_idx)
        new = state.replace(
            first_node=first_node,
            current_node=action,
            agent_idx=cur_agent_idx,
            available=available,
            current_length=current_length,
            max_subtour_length=max_subtour_length,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: MTSPState) -> jax.Array:
        mask = state.available
        # depot available only when not at depot and agents remain
        depot_ok = (state.current_node != 0) & (state.agent_idx < state.num_agents - 1)
        mask = mask.at[0].set(depot_ok)
        pad = jnp.zeros_like(mask).at[0].set(True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: MTSPState, actions: jax.Array) -> jax.Array:
        if self.cost_type == "minmax":
            return -state.max_subtour_length
        if self.cost_type == "sum":
            ordered = state.locs[actions]
            return -get_tour_length(ordered)
        raise ValueError(f"Cost type {self.cost_type} not supported")

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        # N-1 customers + up to max_num_agents-1 handover depot visits + pad
        return self.num_loc + self.max_num_agents

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)
        customers = actions[actions > 0]
        assert (np.sort(customers) == np.arange(1, self.num_loc)).all(), (
            "Each customer must be visited exactly once"
        )


@struct.dataclass
class SHPPState:
    locs: jax.Array
    first_node: jax.Array
    last_node: jax.Array
    current_node: jax.Array
    available: jax.Array
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class SHPP(Env):
    """Shortest Hamiltonian Path Problem (fixed endpoints; GLOP subproblem).

    Reference `rl4co/envs/routing/shpp/env.py:16-177`: start node is 0, end
    node is N-1; mask forces starting at 0 and saves N-1 for last.
    """

    name = "shpp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0

    def generate(self, key: jax.Array) -> Instance:
        locs = jax.random.uniform(
            key, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        return {"locs": locs}

    def reset(self, instance: Instance) -> SHPPState:
        return SHPPState(
            locs=instance["locs"],
            first_node=jnp.int32(0),
            last_node=jnp.int32(self.num_loc - 1),
            current_node=jnp.int32(0),
            available=jnp.ones((self.num_loc,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: SHPPState, action: jax.Array) -> SHPPState:
        action = action.astype(jnp.int32)
        available = set_at(state.available, action, False)
        new = state.replace(
            current_node=action,
            available=available,
            i=state.i + 1,
            done=~available.any(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: SHPPState) -> jax.Array:
        # first step: only node 0; last node N-1 reserved until it is the
        # only one left (reference `shpp/env.py:62-93`)
        mask = state.available
        others_left = mask[:-1].any()
        mask = mask.at[-1].set(state.available[-1] & ~others_left)
        first_only = jnp.zeros_like(mask).at[0].set(True)
        mask = jnp.where(state.i == 0, first_only, mask)
        pad = set_at(jnp.zeros_like(mask), state.current_node, True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: SHPPState, actions: jax.Array) -> jax.Array:
        # closed-tour length (the closing arc is the virtual connection in
        # GLOP's partitioned tour; reference `shpp/env.py:126-130`)
        ordered = state.locs[actions[: self.num_loc]]
        return -get_tour_length(ordered)

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        return self.num_loc

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.num_loc]
        assert (np.sort(actions) == np.arange(self.num_loc)).all(), "Invalid tour"
        assert actions[0] == 0 and actions[-1] == self.num_loc - 1, (
            "SHPP must start at node 0 and end at node N-1"
        )
