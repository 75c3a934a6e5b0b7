"""Orienteering Problem environment.

TPU-native re-design of `rl4co/envs/routing/op/env.py:17-242` (`OPEnv`) and
`op/generator.py` (Fischetti/Kool prize types, length budgets
`data/generate_data.py:104`: {20: 2.0, 50: 3.0, 100: 4.0}).

Maximize collected prize subject to a tour-length budget; the episode ends
when the agent returns to the depot (always feasible). ``max_length`` is
stored per-node, pre-adjusted by the return distance to the depot
(reference `op/env.py:119-123`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import set_at

MAX_LENGTHS = {20: 2.0, 50: 3.0, 100: 4.0}


def default_max_length(num_loc: int) -> float:
    if num_loc in MAX_LENGTHS:
        return MAX_LENGTHS[num_loc]
    closest = min(MAX_LENGTHS, key=lambda k: abs(k - num_loc))
    return MAX_LENGTHS[closest]


@struct.dataclass
class OPState:
    locs: jax.Array          # [N+1, 2] depot at 0
    prize: jax.Array         # [N+1] depot prize = 0
    max_length: jax.Array    # [N+1] budget on arrival per node (depot-adjusted)
    tour_length: jax.Array   # f32 scalar
    current_node: jax.Array  # i32
    visited: jax.Array       # bool [N+1]
    i: jax.Array             # i32
    done: jax.Array          # bool


@dataclasses.dataclass(frozen=True)
class OP(Env):
    name = "op"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    prize_type: str = "dist"  # const | unif | dist (reference `op/env.py:52-64`)
    max_length: float | None = None

    @property
    def _max_length(self) -> float:
        return self.max_length if self.max_length is not None else default_max_length(self.num_loc)

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot, kprize = jax.random.split(key, 3)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        if self.prize_type == "const":
            prize = jnp.ones((self.num_loc,))
        elif self.prize_type == "unif":
            prize = (1.0 + jax.random.randint(kprize, (self.num_loc,), 0, 100)) / 100.0
        elif self.prize_type == "dist":
            d = jnp.linalg.norm(locs - depot[None, :], axis=-1)
            prize = (1.0 + jnp.floor(d / d.max() * 99.0)) / 100.0
        else:
            raise ValueError(f"Invalid prize_type: {self.prize_type}")
        return {
            "locs": locs,
            "depot": depot,
            "prize": prize,
            "max_length": jnp.float32(self._max_length),
        }

    def reset(self, instance: Instance) -> OPState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        prize = jnp.concatenate([jnp.zeros((1,)), instance["prize"]])
        max_length = (
            instance["max_length"]
            - jnp.linalg.norm(instance["depot"][None, :] - locs, axis=-1)
            - 1e-6
        )
        return OPState(
            locs=locs,
            prize=prize,
            max_length=max_length,
            tour_length=jnp.float32(0.0),
            current_node=jnp.int32(0),
            visited=jnp.zeros((self.num_loc + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: OPState, action: jax.Array) -> OPState:
        action = action.astype(jnp.int32)
        prev = state.locs[state.current_node]
        cur = state.locs[action]
        tour_length = state.tour_length + jnp.linalg.norm(cur - prev)
        visited = set_at(state.visited, action, True)
        done = (action == 0) & (state.i > 0)
        new = OPState(
            locs=state.locs,
            prize=state.prize,
            max_length=state.max_length,
            tour_length=tour_length,
            current_node=action,
            visited=visited,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(state.done, o, n), new, state
        )

    def action_mask(self, state: OPState) -> jax.Array:
        cur = state.locs[state.current_node]
        exceeds = (
            state.tour_length + jnp.linalg.norm(state.locs - cur[None, :], axis=-1)
            > state.max_length
        )
        infeasible = state.visited | state.visited[0] | exceeds
        feasible = ~infeasible
        feasible = feasible.at[0].set(True)  # depot always allowed
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: OPState, actions: jax.Array) -> jax.Array:
        return state.prize[actions].sum()

    @property
    def num_actions(self) -> int:
        return self.num_loc + 1

    @property
    def max_steps(self) -> int:
        return self.num_loc + 2

    def get_num_starts(self) -> int:
        return self.num_loc

    def select_start_nodes(self, instance: Instance, num_starts: int) -> jax.Array:
        return jnp.arange(1, num_starts + 1, dtype=jnp.int32)

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # Reference `op/env.py:168-195`.
        actions = np.asarray(actions)
        s = np.sort(actions)
        assert ((s[1:] == 0) | (s[1:] > s[:-1])).all(), "Duplicates"
        locs = np.concatenate(
            [np.asarray(instance["depot"])[None, :], np.asarray(instance["locs"])]
        )
        # pure numpy: this runs per instance on the host — a jnp call here
        # costs one device round trip per instance (measured 27 inst/s over
        # the axon tunnel vs 643 for pctsp's numpy check, VERDICT r2 §7)
        ordered = locs[actions]
        diffs = ordered - np.roll(ordered, shift=1, axis=0)
        length = float(np.linalg.norm(diffs, axis=-1).sum())
        assert length <= float(instance["max_length"]) + 1e-4, (
            f"Max length exceeded: {length} > {float(instance['max_length'])}"
        )
