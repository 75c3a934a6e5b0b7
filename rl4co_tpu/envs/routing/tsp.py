"""Travelling Salesman Problem environment.

TPU-native re-design of `rl4co/envs/routing/tsp/env.py:22-193` (`TSPEnv`) and
`rl4co/envs/routing/tsp/generator.py` (`TSPGenerator`): a pure per-instance
MDP over a `flax.struct` state. Episode length is exactly ``num_loc`` steps,
so the decode scan has a tight static trip count.

Action space: next city index in ``[0, num_loc)``; mask = unvisited cities
(reference `tsp/env.py:60-86`); reward = negative closed-tour length
(reference `tsp/env.py:150-156`).
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
class TSPState:
    locs: jax.Array          # [N, 2]
    first_node: jax.Array    # i32 scalar
    current_node: jax.Array  # i32 scalar
    visited: jax.Array       # bool [N]
    i: jax.Array             # i32 scalar, steps taken
    done: jax.Array          # bool scalar


@dataclasses.dataclass(frozen=True)
class TSP(Env):
    name = "tsp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    loc_distribution: str = "uniform"  # see rl4co_tpu/envs/distributions.py

    def generate(self, key: jax.Array) -> Instance:
        if self.loc_distribution == "uniform":
            locs = jax.random.uniform(
                key, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
            )
        else:
            from rl4co_tpu.envs.distributions import get_sampler

            locs = get_sampler(self.loc_distribution).sample(key, (self.num_loc, 2))
        return {"locs": locs}

    def reset(self, instance: Instance) -> TSPState:
        n = self.num_loc
        return TSPState(
            locs=instance["locs"],
            first_node=jnp.int32(0),
            current_node=jnp.int32(0),
            visited=jnp.zeros((n,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: TSPState, action: jax.Array) -> TSPState:
        action = action.astype(jnp.int32)
        first_node = jnp.where(state.i == 0, action, state.first_node)
        visited = set_at(state.visited, action, True)
        done = visited.all()
        # Absorbing after done: keep state frozen so extra padded scan steps
        # are no-ops (never triggered for TSP with trip count == num_loc).
        return jax.tree_util.tree_map(
            lambda new, old: jnp.where(state.done, old, new),
            TSPState(
                locs=state.locs,
                first_node=first_node,
                current_node=action,
                visited=visited,
                i=state.i + 1,
                done=done,
            ),
            state,
        )

    def action_mask(self, state: TSPState) -> jax.Array:
        # After done, allow only current node (absorbing padding action).
        mask = ~state.visited
        pad = set_at(jnp.zeros_like(mask), state.current_node, True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: TSPState, actions: jax.Array) -> jax.Array:
        ordered = state.locs[actions[: self.num_loc]]
        return -get_tour_length(ordered)

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        return self.num_loc

    def get_num_starts(self) -> int:
        return self.num_loc

    def select_start_nodes(self, instance: Instance, num_starts: int) -> jax.Array:
        # POMO: every city is a start (reference `rl4co/utils/ops.py:128-146`).
        return jnp.arange(num_starts, dtype=jnp.int32)

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[..., : self.num_loc]
        sorted_pi = np.sort(actions, axis=-1)
        expected = np.arange(self.num_loc)
        assert (sorted_pi == expected).all(), "Invalid TSP tour (not a permutation)"


@dataclasses.dataclass(frozen=True)
class DenseRewardTSP(TSP):
    """TSP with stepwise (dense) rewards (reference `tsp/env.py:533-585`
    `DenseRewardTSPEnv`, used with stepwise PPO): each step's reward is the
    negative length of the newly added arc; the final step also pays the
    closing arc back to the first node."""

    def step_with_reward(self, state: TSPState, action: jax.Array):
        action = action.astype(jnp.int32)
        prev = state.locs[state.current_node]
        cur = state.locs[action]
        arc = jnp.linalg.norm(cur - prev)
        arc = jnp.where(state.i == 0, 0.0, arc)  # first choice adds no arc
        next_state = self.step(state, action)
        closing = jnp.where(
            next_state.done & ~state.done,
            jnp.linalg.norm(cur - state.locs[next_state.first_node]),
            0.0,
        )
        reward = jnp.where(state.done, 0.0, -(arc + closing))
        return next_state, reward

    def step_with_reward_batch(self, state, action):
        return jax.vmap(self.step_with_reward)(state, action)
