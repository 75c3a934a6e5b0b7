"""Asymmetric TSP environment.

TPU-native re-design of `rl4co/envs/routing/atsp/env.py:16-164` (`ATSPEnv`)
and `atsp/generator.py` (TMAT-class matrices satisfying the triangle
inequality via a min-plus closure pass, inspired by MatNet).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import set_at


@struct.dataclass
class ATSPState:
    cost_matrix: jax.Array   # [N, N]
    first_node: jax.Array
    current_node: jax.Array
    visited: jax.Array       # bool [N]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class ATSP(Env):
    name = "atsp"
    num_loc: int = 10
    min_dist: float = 0.0
    max_dist: float = 1.0
    tmat_class: bool = True

    def generate(self, key: jax.Array) -> Instance:
        n = self.num_loc
        dm = jax.random.uniform(key, (n, n)) * (self.max_dist - self.min_dist) + self.min_dist
        dm = dm * (1.0 - jnp.eye(n))
        if self.tmat_class:
            # min-plus closure (Floyd–Warshall): enforces triangle inequality
            # (reference `atsp/generator.py:62-66`)
            def body(i, m):
                return jnp.minimum(m, m[:, i][:, None] + m[i, :][None, :])

            dm = jax.lax.fori_loop(0, n, body, dm)
        return {"cost_matrix": dm}

    def reset(self, instance: Instance) -> ATSPState:
        return ATSPState(
            cost_matrix=instance["cost_matrix"],
            first_node=jnp.int32(0),
            current_node=jnp.int32(0),
            visited=jnp.zeros((self.num_loc,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: ATSPState, action: jax.Array) -> ATSPState:
        action = action.astype(jnp.int32)
        first_node = jnp.where(state.i == 0, action, state.first_node)
        visited = set_at(state.visited, action, True)
        new = state.replace(
            first_node=first_node,
            current_node=action,
            visited=visited,
            i=state.i + 1,
            done=visited.all(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: ATSPState) -> jax.Array:
        mask = ~state.visited
        pad = set_at(jnp.zeros_like(mask), state.current_node, True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: ATSPState, actions: jax.Array) -> jax.Array:
        # sum of directed arcs along the tour, incl. return to start
        # (reference `atsp/env.py:118-128`)
        acts = actions[: self.num_loc]
        nxt = jnp.roll(acts, -1)
        return -state.cost_matrix[acts, nxt].sum()

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        return self.num_loc

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.num_loc]
        assert (np.sort(actions) == np.arange(self.num_loc)).all(), "Invalid tour"
