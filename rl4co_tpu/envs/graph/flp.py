"""Facility Location Problem environment.

TPU-native re-design of `rl4co/envs/graph/flp/env.py:14-158` (`FLPEnv`):
choose ``to_choose`` facilities among ``num_loc`` points minimizing the sum
of each point's distance to its nearest chosen facility. The running
per-point minimum distance lives in the state (one `minimum` per step
instead of the reference's gather-over-chosen recompute).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import get_distance_matrix, set_at


@struct.dataclass
class FLPState:
    locs: jax.Array            # [N, 2]
    orig_distances: jax.Array  # [N, N]
    distances: jax.Array       # [N] running min distance to chosen set
    chosen: jax.Array          # bool [N]
    to_choose: jax.Array       # i32
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        # for heatmap/NAR compatibility: no meaningful current node
        return jnp.zeros_like(self.i)


@dataclasses.dataclass(frozen=True)
class FLP(Env):
    name = "flp"
    num_loc: int = 100
    min_loc: float = 0.0
    max_loc: float = 1.0
    to_choose: int = 10

    def generate(self, key: jax.Array) -> Instance:
        locs = jax.random.uniform(
            key, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        return {"locs": locs}

    def reset(self, instance: Instance) -> FLPState:
        max_dist = math.sqrt(2.0) * (self.max_loc - self.min_loc)
        return FLPState(
            locs=instance["locs"],
            orig_distances=get_distance_matrix(instance["locs"]),
            distances=jnp.full((self.num_loc,), max_dist),
            chosen=jnp.zeros((self.num_loc,), dtype=bool),
            to_choose=jnp.int32(self.to_choose),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: FLPState, action: jax.Array) -> FLPState:
        action = action.astype(jnp.int32)
        chosen = set_at(state.chosen, action, True)
        distances = jnp.minimum(state.distances, state.orig_distances[action])
        new = state.replace(
            chosen=chosen,
            distances=distances,
            i=state.i + 1,
            done=state.i >= state.to_choose - 1,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: FLPState) -> jax.Array:
        mask = ~state.chosen
        pad = jnp.zeros_like(mask).at[0].set(True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: FLPState, actions: jax.Array) -> jax.Array:
        return -state.distances.sum()

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        return self.to_choose

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.to_choose]
        assert len(np.unique(actions)) == self.to_choose, "Duplicate facilities"
