"""Pickup and Delivery Problem environment.

TPU-native re-design of `rl4co/envs/routing/pdp/env.py:13-238` (`PDPEnv`):
``num_loc`` is even; node 0 = depot, 1..n/2 = pickups, n/2+1..n = deliveries.
A delivery becomes available once its pickup is visited
(``new_to_deliver = (a + n/2) mod (n+1)``, reference `pdp/env.py:66-77`).
Default (as reference): the agent does not select the depot; the depot is
prepended for the reward (`pdp/env.py:171-180`).
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
class PDPState:
    locs: jax.Array        # [N+1, 2] depot at 0
    available: jax.Array   # bool [N+1]
    to_deliver: jax.Array  # bool [N+1]
    current_node: jax.Array
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class PDP(Env):
    name = "pdp"
    num_loc: int = 20  # must be even: num_loc/2 pickup-delivery pairs
    min_loc: float = 0.0
    max_loc: float = 1.0

    def __post_init__(self):
        assert self.num_loc % 2 == 0, "PDP requires an even num_loc"

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot = jax.random.split(key)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        return {"locs": locs, "depot": depot}

    def reset(self, instance: Instance) -> PDPState:
        n = self.num_loc
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        to_deliver = jnp.concatenate(
            [jnp.ones((n // 2 + 1,), dtype=bool), jnp.zeros((n // 2,), dtype=bool)]
        )
        available = jnp.ones((n + 1,), dtype=bool).at[0].set(False)
        return PDPState(
            locs=locs,
            available=available,
            to_deliver=to_deliver,
            current_node=jnp.int32(0),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: PDPState, action: jax.Array) -> PDPState:
        n = self.num_loc
        action = action.astype(jnp.int32)
        new_to_deliver = (action + n // 2) % (n + 1)
        available = set_at(state.available, action, False)
        to_deliver = set_at(state.to_deliver, new_to_deliver, True)
        new = state.replace(
            current_node=action,
            available=available,
            to_deliver=to_deliver,
            i=state.i + 1,
            done=~available.any(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: PDPState) -> jax.Array:
        mask = state.available & state.to_deliver
        pad = set_at(jnp.zeros_like(mask), state.current_node, True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: PDPState, actions: jax.Array) -> jax.Array:
        ordered = jnp.concatenate(
            [state.locs[0:1], state.locs[actions[: self.num_loc]]], axis=0
        )
        return -get_tour_length(ordered)

    @property
    def num_actions(self) -> int:
        return self.num_loc + 1

    @property
    def max_steps(self) -> int:
        return self.num_loc

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # each pickup precedes its delivery (reference `pdp/env.py:182-193`)
        actions = np.asarray(actions)[: self.num_loc]
        n = self.num_loc
        assert (np.sort(actions) == np.arange(1, n + 1)).all(), "Invalid tour"
        pos = np.empty(n + 1, dtype=int)
        pos[actions] = np.arange(len(actions))
        for p in range(1, n // 2 + 1):
            assert pos[p] < pos[p + n // 2], f"Delivery {p + n // 2} before pickup {p}"
