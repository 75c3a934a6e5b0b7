"""Maximum Coverage Problem environment.

TPU-native re-design of `rl4co/envs/graph/mcp/env.py:13-184` (`MCPEnv`):
choose ``n_sets_to_choose`` sets maximizing the total weight of covered
items. ``membership [n_sets, max_size]`` holds 1-based item ids (0 = pad),
as in the reference generator (`mcp/generator.py:97-130`). The covered-item
indicator is maintained in the state as a length ``num_items + 1`` scatter
target (slot 0 absorbs the padding).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import mark_where_in, set_at


@struct.dataclass
class MCPState:
    membership: jax.Array  # [n_sets, max_size] 1-based item ids, 0 pad
    weights: jax.Array     # [n_items]
    covered: jax.Array     # bool [n_items + 1]; slot 0 = padding sink
    chosen: jax.Array      # bool [n_sets]
    n_to_choose: jax.Array # i32
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        return jnp.zeros_like(self.i)


@dataclasses.dataclass(frozen=True)
class MCP(Env):
    name = "mcp"
    num_items: int = 200
    num_sets: int = 100
    min_weight: int = 1
    max_weight: int = 10
    min_size: int = 5
    max_size: int = 15
    n_sets_to_choose: int = 10

    def generate(self, key: jax.Array) -> Instance:
        kw, ks, km = jax.random.split(key, 3)
        weights = jnp.floor(
            jax.random.uniform(
                kw, (self.num_items,), minval=self.min_weight, maxval=self.max_weight
            )
        )
        weights = jnp.clip(weights, self.min_weight, self.max_weight)
        sizes = jax.random.randint(ks, (self.num_sets,), self.min_size, self.max_size + 1)
        membership = jax.random.randint(
            km, (self.num_sets, self.max_size), 1, self.num_items + 1
        )
        valid = jnp.arange(self.max_size)[None, :] < sizes[:, None]
        membership = jnp.where(valid, membership, 0)
        return {"membership": membership.astype(jnp.int32), "weights": weights}

    def reset(self, instance: Instance) -> MCPState:
        return MCPState(
            membership=instance["membership"],
            weights=instance["weights"],
            covered=jnp.zeros((self.num_items + 1,), dtype=bool),
            chosen=jnp.zeros((self.num_sets,), dtype=bool),
            n_to_choose=jnp.int32(self.n_sets_to_choose),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: MCPState, action: jax.Array) -> MCPState:
        action = action.astype(jnp.int32)
        chosen = set_at(state.chosen, action, True)
        covered = mark_where_in(state.covered, state.membership[action], True)
        new = state.replace(
            chosen=chosen,
            covered=covered,
            i=state.i + 1,
            done=state.i >= state.n_to_choose - 1,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: MCPState) -> jax.Array:
        mask = ~state.chosen
        pad = jnp.zeros_like(mask).at[0].set(True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: MCPState, actions: jax.Array) -> jax.Array:
        return (state.weights * state.covered[1:]).sum()

    @property
    def num_actions(self) -> int:
        return self.num_sets

    @property
    def max_steps(self) -> int:
        return self.n_sets_to_choose

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.n_sets_to_choose]
        assert len(np.unique(actions)) == self.n_sets_to_choose, "Duplicate sets"
