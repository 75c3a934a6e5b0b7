"""Skill-VRP environment.

TPU-native re-design of `rl4co/envs/routing/svrp/env.py:15-232` (`SVRPEnv`):
technicians with ascending skill levels tour in sequence (a depot visit
hands over to the next technician); a customer may only be served by a
technician whose skill covers its requirement; reward = −Σ per-leg distance
× the serving technician's cost (`tech_costs=[1,2,3]`).
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
class SVRPState:
    locs: jax.Array          # [N+1, 2] depot at 0
    techs: jax.Array         # [num_tech] ascending skill levels
    skills: jax.Array        # [N] required skill per customer
    current_node: jax.Array
    current_tech: jax.Array  # i32
    visited: jax.Array       # bool [N+1]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class SVRP(Env):
    name = "svrp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    min_skill: float = 1.0
    max_skill: float = 10.0
    num_tech: int = 3
    tech_costs: tuple = (1.0, 2.0, 3.0)

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot, ktech, kskill = jax.random.split(key, 4)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        techs = jnp.sort(
            jax.random.uniform(
                ktech, (self.num_tech,), minval=self.min_skill, maxval=self.max_skill
            )
        )
        # customer requirement sampled within the available skill range
        # (reference `svrp/generator.py:93-104`)
        skills = jax.random.uniform(kskill, (self.num_loc,)) * techs[-1]
        return {"locs": locs, "depot": depot, "techs": techs, "skills": skills}

    def reset(self, instance: Instance) -> SVRPState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        return SVRPState(
            locs=locs,
            techs=instance["techs"],
            skills=instance["skills"],
            current_node=jnp.int32(0),
            current_tech=jnp.int32(0),
            visited=jnp.zeros((self.num_loc + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: SVRPState, action: jax.Array) -> SVRPState:
        action = action.astype(jnp.int32)
        current_tech = state.current_tech + (action == 0)
        visited = set_at(state.visited, action, True)
        new = state.replace(
            current_node=action,
            current_tech=jnp.clip(current_tech, 0, self.num_tech - 1 + 1),
            visited=visited,
            i=state.i + 1,
            done=visited.all(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: SVRPState) -> jax.Array:
        tech_idx = jnp.clip(state.current_tech, 0, self.num_tech - 1)
        cur_skill = state.techs[tech_idx]
        can_service = state.skills <= cur_skill
        mask_loc = state.visited[1:] | ~can_service
        unserved = (~mask_loc).sum() > 0
        mask_depot = (
            (state.current_node == 0) | (state.current_tech >= self.num_tech - 1)
        ) & unserved
        feasible = jnp.concatenate([jnp.logical_not(mask_depot)[None], ~mask_loc])
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: SVRPState, actions: jax.Array) -> jax.Array:
        # per-leg cost weighted by the serving technician's cost rate
        # (reference `svrp/env.py:165-195`)
        tech_costs = jnp.asarray(self.tech_costs)
        go_from = jnp.concatenate([jnp.zeros((1,), jnp.int32), actions])
        go_to = jnp.roll(go_from, -1)
        dists = jnp.linalg.norm(state.locs[go_to] - state.locs[go_from], axis=-1)
        # technician index per leg: increments after each return to depot
        tech_idx = jnp.clip(
            jnp.cumsum(go_from == 0) - 1, 0, self.num_tech - 1
        )
        return -(dists * tech_costs[tech_idx]).sum()

    @property
    def num_actions(self) -> int:
        return self.num_loc + 1

    @property
    def max_steps(self) -> int:
        return self.num_loc + self.num_tech + 1

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)
        n = self.num_loc
        s = np.sort(actions)
        assert (s[-n:] == np.arange(1, n + 1)).all() and (s[:-n] == 0).all(), "Invalid tour"
        techs = np.asarray(instance["techs"])
        skills = np.asarray(instance["skills"])
        tech = 0
        for a in actions:
            if a == 0:
                tech = min(tech + 1, self.num_tech - 1)
            else:
                assert skills[a - 1] <= techs[min(tech, self.num_tech - 1)] + 1e-6, (
                    "Technician lacks required skill"
                )
