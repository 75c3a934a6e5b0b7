"""Prize-Collecting TSP (+ stochastic variant) environment.

TPU-native re-design of `rl4co/envs/routing/pctsp/env.py:17-264` (`PCTSPEnv`)
and `rl4co/envs/routing/spctsp/env.py:8-29` (`SPCTSPEnv`): collect at least
``prize_required`` total prize, paying a penalty for every unvisited node;
reward = saved penalties − tour length − total penalty
(reference `pctsp/env.py:146-167`).

In the stochastic variant the agent plans with the expected prize while the
realized (stochastic) prize drives the constraint (reference
`pctsp/env.py:98-124`, `_stochastic`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import get_tour_length, set_at

# Kool et al. (2019) penalty scaling (reference `pctsp/generator.py:12,84-100`)
MAX_LENGTHS = {20: 2.0, 50: 3.0, 100: 4.0}


@struct.dataclass
class PCTSPState:
    locs: jax.Array               # [N+1, 2] depot at 0
    expected_prize: jax.Array     # [N]
    real_prize: jax.Array         # [N+1] depot = 0
    penalty: jax.Array            # [N+1] depot = 0
    cur_total_prize: jax.Array    # f32
    cur_total_penalty: jax.Array  # f32
    prize_required: jax.Array     # f32
    current_node: jax.Array       # i32
    visited: jax.Array            # bool [N+1]
    i: jax.Array                  # i32
    done: jax.Array               # bool


@dataclasses.dataclass(frozen=True)
class PCTSP(Env):
    name = "pctsp"
    num_loc: int = 20
    min_loc: float = 0.0
    max_loc: float = 1.0
    penalty_factor: float = 3.0
    prize_required: float = 1.0
    stochastic: bool = False

    @property
    def _max_penalty(self) -> float:
        base = MAX_LENGTHS.get(
            self.num_loc,
            MAX_LENGTHS[min(MAX_LENGTHS, key=lambda k: abs(k - self.num_loc))],
        )
        return base * self.penalty_factor / self.num_loc

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot, kpen, kdet, ksto = jax.random.split(key, 5)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        penalty = jax.random.uniform(kpen, (self.num_loc,), maxval=self._max_penalty)
        det_prize = jax.random.uniform(kdet, (self.num_loc,), maxval=4.0 / self.num_loc)
        sto_prize = jax.random.uniform(ksto, (self.num_loc,), maxval=2.0) * det_prize
        return {
            "locs": locs,
            "depot": depot,
            "penalty": penalty,
            "deterministic_prize": det_prize,
            "stochastic_prize": sto_prize,
        }

    def reset(self, instance: Instance) -> PCTSPState:
        locs = jnp.concatenate([instance["depot"][None, :], instance["locs"]], axis=0)
        real = (
            instance["stochastic_prize"] if self.stochastic else instance["deterministic_prize"]
        )
        real_prize = jnp.concatenate([jnp.zeros((1,)), real])
        penalty = jnp.concatenate([jnp.zeros((1,)), instance["penalty"]])
        return PCTSPState(
            locs=locs,
            expected_prize=instance["deterministic_prize"],
            real_prize=real_prize,
            penalty=penalty,
            cur_total_prize=jnp.float32(0.0),
            cur_total_penalty=instance["penalty"].sum(),
            prize_required=jnp.float32(self.prize_required),
            current_node=jnp.int32(0),
            visited=jnp.zeros((self.num_loc + 1,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: PCTSPState, action: jax.Array) -> PCTSPState:
        action = action.astype(jnp.int32)
        cur_total_prize = state.cur_total_prize + state.real_prize[action]
        cur_total_penalty = state.cur_total_penalty + state.penalty[action]
        visited = set_at(state.visited, action, True)
        done = (state.i > 0) & (action == 0)
        new = state.replace(
            cur_total_prize=cur_total_prize,
            cur_total_penalty=cur_total_penalty,
            visited=visited,
            current_node=action,
            i=state.i + 1,
            done=done,
        )
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(state.done, o, n), new, state
        )

    def action_mask(self, state: PCTSPState) -> jax.Array:
        infeasible = state.visited | state.visited[0]
        unvisited_left = (~state.visited[1:]).sum() > 0
        depot_infeasible = (state.cur_total_prize < self.prize_required) & unvisited_left
        infeasible = infeasible.at[0].set(depot_infeasible)
        feasible = ~infeasible
        pad = jnp.zeros_like(feasible).at[0].set(True)
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: PCTSPState, actions: jax.Array) -> jax.Array:
        ordered = jnp.concatenate([state.locs[0:1], state.locs[actions]], axis=0)
        length = get_tour_length(ordered)
        saved_penalty = state.penalty[actions].sum()
        return saved_penalty - (length + state.penalty[1:].sum())

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
        # Reference `pctsp/env.py:169-192`.
        actions = np.asarray(actions)
        s = np.sort(actions)
        assert ((s[1:] == 0) | (s[1:] > s[:-1])).all(), "Duplicates"
        real = (
            instance["stochastic_prize"] if self.stochastic else instance["deterministic_prize"]
        )
        prize_with_depot = np.concatenate([[0.0], np.asarray(real)])
        total = prize_with_depot[actions].sum()
        visited_all = (np.sort(np.unique(actions[actions > 0])).size == self.num_loc)
        assert total >= self.prize_required - 1e-5 or visited_all, (
            f"Total prize {total} below required {self.prize_required}"
        )


@dataclasses.dataclass(frozen=True)
class SPCTSP(PCTSP):
    """Stochastic PCTSP (reference `rl4co/envs/routing/spctsp/env.py:8-29`)."""

    name = "spctsp"
    stochastic: bool = True
