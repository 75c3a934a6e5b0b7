"""Multi-agent Pickup and Delivery Problem (mPDP, Equity-Transformer).

TPU-native re-design of `rl4co/envs/routing/mpdp/env.py:16-290` (`MPDPEnv`) —
note the reference implements this env but never registers or exports it
(SURVEY.md §2.6b "registry gap"); it also contains unreachable/broken logic
we correct here (documented below).

Layout (reference `_reset`, `mpdp/env.py:133-229`): nodes
``[0..A] = A+1 depot copies`` (same coordinate), then ``n/2`` pickups, then
``n/2`` deliveries. ``agent_idx`` starts at 1; when the current agent selects
depot copy ``agent_idx`` it ends its tour and the next agent spawns
(``count_depot += 1``, `env.py:219-227`). Deliveries unlock when their pickup
is visited (``(a + n/2) mod (n + A + 1)``, `env.py:70-72`). Objective:
``minmax`` (max single-agent tour) or ``minsum`` (reference
`env.py:283-290`).

Deviations from the reference (both are bugs in its dead code):
- Reference `done = visited.all(-1)` can never be True because depot copy 0
  is unselectable (`env.py:232-239` vs mask `env.py:268-276`); here
  ``done`` = all customers visited.
- The reference's step-0 mask marks *all* nodes except copy 0 feasible —
  including still-locked deliveries (`env.py:259-276`); here step 0 allows
  pickups and depot copies 1..A only.
Each agent's return-to-depot leg is counted when it selects its depot copy;
the final agent's return leg is added in ``reward``.
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
class MPDPState:
    locs: jax.Array          # [A+1+N, 2]; rows 0..A are the depot
    visited: jax.Array       # bool [A+1+N]
    to_deliver: jax.Array    # bool [A+1+N]
    lengths: jax.Array       # [A] per-agent tour length
    count_depot: jax.Array   # int, agents completed (agent_idx = count+1)
    current_node: jax.Array
    cur_coord: jax.Array     # [2]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class MPDP(Env):
    name = "mpdp"
    num_loc: int = 20        # customers (even): num_loc/2 pickup-delivery pairs
    num_agents: int = 3
    min_loc: float = 0.0
    max_loc: float = 1.0
    objective: str = "minmax"  # reference `env.py:283-290`

    def __post_init__(self):
        assert self.num_loc % 2 == 0, "mPDP requires an even num_loc"
        assert self.objective in ("minmax", "minsum"), self.objective

    def generate(self, key: jax.Array) -> Instance:
        kloc, kdepot = jax.random.split(key)
        locs = jax.random.uniform(
            kloc, (self.num_loc, 2), minval=self.min_loc, maxval=self.max_loc
        )
        depot = jax.random.uniform(kdepot, (2,), minval=self.min_loc, maxval=self.max_loc)
        return {"locs": locs, "depot": depot}

    def reset(self, instance: Instance) -> MPDPState:
        n, a = self.num_loc, self.num_agents
        depot_rows = jnp.broadcast_to(instance["depot"][None, :], (a + 1, 2))
        locs = jnp.concatenate([depot_rows, instance["locs"]], axis=0)
        to_deliver = jnp.concatenate(
            [jnp.ones((a + 1 + n // 2,), bool), jnp.zeros((n // 2,), bool)]
        )
        return MPDPState(
            locs=locs,
            visited=jnp.zeros((a + 1 + n,), bool),
            to_deliver=to_deliver,
            lengths=jnp.zeros((a,), jnp.float32),
            count_depot=jnp.int32(0),
            current_node=jnp.int32(0),
            cur_coord=instance["depot"].astype(jnp.float32),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: MPDPState, action: jax.Array) -> MPDPState:
        n, a = self.num_loc, self.num_agents
        action = action.astype(jnp.int32)
        agent_idx = state.count_depot + 1

        # unlock the paired delivery (`env.py:70-72`)
        new_to_deliver = (action + n // 2) % (n + a + 1)
        to_deliver = set_at(state.to_deliver, new_to_deliver, True)
        visited = set_at(state.visited, action, True)

        new_coord = state.locs[action]
        leg = jnp.linalg.norm(new_coord - state.cur_coord)
        lengths = add_at(state.lengths, jnp.clip(state.count_depot, 0, a - 1), leg)

        # selecting the current agent's depot copy spawns the next agent
        at_own_depot = (action == agent_idx) & (agent_idx < a)
        count_depot = state.count_depot + jnp.where(at_own_depot, 1, 0)

        customers_done = visited[a + 1 :].all()
        new = state.replace(
            visited=visited,
            to_deliver=to_deliver,
            lengths=lengths,
            count_depot=count_depot,
            current_node=action,
            cur_coord=new_coord,
            i=state.i + 1,
            done=customers_done,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: MPDPState) -> jax.Array:
        n, a = self.num_loc, self.num_agents
        agent_idx = state.count_depot + 1
        feasible = ~state.visited & state.to_deliver
        # depot copies infeasible by default (`get_action_mask`,
        # `env.py:240-252`) ...
        feasible = feasible.at[: a + 1].set(False)
        # ... except the current agent's own copy once every delivery it has
        # unlocked is served (it may then hand over to the next agent)
        deliv = jnp.arange(state.visited.shape[0]) >= a + 1 + n // 2
        pending = (state.to_deliver & ~state.visited & deliv).any()
        can_handover = ~pending & (agent_idx < a)
        # the last agent must finish all remaining customers (`env.py:253-258`)
        feasible = set_at(
            feasible, jnp.clip(agent_idx, 0, a),
            jnp.where(can_handover, True, feasible[jnp.clip(agent_idx, 0, a)]),
        )
        pad = jnp.zeros_like(feasible).at[0].set(True)  # absorbing after done
        return jnp.where(state.done, pad, feasible)

    def reward(self, state: MPDPState, actions: jax.Array) -> jax.Array:
        # add the final agent's return-to-depot leg
        final_leg = jnp.linalg.norm(state.cur_coord - state.locs[0])
        lengths = add_at(
            state.lengths,
            jnp.clip(state.count_depot, 0, self.num_agents - 1),
            final_leg,
        )
        if self.objective == "minmax":
            return -lengths.max()
        return -lengths.sum()

    @property
    def num_actions(self) -> int:
        return self.num_agents + 1 + self.num_loc

    @property
    def max_steps(self) -> int:
        # every customer + up to A-1 handover depot visits
        return self.num_loc + self.num_agents - 1

    def check_solution_validity(self, instance: Instance, actions) -> None:
        n, a = self.num_loc, self.num_agents
        acts = np.asarray(actions)
        cust = acts[acts > a]
        assert (np.sort(cust) == np.arange(a + 1, a + 1 + n)).all(), (
            "each customer visited exactly once"
        )
        pos = np.empty(a + 1 + n, dtype=int)
        pos[acts] = np.arange(len(acts))
        for p in range(a + 1, a + 1 + n // 2):
            assert pos[p] < pos[p + n // 2], (
                f"delivery {p + n // 2} before pickup {p}"
            )
