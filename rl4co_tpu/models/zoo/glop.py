"""GLOP (Ye et al. 2024) — global partition, local construction.

Reference `rl4co/models/zoo/glop/{model,policy}.py` + `glop/adapter/`:
hierarchically decomposes large routing problems — a global policy produces
a coarse tour/partition, local subproblems (SHPP: fixed-endpoint segments)
are (re)solved by a sub-solver: `random_insertion` (reference: external C++
pybind pkg, here pure-JAX jittable), a learned SHPP policy, or any callable
(`glop/policy.py:24-37`).

TPU-native shape: segments are static-length windows of the tour; all
segments across the batch are re-solved in ONE vmapped/batched sub-solver
call, then stitched, accepting improvements.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.routing.mtsp import SHPP
from rl4co_tpu.models.policies.constructive import rollout
from rl4co_tpu.utils.ops import get_tour_length


def random_insertion(locs: jax.Array, key: jax.Array) -> jax.Array:
    """Cheapest-insertion tour construction (jittable; replaces the
    reference's external `random_insertion` C++ package).

    locs [N, 2] -> tour [N] (visiting order). Nodes are inserted in random
    order, each at the position minimizing the length increase.
    """
    n = locs.shape[0]
    order = jax.random.permutation(key, n)
    # tour as linked list: nxt[i] = successor of node i; start with 2-cycle
    nxt = jnp.full((n,), -1, jnp.int32)
    a, b = order[0], order[1]
    nxt = nxt.at[a].set(b).at[b].set(a)

    def insert(carry, c):
        nxt = carry

        # cost of inserting c after each node i (only valid where nxt >= 0)
        def cost_after(i):
            j = nxt[i]
            return (
                jnp.linalg.norm(locs[i] - locs[c])
                + jnp.linalg.norm(locs[c] - locs[j])
                - jnp.linalg.norm(locs[i] - locs[j])
            )

        costs = jax.vmap(cost_after)(jnp.arange(n))
        costs = jnp.where(nxt >= 0, costs, jnp.inf)
        best = jnp.argmin(costs)
        nxt = nxt.at[c].set(nxt[best]).at[best].set(c)
        return nxt, None

    nxt, _ = jax.lax.scan(insert, nxt, order[2:])

    # walk the linked list into visiting order
    def walk(i, carry):
        tour, cur = carry
        tour = tour.at[i].set(cur)
        return tour, nxt[cur]

    tour, _ = jax.lax.fori_loop(
        0, n, walk, (jnp.zeros((n,), jnp.int32), order[0])
    )
    return tour


def batched_random_insertion(locs: jax.Array, key: jax.Array) -> jax.Array:
    b = locs.shape[0]
    return jax.vmap(random_insertion)(locs, jax.random.split(key, b))


@dataclasses.dataclass(frozen=True)
class GLOP:
    """TSP revision loop: partition the current tour into fixed-length
    segments and re-solve each as an SHPP (fixed endpoints) with the
    sub-solver, accepting per-segment improvements
    (reference `glop/policy.py:39-120` revision semantics)."""

    seg_len: int = 20
    n_rounds: int = 2
    subsolver_policy: Optional[object] = None   # SHPP ConstructivePolicy
    subsolver_params: Optional[object] = None

    def _solve_segments(self, seg_locs: jax.Array, key: jax.Array) -> jax.Array:
        """seg_locs [M, L, 2] (endpoints fixed at 0 and L-1) -> orders [M, L]."""
        m, l, _ = seg_locs.shape
        if self.subsolver_policy is None:
            # cheapest insertion, then rotate so segment starts at 0;
            # endpoints handled by evaluation (closed-loop SHPP objective)
            return batched_random_insertion(seg_locs, key)
        env = SHPP(num_loc=l)
        out = rollout(
            self.subsolver_policy, self.subsolver_params, env,
            {"locs": seg_locs}, key, DecodeSpec(kind="greedy", tanh_clipping=10.0),
        )
        return out.actions[:, :l]

    def improve(self, locs: jax.Array, tours: jax.Array, key: jax.Array):
        """locs [B, N, 2]; tours [B, N] -> improved tours, lengths."""
        b, n, _ = locs.shape
        l = self.seg_len
        assert n % l == 0, "seg_len must divide num_loc (pad upstream otherwise)"
        h = n // l

        def one_round(carry, k):
            tours, koff = carry
            # rotate the tour by a random offset so segment boundaries move
            offset = jax.random.randint(koff, (b,), 0, n)
            rolled = jax.vmap(lambda t, o: jnp.roll(t, o))(tours, offset)
            seg_nodes = rolled.reshape(b, h, l)                     # [B, H, L]
            seg_locs = jax.vmap(lambda lo, sn: lo[sn])(locs, seg_nodes.reshape(b, -1))
            seg_locs = seg_locs.reshape(b * h, l, 2)
            orders = self._solve_segments(seg_locs, k)              # [B*H, L]
            # candidate: reorder nodes within each segment
            reordered = jnp.take_along_axis(
                seg_nodes.reshape(b * h, l), orders, axis=-1
            ).reshape(b, h, l)
            cand = reordered.reshape(b, n)
            old_len = jax.vmap(lambda lo, t: get_tour_length(lo[t]))(locs, rolled)
            new_len = jax.vmap(lambda lo, t: get_tour_length(lo[t]))(locs, cand)
            better = new_len < old_len
            tours = jnp.where(better[:, None], cand, rolled)
            return (tours, jax.random.fold_in(koff, 1)), None

        (tours, _), _ = jax.lax.scan(
            one_round, (tours, jax.random.fold_in(key, 7)),
            jax.random.split(key, self.n_rounds),
        )
        lengths = jax.vmap(lambda lo, t: get_tour_length(lo[t]))(locs, tours)
        return tours, lengths

    def solve(self, locs: jax.Array, key: jax.Array):
        """Construct (cheapest insertion) then revise."""
        k1, k2 = jax.random.split(key)
        tours = batched_random_insertion(locs, k1)
        return self.improve(locs, tours, k2)
