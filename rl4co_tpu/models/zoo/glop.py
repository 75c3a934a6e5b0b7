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
from rl4co_tpu.utils.ops import get_tour_length, set_at


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
    nxt = set_at(set_at(nxt, a, b), b, a)

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
        nxt = set_at(set_at(nxt, c, nxt[best]), best, c)
        return nxt, None

    nxt, _ = jax.lax.scan(insert, nxt, order[2:])

    # walk the linked list into visiting order
    def walk(i, carry):
        tour, cur = carry
        tour = set_at(tour, i, cur)
        return tour, nxt[cur]

    tour, _ = jax.lax.fori_loop(
        0, n, walk, (jnp.zeros((n,), jnp.int32), order[0])
    )
    return tour


def batched_random_insertion(locs: jax.Array, key: jax.Array) -> jax.Array:
    b = locs.shape[0]
    return jax.vmap(random_insertion)(locs, jax.random.split(key, b))


def random_insertion_path(locs: jax.Array, key: jax.Array) -> jax.Array:
    """Cheapest insertion into an OPEN PATH with fixed endpoints 0 and N-1
    (the SHPP objective). Re-solving a tour *segment* must respect its
    junctions to the rest of the tour; a closed-cycle re-solve ignores them
    and its candidates lose at the junction edges (measured: zero accepted
    revisions). locs [N, 2] -> order [N] with order[0] = 0, order[-1] = N-1.
    """
    n = locs.shape[0]
    order = jax.random.permutation(key, n - 2) + 1  # interior nodes only
    # path as linked list from 0 to N-1; N-1's successor is a sentinel
    nxt = jnp.full((n,), -1, jnp.int32)
    nxt = set_at(nxt, 0, n - 1)

    def insert(nxt, c):
        def cost_after(i):
            j = nxt[i]
            return (
                jnp.linalg.norm(locs[i] - locs[c])
                + jnp.linalg.norm(locs[c] - locs[j])
                - jnp.linalg.norm(locs[i] - locs[j])
            )

        costs = jax.vmap(cost_after)(jnp.arange(n))
        costs = jnp.where(nxt >= 0, costs, jnp.inf)  # only path positions
        best = jnp.argmin(costs)
        nxt = set_at(set_at(nxt, c, nxt[best]), best, c)
        return nxt, None

    nxt, _ = jax.lax.scan(insert, nxt, order)

    def walk(i, carry):
        path, cur = carry
        path = set_at(path, i, cur)
        return path, nxt[cur]

    path, _ = jax.lax.fori_loop(
        0, n, walk, (jnp.zeros((n,), jnp.int32), jnp.int32(0))
    )
    return path


def batched_random_insertion_path(locs: jax.Array, key: jax.Array) -> jax.Array:
    b = locs.shape[0]
    return jax.vmap(random_insertion_path)(locs, jax.random.split(key, b))


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
            # open-path cheapest insertion with the segment's junction nodes
            # fixed as endpoints (SHPP semantics — a closed-cycle re-solve
            # ignores the junctions and its candidates are rejected)
            return batched_random_insertion_path(seg_locs, key)
        # Normalize each segment to the unit square (uniform scale, so the
        # optimal order is preserved): at N=1000 a segment occupies a tiny
        # local patch, while the reviser is trained on [0,1]^2 SHPP
        # instances (reference GLOP's coordinate transformation,
        # `glop/policy.py` revision preprocessing).
        lo = seg_locs.min(axis=1, keepdims=True)
        scale = (seg_locs.max(axis=1, keepdims=True) - lo).max(
            axis=-1, keepdims=True
        )
        seg_norm = (seg_locs - lo) / jnp.maximum(scale, 1e-9)
        env = SHPP(num_loc=l)
        out = rollout(
            self.subsolver_policy, self.subsolver_params, env,
            {"locs": seg_norm}, key, DecodeSpec(kind="greedy", tanh_clipping=10.0),
        )
        return out.actions[:, :l]

    def improve(self, locs: jax.Array, tours: jax.Array, key: jax.Array):
        """locs [B, N, 2]; tours [B, N] -> improved tours, lengths."""
        b, n, _ = locs.shape
        l = self.seg_len
        assert n % l == 0, "seg_len must divide num_loc (pad upstream otherwise)"
        h = n // l

        def seg_path_len(sl, orders):
            """Internal path length of each segment under `orders` [M, L].
            Junction edges (segment end -> next segment start) are constant
            under any endpoint-preserving reorder and excluded."""
            pts = jnp.take_along_axis(sl, orders[..., None].repeat(2, -1), 1)
            return jnp.linalg.norm(pts[:, 1:] - pts[:, :-1], axis=-1).sum(-1)

        identity = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b * h, l))

        def one_round(carry, k):
            tours, koff = carry
            # rotate the tour by a random offset so segment boundaries move
            offset = jax.random.randint(koff, (b,), 0, n)
            rolled = jax.vmap(lambda t, o: jnp.roll(t, o))(tours, offset)
            seg_nodes = rolled.reshape(b, h, l)                     # [B, H, L]
            seg_locs = jax.vmap(lambda lo, sn: lo[sn])(locs, seg_nodes.reshape(b, -1))
            seg_locs = seg_locs.reshape(b * h, l, 2)
            # Candidates per segment: identity (never worsen), open-path
            # cheapest insertion, and the learned reviser when present.
            # Every candidate fixes the segment's endpoint (junction) nodes,
            # so segments are independent and acceptance is PER SEGMENT by
            # internal path length — strictly stronger than the all-or-
            # nothing whole-tour accept (a weak reviser can't hurt and a
            # partial win is kept).
            k_ins, k_pol = jax.random.split(k)
            cands = [identity, batched_random_insertion_path(seg_locs, k_ins)]
            if self.subsolver_policy is not None:
                cands.append(self._solve_segments(seg_locs, k_pol))
            stacked = jnp.stack(cands)                              # [C, M, L]
            lens = jax.vmap(lambda o: seg_path_len(seg_locs, o))(stacked)
            best = jnp.argmin(lens, axis=0)                         # [M]
            orders = jnp.take_along_axis(
                stacked, best[None, :, None], axis=0
            )[0]                                                    # [M, L]
            reordered = jnp.take_along_axis(
                seg_nodes.reshape(b * h, l), orders, axis=-1
            )
            tours = reordered.reshape(b, n)
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


# ---------------------------------------------------------------------------
# VRP adapter (reference `glop/adapter/vrp_adapter.py`): decompose a CVRP
# solution into its routes, re-solve each route as a sub-TSP through the
# depot, and recompose — here with static shapes: routes live on a [B, R, L]
# grid padded with depot index 0. Padded entries cost nothing (depot→depot
# distance is 0), so cheapest insertion parks them for free; no numba/host
# loop (`vrp_adapter.py:1-158` uses `@nb.njit` partitioners).
# ---------------------------------------------------------------------------


def vrp_route_cost(locs: jax.Array, actions: jax.Array) -> jax.Array:
    """Total route cost of depot-separated actions [B, T] (0 = depot); the
    vehicle starts and ends at the depot (row 0 of locs)."""
    coords = jax.vmap(lambda lo, a: lo[a])(locs, actions)
    depot = locs[:, 0:1]
    path = jnp.concatenate([depot, coords, depot], axis=1)
    return jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=-1).sum(axis=1)


def partition_vrp_actions(actions: jax.Array, max_routes: int, max_len: int):
    """actions [B, T] (0 = depot separator) -> route grid [B, R, L] of node
    indices, depot-padded. Customers appearing after k depot visits belong to
    route k (mirrors `_cvrp_action_partitioner`)."""
    b, t = actions.shape
    is_dep = actions == 0
    rid = jnp.cumsum(is_dep, axis=1) - jnp.where(is_dep, 1, 0)  # route of each pos
    # position within route = index − (index of the route's opening depot + 1)
    idx = jnp.arange(t)[None, :]
    start = jax.lax.cummax(jnp.where(is_dep, idx + 1, 0), axis=1)
    pos = idx - start
    # customers beyond the grid (rid ≥ R or pos ≥ L) fall into a dump slot
    # rather than clip-colliding onto a real slot
    valid = (~is_dep) & (rid < max_routes) & (pos < max_len)
    flat = jnp.where(valid, rid * max_len + pos, max_routes * max_len)
    grid = jnp.zeros((b, max_routes * max_len + 1), actions.dtype)
    vals = jnp.where(valid, actions, 0)
    grid = jax.vmap(lambda g, f, v: g.at[f].set(v, mode="drop"))(grid, flat, vals)
    return grid[:, :-1].reshape(b, max_routes, max_len)


@dataclasses.dataclass(frozen=True)
class GLOPVRPAdapter:
    """Re-solve every route of a CVRP solution as a sub-TSP (reference
    `VRP2SubTSPAdapter`), accepting per-route improvements. Intra-route
    reordering keeps route membership — and hence capacity feasibility —
    unchanged."""

    max_routes: int
    max_route_len: int
    min_node_count: int = 4  # routes smaller than this are left as-is

    def improve(self, locs: jax.Array, actions: jax.Array, key: jax.Array):
        """locs [B, N+1, 2] (depot row 0); actions [B, T] (0 = depot).
        Returns (new_actions [B, R*(L+1)], cost [B])."""
        b = locs.shape[0]
        r, l = self.max_routes, self.max_route_len
        routes = partition_vrp_actions(actions, r, l)          # [B, R, L]

        # per-route sub-TSP coordinates: local node 0 = depot, 1.. = route
        # nodes (depot-padded rows collapse onto the depot coordinate)
        flat_nodes = routes.reshape(b, r * l)
        coords = jax.vmap(lambda lo, nd: lo[nd])(locs, flat_nodes)
        coords = coords.reshape(b, r, l, 2)
        depot = jnp.broadcast_to(locs[:, 0:1, :][:, None], (b, r, 1, 2))
        sub = jnp.concatenate([depot, coords], axis=2).reshape(b * r, l + 1, 2)

        orders = batched_random_insertion(sub, key)            # [B*R, L+1] cycles
        # rotate each cycle to start at the explicit depot (local index 0)
        start = jnp.argmax(orders == 0, axis=1)
        orders = jax.vmap(lambda o, s: jnp.roll(o, -s))(orders, start)
        # orientation is free on a closed cycle; keep as-is
        new_routes = jnp.where(
            orders[:, 1:] > 0,
            jnp.take_along_axis(
                routes.reshape(b * r, l),
                jnp.clip(orders[:, 1:] - 1, 0, l - 1),
                axis=1,
            ),
            0,
        )                                                      # [B*R, L]

        old_cost = _route_len(sub, routes.reshape(b * r, l))
        new_cost = _route_len(sub, new_routes)
        n_nodes = (routes.reshape(b * r, l) > 0).sum(axis=1)
        accept = (new_cost < old_cost) & (n_nodes >= self.min_node_count)
        chosen = jnp.where(accept[:, None], new_routes, routes.reshape(b * r, l))

        # recompose: depot separator + route nodes, per route
        out = jnp.concatenate(
            [jnp.zeros((b * r, 1), actions.dtype), chosen.astype(actions.dtype)],
            axis=1,
        ).reshape(b, r * (l + 1))

        # Guard: if the grid was undersized, customers fell into the dump
        # slot and the recomposed solution would be invalid (and spuriously
        # cheap). Keep the original solution for those instances.
        intact = (routes > 0).sum(axis=(1, 2)) == (actions > 0).sum(axis=1)
        t = actions.shape[1]
        width = max(t, r * (l + 1))
        out = jnp.pad(out, ((0, 0), (0, width - out.shape[1])))
        orig = jnp.pad(actions, ((0, 0), (0, width - t)))
        out = jnp.where(intact[:, None], out, orig)
        return out, vrp_route_cost(locs, out)


def _route_len(sub: jax.Array, route_nodes: jax.Array) -> jax.Array:
    """Length of depot→nodes→depot for one route; sub [M, L+1, 2] has the
    depot at row 0 and route node i at row i+1; route_nodes [M, L] are global
    indices used only for the depot-padding test (0 = padding)."""
    coords = jnp.where(
        (route_nodes > 0)[..., None], sub[:, 1:], sub[:, 0:1]
    )  # padding collapses to depot
    path = jnp.concatenate([sub[:, 0:1], coords, sub[:, 0:1]], axis=1)
    return jnp.linalg.norm(path[:, 1:] - path[:, :-1], axis=-1).sum(axis=1)
