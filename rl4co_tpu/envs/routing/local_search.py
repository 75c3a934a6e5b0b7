"""Env-level local-search hooks over the native C++ kernels.

Reference: `RL4COEnvBase.local_search` (`envs/common/base.py:228-232`) with
TSP 2-opt (`tsp/env.py:183-188`) and CVRP HGS (`cvrp/env.py:247-252`).
The jittable variants wrap the host kernels with `jax.pure_callback` so
DeepACO/GFACS can run neural local search inside the jitted ACO loop
(SURVEY.md §7: keep native search out of the training hot path otherwise).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.utils.ops import get_tour_length

_HOST_CB_SUPPORTED: bool | None = None


def host_callbacks_supported() -> bool:
    """Whether the active JAX backend can run host callbacks inside jit.

    The axon TPU PJRT tunnel rejects host send/recv callbacks
    (``jax.pure_callback`` raises UNIMPLEMENTED at *run* time) — but it
    registers under the ordinary ``tpu`` platform name, so no string check
    can identify it (round-3 finding: the old ``platform != "axon"`` guard
    always passed and the NAR eval crashed on-chip). Detection: the tunnel's
    ``PALLAS_AXON_POOL_IPS`` env marker, else a one-time jitted
    pure_callback probe (cached per process).
    """
    global _HOST_CB_SUPPORTED
    if _HOST_CB_SUPPORTED is None:
        if jax.default_backend() == "cpu":
            _HOST_CB_SUPPORTED = True
        elif os.environ.get("PALLAS_AXON_POOL_IPS"):
            _HOST_CB_SUPPORTED = False
        else:
            _HOST_CB_SUPPORTED = _probe_host_callback()
    return _HOST_CB_SUPPORTED


def _probe_host_callback() -> bool:
    try:
        out = jax.jit(
            lambda x: jax.pure_callback(
                lambda y: np.asarray(y) + np.float32(1.0),
                jax.ShapeDtypeStruct((), jnp.float32),
                x,
            )
        )(jnp.float32(1.0))
        return float(out) == 2.0
    except Exception:
        return False


def tsp_local_search(locs: np.ndarray, tours: np.ndarray,
                     max_iterations: int = 1000, method: str = "auto"):
    """Host-side batched TSP local search. locs [B, N, 2], tours [B, N].

    method: 'plain' = best-improvement 2-opt (reference
    `tsp/local_search.py:46-81` semantics); 'nl' = neighbor-list 2-opt +
    Or-opt (first improvement, don't-look bits) — the large-N kernel,
    measured ~200x faster *and* shorter tours at N=1000; 'auto' picks
    'nl' for N ≥ 256.
    """
    locs, tours = np.asarray(locs), np.asarray(tours)
    if method == "auto":
        method = "nl" if tours.shape[-1] >= 256 else "plain"
    if method == "nl":
        from rl4co_tpu.native import batched_two_opt_nl

        return batched_two_opt_nl(locs, tours, max_passes=max_iterations)
    from rl4co_tpu.native import batched_two_opt

    return batched_two_opt(locs, tours, max_iterations)


def cvrp_local_search(
    locs: np.ndarray, demand_with_depot: np.ndarray, actions: np.ndarray,
    capacity: float = 1.0, max_iterations: int = 100,
):
    """Host-side CVRP neighborhood search. locs [B, N+1, 2] (depot row 0)."""
    from rl4co_tpu.native import batched_cvrp_local_search

    return batched_cvrp_local_search(
        np.asarray(locs), np.asarray(demand_with_depot), np.asarray(actions),
        capacity=capacity, max_iterations=max_iterations,
    )


def make_tsp_ls_fn(max_iterations: int = 200):
    """Jit-safe TSP local-search closure for the ACO loop:
    (instances, actions, reward) -> (actions, reward)."""

    def ls(instances, actions, reward):
        locs = instances["locs"]

        def host(locs_np, acts_np):
            return tsp_local_search(locs_np, acts_np, max_iterations).astype(np.int32)

        new_actions = jax.pure_callback(
            host,
            jax.ShapeDtypeStruct(actions.shape, jnp.int32),
            locs, actions,
            vmap_method="sequential",
        )
        ordered = jnp.take_along_axis(locs, new_actions[..., None], axis=-2)
        new_reward = -get_tour_length(ordered)
        return new_actions, new_reward

    return ls


def make_host_tsp_ls(max_iterations: int = 200):
    """Host-side TSP local-search closure for the segmented ACO loop
    (reference runs 2-opt on CPU *between* sampling rounds,
    `antsystem.py:173-210`): (host instances, actions, reward) -> improved
    (actions, reward), all numpy. Works on every backend — including the
    axon TPU tunnel, which rejects in-jit host callbacks."""

    def ls(inst_tiled, actions, reward):
        locs = np.asarray(inst_tiled["locs"])
        new_actions = tsp_local_search(
            locs, np.asarray(actions).astype(np.int32), max_iterations
        ).astype(np.int32)
        seq = np.take_along_axis(locs, new_actions[..., None], axis=-2)
        new_reward = -np.linalg.norm(
            seq - np.roll(seq, -1, axis=-2), axis=-1
        ).sum(-1).astype(np.float32)
        return new_actions, new_reward

    return ls


def make_host_cvrp_ls(capacity: float = 1.0, max_iterations: int = 100):
    """Host-side CVRP local-search closure (segmented ACO loop)."""

    def ls(inst_tiled, actions, reward):
        locs = np.concatenate(
            [np.asarray(inst_tiled["depot"])[:, None, :],
             np.asarray(inst_tiled["locs"])], axis=-2)
        demand_wd = np.concatenate(
            [np.zeros_like(np.asarray(inst_tiled["demand"])[:, :1]),
             np.asarray(inst_tiled["demand"])], axis=-1)
        new_actions = cvrp_local_search(
            locs, demand_wd, np.asarray(actions).astype(np.int32),
            capacity, max_iterations,
        ).astype(np.int32)
        with_depot = np.concatenate(
            [np.zeros_like(new_actions[:, :1]), new_actions], axis=-1)
        seq = np.take_along_axis(locs, with_depot[..., None], axis=-2)
        new_reward = -np.linalg.norm(
            seq - np.roll(seq, -1, axis=-2), axis=-1
        ).sum(-1).astype(np.float32)
        return new_actions, new_reward

    return ls


def make_cvrp_ls_fn(capacity: float = 1.0, max_iterations: int = 100):
    """Jit-safe CVRP local-search closure for the ACO loop."""

    def ls(instances, actions, reward):
        locs = jnp.concatenate(
            [instances["depot"][:, None, :], instances["locs"]], axis=-2
        )
        demand_wd = jnp.concatenate(
            [jnp.zeros_like(instances["demand"][:, :1]), instances["demand"]], axis=-1
        )

        def host(locs_np, dem_np, acts_np):
            return cvrp_local_search(
                locs_np, dem_np, acts_np, capacity, max_iterations
            ).astype(np.int32)

        new_actions = jax.pure_callback(
            host,
            jax.ShapeDtypeStruct(actions.shape, jnp.int32),
            locs, demand_wd, actions,
            vmap_method="sequential",
        )
        ordered = jnp.take_along_axis(
            locs, jnp.concatenate(
                [jnp.zeros_like(new_actions[:, :1]), new_actions], axis=-1
            )[..., None],
            axis=-2,
        )
        new_reward = -get_tour_length(ordered)
        return new_actions, new_reward

    return ls
