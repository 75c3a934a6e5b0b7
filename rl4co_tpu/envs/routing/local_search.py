"""Env-level local-search hooks over the native C++ kernels.

Reference: `RL4COEnvBase.local_search` (`envs/common/base.py:228-232`) with
TSP 2-opt (`tsp/env.py:183-188`) and CVRP HGS (`cvrp/env.py:247-252`).
The jittable variants wrap the host kernels with `jax.pure_callback` so
DeepACO/GFACS can run neural local search inside the jitted ACO loop
(SURVEY.md §7: keep native search out of the training hot path otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.utils.ops import get_tour_length


def host_callbacks_supported() -> bool:
    """Whether the active JAX backend can run host callbacks inside jit.

    The axon TPU PJRT tunnel (this image's TPU path) rejects host send/recv
    callbacks (``jax.pure_callback`` raises UNIMPLEMENTED at run time), so
    in-loop neural local search must fall back to host-side polishing there.
    """
    return jax.devices()[0].platform not in ("axon",)


def tsp_local_search(locs: np.ndarray, tours: np.ndarray, max_iterations: int = 1000):
    """Host-side batched 2-opt. locs [B, N, 2], tours [B, N]."""
    from rl4co_tpu.native import batched_two_opt

    return batched_two_opt(np.asarray(locs), np.asarray(tours), max_iterations)


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
