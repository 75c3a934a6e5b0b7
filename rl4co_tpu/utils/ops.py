"""Tensor utilities (TPU-native equivalents of `rl4co/utils/ops.py`).

Because environments in this framework are written per-instance and vmapped,
most reference ops (`batchify`/`unbatchify` expand-view tricks,
`rl4co/utils/ops.py:10-51`) reduce to plain reshapes over a leading axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _make_gather_rows(n: int):
    """[B, N, D] gathered by [B] → [B, D], with a dense backward.

    The natural VJP of a batched row gather is a scatter-add into the
    [B, N, D] zeros — on TPU that lowers to a serialized dynamic-update
    chain, and it sits on the decode hot path (context embeddings gather
    current/first node per token). The transpose here is the one-hot
    outer product ``d_src[b] = onehot(idx[b]) ⊗ g[b]`` — a dense VPU
    broadcast-multiply XLA fuses into the surrounding backward."""

    @jax.custom_vjp
    def gather(src, idx):
        return jax.vmap(lambda s, i: s[i])(src, idx)

    def fwd(src, idx):
        return gather(src, idx), idx

    def bwd(idx, g):
        onehot = jax.nn.one_hot(idx, n, dtype=g.dtype)  # [B, N]
        return onehot[:, :, None] * g[:, None, :], None

    gather.defvjp(fwd, bwd)
    return gather


@functools.lru_cache(maxsize=None)
def _make_gather_rows_k(n: int):
    """[B, N, D] gathered by [B, K] → [B, K, D] with a matmul backward
    (``d_src = onehotᵀ @ g`` rides the MXU instead of a K-deep scatter).
    The grouped-multistart decode (POMO: K starts share one instance's
    cache) gathers through this branch every token."""

    @jax.custom_vjp
    def gather(src, idx):
        return jax.vmap(lambda s, i: s[i])(src, idx)

    def fwd(src, idx):
        return gather(src, idx), idx

    def bwd(idx, g):
        onehot = jax.nn.one_hot(idx, n, dtype=g.dtype)      # [B, K, N]
        return jnp.einsum("bkn,bkd->bnd", onehot, g), None

    gather.defvjp(fwd, bwd)
    return gather


def gather_by_index(src: jax.Array, idx: jax.Array, axis: int = -2) -> jax.Array:
    """Gather rows of ``src`` along ``axis`` by integer index, squeezing the axis.

    Equivalent of `rl4co/utils/ops.py:54-66` (``gather_by_index``) for the
    common cases used by the reference:

    - ``src [N, D], idx scalar -> [D]``
    - ``src [B, N, D], idx [B] -> [B, D]``
    - ``src [B, N, D], idx [B, K] -> [B, K, D]``
    """
    idx = jnp.asarray(idx)
    if src.ndim == 2 and idx.ndim == 0:
        return src[idx]
    if src.ndim == 3 and idx.ndim == 1:
        return _make_gather_rows(src.shape[-2])(src, idx)
    if src.ndim == 3 and idx.ndim == 2:
        return _make_gather_rows_k(src.shape[-2])(src, idx)
    raise ValueError(f"Unsupported shapes src={src.shape} idx={idx.shape}")


def get_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Euclidean distance between points (`rl4co/utils/ops.py:69-79`)."""
    return jnp.linalg.norm(a - b, axis=-1)


def get_tour_length(ordered_locs: jax.Array) -> jax.Array:
    """Closed-tour length of locations in visiting order, incl. return arc.

    Reference: `rl4co/utils/ops.py:82-91`. Works on ``[N, 2]`` or ``[..., N, 2]``.
    """
    diffs = ordered_locs - jnp.roll(ordered_locs, shift=1, axis=-2)
    return jnp.linalg.norm(diffs, axis=-1).sum(axis=-1)


def get_open_tour_length(ordered_locs: jax.Array) -> jax.Array:
    """Path length of locations in visiting order (no return arc)."""
    diffs = ordered_locs[..., 1:, :] - ordered_locs[..., :-1, :]
    return jnp.linalg.norm(diffs, axis=-1).sum(axis=-1)


def get_distance_matrix(locs: jax.Array) -> jax.Array:
    """Pairwise Euclidean distance matrix (`rl4co/utils/ops.py:94-100`)."""
    diff = locs[..., :, None, :] - locs[..., None, :, :]
    return jnp.linalg.norm(diff, axis=-1)


def batchify(x, repeats: int):
    """Tile a pytree ``repeats`` times along a new leading sub-axis folded into batch.

    ``[B, ...] -> [B * repeats, ...]`` with layout ``(repeat, batch)`` flattened so
    that ``unbatchify`` with the same ``repeats`` inverts it. Matches the semantics
    of `rl4co/utils/ops.py:27-51` (expand+flatten: repeat-major).
    """

    def _one(a):
        a = jnp.asarray(a)
        if a.ndim == 0:  # batch-agnostic scalar leaf (e.g. disabled cache field)
            return a
        a = jnp.broadcast_to(a[None], (repeats,) + a.shape)
        return a.reshape((repeats * a.shape[1],) + a.shape[2:])

    return jax.tree_util.tree_map(_one, x)


def unbatchify(x, repeats: int):
    """Inverse of :func:`batchify`: ``[B*repeats, ...] -> [B, repeats, ...]``.

    Reference `rl4co/utils/ops.py:10-24` returns ``[B, repeats, ...]`` (batch-major
    view of the repeat-major flattening).
    """

    def _one(a):
        b = a.shape[0] // repeats
        a = a.reshape((repeats, b) + a.shape[1:])
        return jnp.moveaxis(a, 0, 1)

    return jax.tree_util.tree_map(_one, x)


def calculate_entropy(logprobs: jax.Array) -> jax.Array:
    """Entropy of categorical distributions from log-probabilities over last axis.

    Reference: `rl4co/utils/ops.py:103-111`.
    """
    probs = jnp.exp(logprobs)
    ent = -jnp.sum(jnp.where(probs > 0, probs * logprobs, 0.0), axis=-1)
    return ent


def topk_mask(scores: jax.Array, k: int) -> jax.Array:
    """Boolean mask keeping the top-k entries along the last axis (static k)."""
    kth = jnp.sort(scores, axis=-1)[..., -k][..., None]
    return scores >= kth


# ---------------------------------------------------------------------------
# Scatter-free indexed updates.
#
# Env `step`/`action_mask` functions are per-instance and get vmapped into
# the decode `lax.scan`. On TPU, XLA lowers a vmapped scalar-index
# `x.at[i].set(v)` to a batched scatter — which this image's TPU backend
# MISCOMPILES for batch >= ~1024 (verified: repeated nodes in every tour;
# see tests/test_envs.py::test_random_rollout validity + the one-hot repro
# in the round-2 work log). The mask-select formulations below are also the
# faster lowering on TPU: scatters serialize, elementwise selects ride the
# VPU at full width.
# ---------------------------------------------------------------------------


def set_at(x: jax.Array, idx, value) -> jax.Array:
    """``x.at[idx].set(value)`` for a traced scalar ``idx`` along axis 0,
    without a scatter. ``value`` broadcasts against ``x[idx]``."""
    n = x.shape[0]
    hit = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) == idx
    hit = hit.reshape((n,) + (1,) * (x.ndim - 1))
    return jnp.where(hit, value, x)


def add_at(x: jax.Array, idx, value) -> jax.Array:
    """``x.at[idx].add(value)`` for a traced scalar ``idx``, scatter-free."""
    n = x.shape[0]
    hit = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) == idx
    hit = hit.reshape((n,) + (1,) * (x.ndim - 1))
    return x + jnp.where(hit, value, jnp.zeros_like(x))


def set_at2(x: jax.Array, i, j, value) -> jax.Array:
    """``x.at[i, j].set(value)`` for traced scalars ``i, j``, scatter-free."""
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 0) == i
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 1) == j
    hit = (r & c).reshape(x.shape[:2] + (1,) * (x.ndim - 2))
    return jnp.where(hit, value, x)


def mark_where_in(x: jax.Array, idx: jax.Array, value) -> jax.Array:
    """``x.at[idx_vector].set(value)`` for an index *vector* (duplicate
    indices allowed; all hit positions get ``value``), scatter-free."""
    n = x.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, idx.shape[0]), 0)
    hit = (pos == idx[None, :]).any(axis=1)
    hit = hit.reshape((n,) + (1,) * (x.ndim - 1))
    return jnp.where(hit, value, x)


def inverse_permutation(perm: jax.Array) -> jax.Array:
    """``zeros.at[perm].set(arange(n))`` == argsort for a permutation —
    a gather lowering instead of a scatter."""
    return jnp.argsort(perm).astype(perm.dtype)


def scatter_permutation(perm: jax.Array, values: jax.Array) -> jax.Array:
    """``zeros.at[perm].set(values)`` when ``perm`` is a permutation:
    equivalent gather ``values[argsort(perm)]``."""
    return values[jnp.argsort(perm)]


def mark_vector_set(x: jax.Array, idx: jax.Array, values: jax.Array) -> jax.Array:
    """``x.at[idx].set(values)`` for a 1-D ``x`` and an index *vector*,
    scatter-free. Duplicate indices resolve to the last slot (matching
    XLA's effective .at[].set order for our uses)."""
    n = x.shape[0]
    k = idx.shape[0]
    hit = jnp.arange(n)[:, None] == idx[None, :]            # [n, k]
    last_slot = jnp.where(hit, jnp.arange(k)[None, :], -1).max(axis=1)
    vals = values[jnp.clip(last_slot, 0, k - 1)]
    return jnp.where(hit.any(axis=1), vals, x)
