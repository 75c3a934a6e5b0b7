"""Positional embeddings for improvement models
(reference `rl4co/models/nn/pos_embeddings.py:26-147`).

Patterns depend only on the static (N, D) so they are precomputed with numpy
at trace time and indexed by the solution's visit order (``visited_time``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def absolute_pattern(n_position: int, emb_dim: int) -> np.ndarray:
    """Original-transformer sinusoidal table (reference `pos_embeddings.py:34-46`)."""
    pattern = np.array(
        [
            [pos / np.power(10000, 2 * (j // 2) / emb_dim) for j in range(emb_dim)]
            for pos in range(1, n_position + 1)
        ],
        dtype=np.float32,
    )
    pattern[1:, 0::2] = np.sin(pattern[1:, 0::2])
    pattern[1:, 1::2] = np.cos(pattern[1:, 1::2])
    return pattern


def cyclic_pattern(n_position: int, emb_dim: int) -> np.ndarray:
    """Cyclic positional encoding of Ma et al. 2021 (reference
    `pos_embeddings.py:72-110`)."""

    def basesin(x, T, fai=0.0):
        return np.sin(2 * np.pi / T * np.abs(np.mod(x, 2 * T) - T) + fai)

    def basecos(x, T, fai=0.0):
        return np.cos(2 * np.pi / T * np.abs(np.mod(x, 2 * T) - T) + fai)

    td_set = np.linspace(
        np.power(n_position, 1 / (emb_dim // 2)), n_position, emb_dim // 2, dtype="int"
    )
    x = np.zeros((n_position, emb_dim))
    for i in range(emb_dim):
        td = (
            td_set[i // 3 * 3 + 1]
            if (i // 3 * 3 + 1) < (emb_dim // 2)
            else td_set[-1]
        )
        fai = (
            0.0
            if i <= (emb_dim // 2)
            else 2 * np.pi * ((-i + (emb_dim // 2)) / (emb_dim // 2))
        )
        longer = np.arange(0, np.ceil(n_position / td) * td, 0.01)
        idx = np.linspace(0, len(longer), n_position, dtype="int", endpoint=False)
        if i % 2 == 1:
            x[:, i] = basecos(longer, td, fai)[idx]
        else:
            x[:, i] = basesin(longer, td, fai)[idx]
    return x.astype(np.float32)


class AbsolutePositionalEmbedding(nn.Module):
    embed_dim: int

    def __call__(self, state) -> jax.Array:
        n = state.visited_time.shape[-1]
        pattern = jnp.asarray(absolute_pattern(n, self.embed_dim))
        idx = state.visited_time % n
        return pattern[idx]


class CyclicPositionalEmbedding(nn.Module):
    embed_dim: int

    def __call__(self, state) -> jax.Array:
        n = state.visited_time.shape[-1]
        pattern = jnp.asarray(cyclic_pattern(n, self.embed_dim))
        idx = state.visited_time % n
        return pattern[idx]


POS_EMBEDDING_REGISTRY = {
    "APE": AbsolutePositionalEmbedding,
    "CPE": CyclicPositionalEmbedding,
}


def pos_init_embedding(pos_type: str, embed_dim: int) -> nn.Module:
    cls = POS_EMBEDDING_REGISTRY.get(pos_type)
    if cls is None:
        raise ValueError(f"Unknown pos embedding {pos_type}")
    return cls(embed_dim=embed_dim)
