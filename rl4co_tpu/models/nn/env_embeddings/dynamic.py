"""Dynamic embeddings: per-step updates to decoder K/V/logit-K.

Reference: registry `rl4co/models/nn/env_embeddings/dynamic.py:10-44`;
`StaticEmbedding` no-op (`dynamic.py:47-57`); `SDVRPDynamicEmbedding`
(`dynamic.py:60-78`) projects remaining demand into K/V/logit-K deltas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class StaticEmbedding(nn.Module):
    """No-op: environments whose node features never change during decoding."""

    embed_dim: int

    def __call__(self, state):
        z = jnp.float32(0.0)
        return z, z, z


class SDVRPDynamicEmbedding(nn.Module):
    """Remaining-demand projection for split-delivery VRP (reference `dynamic.py:60-78`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, state) -> tuple[jax.Array, jax.Array, jax.Array]:
        # demands_with_depot: [B, N+1]; depot slot has 0 remaining demand
        remaining = state.demand_with_depot[..., None]  # [B, N+1, 1]
        proj = nn.Dense(3 * self.embed_dim, use_bias=False, name="projection")(remaining)
        return tuple(jnp.split(proj, 3, axis=-1))


DYNAMIC_EMBEDDING_REGISTRY: dict[str, type] = {
    "sdvrp": SDVRPDynamicEmbedding,
}


def env_dynamic_embedding(env_name: str, embed_dim: int, **kwargs) -> nn.Module:
    cls = DYNAMIC_EMBEDDING_REGISTRY.get(env_name, StaticEmbedding)
    return cls(embed_dim=embed_dim, **kwargs)
