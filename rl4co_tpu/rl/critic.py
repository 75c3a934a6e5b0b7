"""Critic network (reference `rl4co/models/rl/common/critic.py:12-72`).

Same encoder architecture as the actor; value head = MLP over node
embeddings, meaned over nodes.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from rl4co_tpu.models.nn.env_embeddings import env_init_embedding
from rl4co_tpu.models.nn.graph.attnnet import GraphAttentionNetwork


class CriticNetwork(nn.Module):
    env_name: str = "tsp"
    embed_dim: int = 128
    num_encoder_layers: int = 3
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "batch"
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, instances) -> jax.Array:
        h = env_init_embedding(self.env_name, self.embed_dim)(instances)
        h = GraphAttentionNetwork(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_layers=self.num_encoder_layers,
            normalization=self.normalization,
            feedforward_hidden=self.feedforward_hidden,
        )(h)
        v = nn.Dense(self.hidden_dim)(h)
        v = jax.nn.relu(v)
        v = nn.Dense(1)(v)  # [B, N, 1]
        return v.mean(axis=-2)[..., 0]  # [B]
