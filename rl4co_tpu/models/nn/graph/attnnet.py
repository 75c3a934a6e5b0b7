"""Graph attention encoder stack (reference `rl4co/models/nn/graph/attnnet.py:16-106`).

Kool et al. (2019) transformer encoder: per layer,
``x = Norm(x + MHA(x)); x = Norm(x + FFN(x))`` (post-norm, skip connections
as in reference `SkipConnection`/`Normalization` composition).
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from rl4co_tpu.models.nn.attention import MultiHeadAttention
from rl4co_tpu.models.nn.ops import Normalization, TransformerFFN


class MultiHeadAttentionLayer(nn.Module):
    embed_dim: int
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "batch"
    use_bias: bool = True
    hidden_act: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        h = x + MultiHeadAttention(
            self.embed_dim, self.num_heads, use_bias=self.use_bias, name="mha"
        )(x, mask)
        h = Normalization(self.normalization, name="norm1")(h)
        h = h + TransformerFFN(
            self.embed_dim, self.feedforward_hidden, hidden_act=self.hidden_act, name="ffn"
        )(h)
        return Normalization(self.normalization, name="norm2")(h)


class GraphAttentionNetwork(nn.Module):
    embed_dim: int
    num_heads: int = 8
    num_layers: int = 3
    normalization: str = "batch"
    feedforward_hidden: int = 512

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        h_old: Optional[jax.Array] = None,
        return_hidden: bool = False,
    ):
        """Full stack by default. With ``h_old`` given, re-runs ONLY the last
        layer on the cached pre-last-layer hidden state with a key mask — the
        MDAM Embedding-Glimpse `encoder.change` (reference
        `zoo/mdam/encoder.py`, used at `zoo/mdam/decoder.py:165-174`).
        ``return_hidden`` additionally returns that pre-last hidden state."""
        last_name = f"layer_{self.num_layers - 1}"
        if h_old is not None:
            return MultiHeadAttentionLayer(
                self.embed_dim,
                self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                name=last_name,
            )(h_old, mask)
        for i in range(self.num_layers - 1):
            x = MultiHeadAttentionLayer(
                self.embed_dim,
                self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                name=f"layer_{i}",
            )(x, mask)
        hidden = x
        x = MultiHeadAttentionLayer(
            self.embed_dim,
            self.num_heads,
            feedforward_hidden=self.feedforward_hidden,
            normalization=self.normalization,
            name=last_name,
        )(x, mask)
        if return_hidden:
            return x, hidden
        return x
