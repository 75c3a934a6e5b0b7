"""N2S Synth-Attention encoder (Ma et al. 2022), shared by N2S and NeuOpt.

Reference `rl4co/models/zoo/n2s/encoder.py:14-210`: self-attention whose
per-head scores are aggregated with auxiliary positional-compatibility
scores through a small MLP (`Synth_Attention`, `encoder.py:17-90`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.attention import MultiHeadCompat
from rl4co_tpu.models.nn.ops import Normalization
from rl4co_tpu.models.nn.pos_embeddings import pos_init_embedding


class SynthAttention(nn.Module):
    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, h, aux_score):
        """h [B, N, D]; aux_score [H, B, N, N] -> (h' [B, N, D], aux)."""
        d, hn = self.embed_dim, self.num_heads
        hd = d // hn

        def heads(name):
            y = nn.Dense(d, use_bias=False, name=name)(h)
            return y.reshape(*y.shape[:-1], hn, hd).swapaxes(-2, -3)  # [B, H, N, hd]

        q, k, v = heads("W_query"), heads("W_key"), heads("W_val")
        qk = jnp.einsum("bhnd,bhmd->bhnm", q, k)  # [B, H, N, N]
        compat = jnp.concatenate(
            [qk, jnp.moveaxis(aux_score, 0, 1)], axis=1
        )  # [B, 2H, N, N]
        attn_raw = jnp.moveaxis(compat, 1, -1)  # [B, N, N, 2H]
        agg = nn.Dense(2 * hn, name="score_aggr_0")(attn_raw)
        agg = jax.nn.relu(agg)
        agg = nn.Dense(hn, name="score_aggr_1")(agg)
        attn = jax.nn.softmax(jnp.moveaxis(agg, -1, 1), axis=-1)  # [B, H, N, N]
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.swapaxes(-2, -3).reshape(*h.shape[:-1], d)
        return nn.Dense(d, use_bias=False, name="W_out")(out), aux_score


class N2SEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int = 4
    feedforward_hidden: int = 128
    normalization: str = "layer"

    @nn.compact
    def __call__(self, h, aux_score):
        h_wave, aux_score = SynthAttention(
            self.embed_dim, self.num_heads, name="synth_att"
        )(h, aux_score)
        h = Normalization(self.normalization, name="norm1")(h + h_wave)
        f = nn.Dense(self.feedforward_hidden, use_bias=False, name="ff1")(h)
        f = jax.nn.relu(f)
        f = nn.Dense(self.embed_dim, use_bias=False, name="ff2")(f)
        h = Normalization(self.normalization, name="norm2")(h + f)
        return h, aux_score


class N2SEncoder(nn.Module):
    """init embedding + CPE positional compat scores + SynthAtt stack."""

    embed_dim: int = 128
    num_heads: int = 4
    num_layers: int = 3
    feedforward_hidden: int = 128
    normalization: str = "layer"
    pos_type: str = "CPE"

    @nn.compact
    def __call__(self, state):
        # NeuOpt/N2S init embedding: 2-layer MLP on coords
        # (reference `neuopt/policy.py:18-36`)
        x = nn.Dense(self.embed_dim // 2, name="init_embed_0")(state.locs)
        x = jax.nn.relu(x)
        h = nn.Dense(self.embed_dim, name="init_embed_1")(x)
        p = pos_init_embedding(self.pos_type, self.embed_dim)(state)
        aux = MultiHeadCompat(self.embed_dim, self.num_heads, name="pos_net")(p)
        for i in range(self.num_layers):
            h, aux = N2SEncoderLayer(
                self.embed_dim, self.num_heads, self.feedforward_hidden,
                self.normalization, name=f"layer_{i}",
            )(h, aux)
        return h
