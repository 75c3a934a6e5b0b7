"""Attention building blocks (reference `rl4co/models/nn/attention.py`).

All implementations are batched-matmul formulations that XLA maps directly
onto the MXU; the single-query pointer step used in autoregressive decoding
is expressed as ``[B, H, 1, N]`` attention so the whole decode step is a
handful of large batched GEMMs. A fused Pallas kernel for the masked pointer
step lives in `rl4co_tpu/ops/` (used for large N).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.ops import TPDense

MASK_VALUE = -1e9  # large-negative instead of -inf: keeps softmax NaN-free


def scaled_dot_product_attention(
    q: jax.Array,  # [..., H, L, Dh]
    k: jax.Array,  # [..., H, S, Dh]
    v: jax.Array,  # [..., H, S, Dh]
    mask: Optional[jax.Array] = None,  # broadcastable to [..., H, L, S]; True = attend
) -> jax.Array:
    """Reference fallback `attention.py:19-61` (`scaled_dot_product_attention_simple`)."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    scores = jnp.einsum("...ld,...sd->...ls", q, k) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, MASK_VALUE)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...ls,...sd->...ld", weights, v)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., S, H*Dh] -> [..., H, S, Dh]"""
    *lead, s, d = x.shape
    x = x.reshape(*lead, s, num_heads, d // num_heads)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """[..., H, S, Dh] -> [..., S, H*Dh]"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, s, h, dh = x.shape
    return x.reshape(*lead, s, h * dh)


class MultiHeadAttention(nn.Module):
    """Self-attention MHA (reference `attention.py:64-134`)."""

    embed_dim: int
    num_heads: int = 8
    use_bias: bool = True
    dtype: Any = None  # computation dtype (None = infer from inputs/params)

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        qkv = TPDense(3 * self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                      tp_role="col", name="Wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        if mask is not None and mask.ndim == x.ndim - 1:
            # [B, S] key-padding mask -> [B, 1, 1, S]
            mask = mask[..., None, None, :]
        out = scaled_dot_product_attention(q, k, v, mask)
        out = _merge_heads(out)
        return TPDense(self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                       tp_role="row", name="out_proj")(out)


class MultiHeadCrossAttention(nn.Module):
    """Cross-attention MHA with separate q / kv inputs (reference `attention.py:147-215`).

    Used by MatNet and L2D; no output bias by default, matching reference.
    """

    embed_dim: int
    num_heads: int = 8
    use_bias: bool = False

    @nn.compact
    def __call__(
        self,
        q_input: jax.Array,
        kv_input: jax.Array,
        cross_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        q = TPDense(self.embed_dim, use_bias=self.use_bias,
                    tp_role="col", name="Wq")(q_input)
        kv = TPDense(2 * self.embed_dim, use_bias=self.use_bias,
                     tp_role="col", name="Wkv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        if cross_mask is not None and cross_mask.ndim == q_input.ndim - 1:
            cross_mask = cross_mask[..., None, None, :]
        out = scaled_dot_product_attention(q, k, v, cross_mask)
        out = _merge_heads(out)
        return TPDense(self.embed_dim, use_bias=self.use_bias,
                       tp_role="row", name="out_proj")(out)


def pointer_logits(
    query: jax.Array,      # [B, L, D] L context queries per instance
    glimpse_k: jax.Array,  # [B, N, D]
    glimpse_v: jax.Array,  # [B, N, D]
    logit_k: jax.Array,    # [B, N, D]
    mask: jax.Array,       # [B, L, N] True = feasible
    num_heads: int,
    project_out,           # callable [B, L, D] -> [B, L, D]
    mask_inner: bool = True,
) -> jax.Array:
    """Functional core of the AM pointer head (reference `attention.py:274-320`).

    1. masked multi-head glimpse: attend queries over glimpse K/V
    2. project heads -> glimpse vectors
    3. logits = glimpse · logit_k^T / sqrt(D)

    The query axis L carries POMO starts / sampling repeats: instead of
    tiling K/V per start (reference `batchify`), the L queries of one
    instance share one K/V load — the decode step becomes a few large
    batched GEMMs with L-fold better arithmetic intensity.
    """
    b, n, d = glimpse_k.shape
    q = _split_heads(query, num_heads)                   # [B, H, L, Dh]
    k = _split_heads(glimpse_k, num_heads)               # [B, H, N, Dh]
    v = _split_heads(glimpse_v, num_heads)
    inner_mask = mask[:, None, :, :] if mask_inner else None
    heads = scaled_dot_product_attention(q, k, v, inner_mask)  # [B, H, L, Dh]
    glimpse = project_out(_merge_heads(heads))                 # [B, L, D]
    logits = jnp.einsum("bld,bnd->bln", glimpse, logit_k) / jnp.sqrt(
        jnp.asarray(d, glimpse.dtype)
    )
    return logits


class PointerAttention(nn.Module):
    """AM decoder pointer head (reference `attention.py:218-320`).

    ``impl='pallas'`` routes the single-query decode step through the fused
    Pallas kernel (`rl4co_tpu/ops/pointer_kernel.py`): one kernel launch,
    one HBM pass over the K/V/logit-K caches, masking + tanh clipping
    included. Multi-query (grouped multistart) and param structure are
    shared with the XLA path.
    """

    embed_dim: int
    num_heads: int = 8
    mask_inner: bool = True
    out_bias: bool = False
    dtype: Any = None
    impl: str = "xla"  # "xla" | "pallas"
    tanh_clipping: float = 0.0  # only used by the fused pallas path

    @nn.compact
    def __call__(
        self,
        query: jax.Array,      # [B, D] or [B, L, D]
        glimpse_k: jax.Array,  # [B, N, D]
        glimpse_v: jax.Array,
        logit_k: jax.Array,
        mask: jax.Array,       # [B, N] or [B, L, N]
    ) -> jax.Array:
        w_out = self.param(
            "project_out_kernel",
            nn.initializers.lecun_normal(),
            (self.embed_dim, self.embed_dim),
        )
        b_out = (
            self.param("project_out_bias", nn.initializers.zeros, (self.embed_dim,))
            if self.out_bias
            else None
        )

        if self.impl == "pallas":
            # single-query ([B, D]) and grouped-multistart ([B, L, D]) decode
            # both route through the fused kernel
            from rl4co_tpu.ops.pointer_kernel import (
                fused_pointer_logits,
                mask_to_neg_bias,
            )

            assert not self.out_bias, "pallas pointer path assumes no out bias"
            # the fused kernel always applies the mask to the inner glimpse
            # via neg_bias; refuse configs (e.g. L2D's mask_inner=False)
            # whose semantics would silently change
            assert self.mask_inner, "pallas pointer path requires mask_inner=True"
            return fused_pointer_logits(
                query, glimpse_k, glimpse_v, logit_k,
                mask_to_neg_bias(mask), w_out.astype(query.dtype),
                self.num_heads, self.tanh_clipping,
            )

        def project_out(x):
            y = x @ w_out.astype(x.dtype)
            if b_out is not None:
                y = y + b_out.astype(x.dtype)
            return y

        single = query.ndim == 2
        if single:
            query = query[:, None, :]
            mask = mask[:, None, :]
        logits = pointer_logits(
            query, glimpse_k, glimpse_v, logit_k, mask,
            num_heads=self.num_heads,
            project_out=project_out,
            mask_inner=self.mask_inner,
        )
        return logits[:, 0, :] if single else logits


class MultiHeadCompat(nn.Module):
    """Unprojected per-head compatibility scores (reference `attention.py:399-457`).

    Returns ``[H, B, L, S]`` scores used by MDAM / HAM.
    """

    embed_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, q_input: jax.Array, kv_input: Optional[jax.Array] = None):
        if kv_input is None:
            kv_input = q_input
        q = nn.Dense(self.embed_dim, use_bias=False, name="Wq")(q_input)
        k = nn.Dense(self.embed_dim, use_bias=False, name="Wk")(kv_input)
        q = _split_heads(q, self.num_heads)  # [B, H, L, Dh]
        k = _split_heads(k, self.num_heads)
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
        compat = jnp.einsum("bhld,bhsd->bhls", q, k) * scale
        return jnp.moveaxis(compat, 1, 0)  # [H, B, L, S]
