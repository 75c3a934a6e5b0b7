"""Anisotropic edge-gated GNN encoder (Joshi et al. 2022), TPU-native.

Reference `rl4co/models/nn/graph/gnn.py:14-103` uses PyG sparse
edge_index/edge_attr; here edges live in a **static top-K neighbor layout**:
``nbr_idx [B, N, K]`` (int32) and edge features ``w [B, N, K, D]`` — fixed
shapes, gathers instead of scatters, XLA-friendly (SURVEY.md §2.6b flags the
reference's per-instance PyG graph build as a known CPU bottleneck).

Per layer (mirroring `gnn.py:45-61`):
    x_i <- x_i + act(norm(W1 x_i + mean_k sigmoid(w_ik) * W2 x_{nbr(i,k)}))
    w_ik <- w_ik + act(norm(We w_ik + W3 x_i + W4 x_{nbr(i,k)}))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.ops import ACTIVATIONS, Normalization


def gather_neighbors(x: jax.Array, nbr_idx: jax.Array) -> jax.Array:
    """x [B, N, D], nbr_idx [B, N, K] -> [B, N, K, D]."""
    return jax.vmap(lambda xb, ib: xb[ib])(x, nbr_idx)


class SparseGNNLayer(nn.Module):
    embed_dim: int
    act_fn: str = "silu"
    agg_fn: str = "mean"

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, nbr_idx: jax.Array):
        act = ACTIVATIONS[self.act_fn]
        x1 = nn.Dense(self.embed_dim, name="v_lin1")(x)
        x2 = nn.Dense(self.embed_dim, name="v_lin2")(x)
        x3 = nn.Dense(self.embed_dim, name="v_lin3")(x)
        x4 = nn.Dense(self.embed_dim, name="v_lin4")(x)

        msgs = jax.nn.sigmoid(w) * gather_neighbors(x2, nbr_idx)  # [B,N,K,D]
        if self.agg_fn == "mean":
            agg = msgs.mean(axis=-2)
        elif self.agg_fn == "sum":
            agg = msgs.sum(axis=-2)
        elif self.agg_fn == "max":
            agg = msgs.max(axis=-2)
        else:
            raise ValueError(self.agg_fn)
        x = x + act(Normalization("batch", name="v_bn")(x1 + agg))

        we = nn.Dense(self.embed_dim, name="e_lin")(w)
        w = w + act(
            Normalization("batch", name="e_bn")(
                we + x3[:, :, None, :] + gather_neighbors(x4, nbr_idx)
            )
        )
        return x, w


class SparseGNNEncoder(nn.Module):
    embed_dim: int
    num_layers: int = 3
    act_fn: str = "silu"
    agg_fn: str = "mean"

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, nbr_idx: jax.Array):
        act = ACTIVATIONS[self.act_fn]
        x, w = act(x), act(w)
        for i in range(self.num_layers):
            x, w = SparseGNNLayer(
                self.embed_dim, self.act_fn, self.agg_fn, name=f"layer_{i}"
            )(x, w, nbr_idx)
        return x, w
