"""NARGNN — non-autoregressive heatmap policy.

Reference `rl4co/models/zoo/nargnn/encoder.py:20-196`: init embedding →
k-NN edge embedding → 15-layer anisotropic GNN → 5-layer edge MLP →
sigmoid → dense heatmap → log. Here edges use the static top-K layout
(`rl4co_tpu/models/nn/graph/gnn.py`); the heatmap scatter is one vmapped
`.at[].set` into a ``log(1e-12)``-filled dense matrix.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.nn.env_embeddings import env_init_embedding
from rl4co_tpu.models.nn.env_embeddings.edge import env_edge_embedding
from rl4co_tpu.models.nn.graph.gnn import SparseGNNEncoder
from rl4co_tpu.models.nn.ops import ACTIVATIONS
from rl4co_tpu.models.policies.nonautoregressive import nar_rollout


class EdgeHeatmapGenerator(nn.Module):
    """Edge MLP → sigmoid prob → dense log-heatmap
    (reference `nargnn/encoder.py:20-96`)."""

    embed_dim: int
    num_layers: int = 5
    act_fn: str = "silu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, w: jax.Array, nbr_idx: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.act_fn]
        for i in range(self.num_layers - 1):
            w = act(nn.Dense(self.embed_dim, use_bias=self.use_bias, name=f"lin_{i}")(w))
        p = jax.nn.sigmoid(
            nn.Dense(1, use_bias=self.use_bias, name="output")(w)[..., 0]
        )  # [B, N, K]
        b, n, k = p.shape
        def scatter_one(pb, ib):
            # per-row k-NN scatter as one-hot weighted sum (scatter-free)
            oh = jax.nn.one_hot(ib, n, dtype=pb.dtype)      # [N, K, N]
            z = (oh * pb[..., None]).sum(axis=1)            # [N, N]
            return jnp.maximum(z, 0.0) + 1e-12

        heat = jax.vmap(scatter_one)(p, nbr_idx)
        return jnp.log(heat)


class NARGNNEncoder(nn.Module):
    """Heatmap encoder (reference defaults: embed 64, 15 GNN layers,
    5 heatmap layers — `nargnn/encoder.py:125-136`)."""

    env_name: str = "tsp"
    embed_dim: int = 64
    num_layers_graph_encoder: int = 15
    num_layers_heatmap_generator: int = 5
    act_fn: str = "silu"
    agg_fn: str = "mean"
    k_sparse: Optional[int] = None

    @nn.compact
    def __call__(self, instances) -> jax.Array:
        x = env_init_embedding(self.env_name, self.embed_dim)(instances)
        w, nbr_idx = env_edge_embedding(
            self.env_name, self.embed_dim, k_sparse=self.k_sparse
        )(instances)
        x, w = SparseGNNEncoder(
            self.embed_dim,
            num_layers=self.num_layers_graph_encoder,
            act_fn=self.act_fn,
            agg_fn=self.agg_fn,
            name="graph_network",
        )(x, w, nbr_idx)
        return EdgeHeatmapGenerator(
            self.embed_dim,
            num_layers=self.num_layers_heatmap_generator,
            name="heatmap_generator",
        )(w, nbr_idx)


class NonAutoregressivePolicy:
    """Thin functional wrapper pairing a heatmap encoder with `nar_rollout`
    (reference `rl4co/models/common/constructive/nonautoregressive/policy.py`)."""

    def __init__(self, encoder: nn.Module, env_name: str):
        self.encoder = encoder
        self.env_name = env_name

    def init_params(self, env: Env, key: jax.Array):
        kgen, kinit = jax.random.split(key)
        instances = env.generate_batch(kgen, 2)
        return self.encoder.init(kinit, instances)

    def heatmap(self, params, instances) -> jax.Array:
        return self.encoder.apply(params, instances)

    def rollout(
        self,
        params,
        env: Env,
        instances,
        key: jax.Array,
        spec: DecodeSpec,
        first_actions=None,
    ):
        heat = self.heatmap(params, instances)
        return nar_rollout(env, instances, heat, key, spec, first_actions)


def NARGNNPolicy(env_name: str = "tsp", encoder=None, **encoder_kwargs):
    """Reference `zoo/nargnn/policy.py`: NAR policy = GNN encoder producing an
    edge heatmap, decoded by the shared NAR rollout. Returns a
    `NonAutoregressivePolicy` wrapper."""
    if encoder is None:
        encoder = NARGNNEncoder(env_name=env_name, **encoder_kwargs)
    return NonAutoregressivePolicy(encoder=encoder, env_name=env_name)
