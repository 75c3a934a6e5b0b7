"""Edge embeddings for NAR/GNN encoders.

Reference `rl4co/models/nn/env_embeddings/edge.py:19-286` builds per-instance
PyG graphs from k-NN sparsified distance matrices with a Python loop over
the batch (flagged as a CPU bottleneck, SURVEY.md §2.6b). Here: batched
static-shape top-k edges — ``knn_edges`` returns ``nbr_idx [B, N, K]`` and
the edge distances, fully vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.utils.ops import get_distance_matrix


def default_k_sparse(num_nodes: int) -> int:
    """Reference default: k = max(n // 5, 10), capped at n-1
    (`edge.py:73-80`)."""
    return min(max(num_nodes // 5, 10), num_nodes - 1)


def knn_edges(locs: jax.Array, k: int):
    """locs [B, N, 2] -> (nbr_idx [B, N, K] of the K nearest other nodes,
    dist [B, N, K])."""
    dm = get_distance_matrix(locs)  # [B, N, N]
    n = dm.shape[-1]
    dm_self = dm + jnp.eye(n) * 1e9  # exclude self-loops
    neg_dist, idx = jax.lax.top_k(-dm_self, k)
    return idx.astype(jnp.int32), -neg_dist


def knn_edges_from_matrix(dm: jax.Array, k: int):
    """Cost-matrix variant (ATSP): row-wise K smallest costs."""
    n = dm.shape[-1]
    dm_self = dm + jnp.eye(n) * 1e9
    neg, idx = jax.lax.top_k(-dm_self, k)
    return idx.astype(jnp.int32), -neg


class TSPEdgeEmbedding(nn.Module):
    """Distance → edge feature (reference `edge.py:53-117`)."""

    embed_dim: int
    k_sparse: int | None = None

    @nn.compact
    def __call__(self, instance) -> tuple[jax.Array, jax.Array]:
        locs = instance["locs"]
        k = self.k_sparse or default_k_sparse(locs.shape[-2])
        nbr_idx, dist = knn_edges(locs, k)
        w = nn.Dense(self.embed_dim, name="edge_embed")(dist[..., None])
        return w, nbr_idx


class VRPEdgeEmbedding(TSPEdgeEmbedding):
    """CVRP variant: depot+customers; distances include the depot row
    (reference `edge.py:119-176`)."""

    @nn.compact
    def __call__(self, instance) -> tuple[jax.Array, jax.Array]:
        locs = jnp.concatenate(
            [instance["depot"][:, None, :], instance["locs"]], axis=-2
        )
        k = self.k_sparse or default_k_sparse(locs.shape[-2])
        nbr_idx, dist = knn_edges(locs, k)
        w = nn.Dense(self.embed_dim, name="edge_embed")(dist[..., None])
        return w, nbr_idx


class ATSPEdgeEmbedding(nn.Module):
    """Cost-matrix rows (reference `edge.py:243-253`)."""

    embed_dim: int
    k_sparse: int | None = None

    @nn.compact
    def __call__(self, instance) -> tuple[jax.Array, jax.Array]:
        dm = instance["cost_matrix"]
        k = self.k_sparse or default_k_sparse(dm.shape[-1])
        nbr_idx, dist = knn_edges_from_matrix(dm, k)
        w = nn.Dense(self.embed_dim, name="edge_embed")(dist[..., None])
        return w, nbr_idx


EDGE_EMBEDDING_REGISTRY: dict[str, type] = {
    "tsp": TSPEdgeEmbedding,
    "shpp": TSPEdgeEmbedding,
    "cvrp": VRPEdgeEmbedding,
    "op": VRPEdgeEmbedding,
    "pctsp": VRPEdgeEmbedding,
    "spctsp": VRPEdgeEmbedding,
    "atsp": ATSPEdgeEmbedding,
}


def env_edge_embedding(env_name: str, embed_dim: int, **kwargs) -> nn.Module:
    cls = EDGE_EMBEDDING_REGISTRY.get(env_name)
    if cls is None:
        raise ValueError(
            f"No edge embedding for env '{env_name}'. Available: {sorted(EDGE_EMBEDDING_REGISTRY)}"
        )
    return cls(embed_dim=embed_dim, **kwargs)
