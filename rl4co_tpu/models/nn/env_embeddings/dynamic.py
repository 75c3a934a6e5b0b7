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


class JSSPDynamicEmbedding(nn.Module):
    """Scheduling K/V/logit-K deltas for L2DAttnPolicy (reference
    `dynamic.py:81-117` ``JSSPDynamicEmbedding``).

    Unlike the routing dynamic embeddings this one needs the *encoder's
    machine embeddings* (the reference reads them from the decoder cache),
    so it is consumed by `rl4co_tpu.models.zoo.l2d.L2DAttnPolicy` rather
    than the generic AM decoder registry. Per decode step, each job node's
    K/V/logit-K get two additive updates:

    - a node term from (remaining lower bound, readiness) of the job's next op,
    - an edge term mixing the op's (busy-machine-masked) processing times
      with the machine embeddings.
    """

    embed_dim: int
    scaling_factor: float = 1000.0

    @nn.compact
    def __call__(self, state, ma_emb, lbs, is_ready):
        # state: batched FJSPState; ma_emb [B, M, D]; lbs/is_ready [B, O]
        d = self.embed_dim
        lbs_c = jnp.clip(lbs - state.time[:, None], 0.0) / self.scaling_factor
        update_feat = jnp.stack([lbs_c, is_ready.astype(jnp.float32)], axis=-1)
        job_feat = jnp.take_along_axis(update_feat, state.next_op[..., None], axis=1)
        updates = nn.Dense(3 * d, use_bias=False, name="project_node_step")(job_feat)

        ma_busy = state.busy_until > state.time[:, None]  # [B, M]
        masked_proc = jnp.where(
            ma_busy[:, :, None], 0.0, state.proc_times / self.scaling_factor
        ).swapaxes(-1, -2)  # [B, O, M]
        edge_feat = nn.Dense(3, use_bias=False, name="project_edge_step")(
            masked_proc[..., None]
        )  # [B, O, M, 3]
        job_edge = jnp.take_along_axis(
            edge_feat, state.next_op[..., None, None], axis=1
        )  # [B, J, M, 3]
        edge_upd = jnp.einsum("bjms,bmd->bjsd", job_edge, ma_emb)
        updates = updates + edge_upd.reshape(*edge_upd.shape[:-2], 3 * d)
        return tuple(jnp.split(updates, 3, axis=-1))


DYNAMIC_EMBEDDING_REGISTRY: dict[str, type] = {
    "sdvrp": SDVRPDynamicEmbedding,
}


def env_dynamic_embedding(env_name: str, embed_dim: int, **kwargs) -> nn.Module:
    cls = DYNAMIC_EMBEDDING_REGISTRY.get(env_name, StaticEmbedding)
    return cls(embed_dim=embed_dim, **kwargs)
