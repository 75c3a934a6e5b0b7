"""Context (decoder-query) modules per environment.

Reference: registry `rl4co/models/nn/env_embeddings/context.py:9-47` and
`EnvContext` base (`context.py:50-76`): the decode-step query is
``project_context(cat(current_node_embedding, state_embedding))``.

Modules here consume ``(node_embs [B, N, D], state)`` where ``state`` is the
batched env state pytree; all "is it the first step" logic is `jnp.where`
(traceable inside `lax.scan`), not Python branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.utils.ops import gather_by_index


class TSPContext(nn.Module):
    """first+current node embeddings; W_placeholder before the first step
    (reference `context.py:105-135`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        w_placeholder = self.param(
            "W_placeholder",
            nn.initializers.uniform(scale=2.0),  # ~U(0,2) shifted below to U(-1,1)
            (2 * self.embed_dim,),
        ) - 1.0
        first = gather_by_index(embeddings, state.first_node)   # [B, D]
        cur = gather_by_index(embeddings, state.current_node)   # [B, D]
        ctx = jnp.concatenate([first, cur], axis=-1)            # [B, 2D]
        is_first = (state.i < 1)[:, None]
        ctx = jnp.where(is_first, w_placeholder[None, :], ctx)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class VRPContext(nn.Module):
    """current node embedding + remaining capacity (reference `context.py:137-148`)."""

    embed_dim: int
    vehicle_capacity: float = 1.0

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        remaining = (self.vehicle_capacity - state.used_capacity)[:, None]
        ctx = jnp.concatenate([cur, remaining], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class OPContext(nn.Module):
    """current node embedding + remaining length budget
    (reference `context.py:201-214`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        remaining = (state.max_length[:, 0] - state.tour_length)[:, None]
        ctx = jnp.concatenate([cur, remaining.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class PCTSPContext(nn.Module):
    """current node embedding + clamped remaining required prize
    (reference `context.py:184-199`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        remaining = jnp.maximum(state.prize_required - state.cur_total_prize, 0.0)[:, None]
        ctx = jnp.concatenate([cur, remaining.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class VRPTWContext(nn.Module):
    """current node embedding + (remaining capacity, current time)
    (reference `context.py:151-167`)."""

    embed_dim: int
    vehicle_capacity: float = 1.0

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        remaining = (self.vehicle_capacity - state.used_capacity)[:, None]
        t = state.current_time[:, None]
        ctx = jnp.concatenate(
            [cur, remaining.astype(cur.dtype), t.astype(cur.dtype)], axis=-1
        )
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class PDPContext(nn.Module):
    """current node embedding only (reference `context.py:287-297`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(cur)


class MPDPContext(nn.Module):
    """mPDP: current node embedding + (agents remaining fraction, current
    agent tour length, max tour length so far) — equity-aware stats in the
    spirit of the Equity-Transformer objective."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        a = state.lengths.shape[-1]
        cur_len = jnp.take_along_axis(
            state.lengths, jnp.clip(state.count_depot, 0, a - 1)[:, None], axis=-1
        )[:, 0]
        feats = jnp.stack(
            [
                (a - 1 - state.count_depot).astype(jnp.float32) / a,
                cur_len.astype(jnp.float32),
                state.lengths.max(axis=-1).astype(jnp.float32),
            ],
            axis=-1,
        )
        ctx = jnp.concatenate([cur, feats.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class MDCPDPContext(nn.Module):
    """current node embedding + (carry, remaining capacity)
    (reference `context.py:302-320`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        cap = jnp.take_along_axis(
            state.capacity, state.current_depot[:, None], axis=-1
        )[:, 0]
        feats = jnp.stack(
            [state.current_carry.astype(jnp.float32),
             (cap - state.current_carry).astype(jnp.float32)],
            axis=-1,
        )
        ctx = jnp.concatenate([cur, feats.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class MTSPContext(nn.Module):
    """current node embedding + projected dynamic features
    (remaining agents, current length, max subtour length, distance from
    depot; reference `context.py:246-285`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        cur_loc = gather_by_index(state.locs, state.current_node)
        dist_depot = jnp.linalg.norm(cur_loc - state.locs[:, 0], axis=-1)
        feats = jnp.stack(
            [
                (state.num_agents - state.agent_idx).astype(jnp.float32),
                state.current_length,
                state.max_subtour_length,
                dist_depot,
            ],
            axis=-1,
        )
        feats_emb = nn.Dense(self.embed_dim, use_bias=False, name="proj_dynamic_feats")(
            feats.astype(cur.dtype)
        )
        ctx = jnp.concatenate([cur, feats_emb], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class MTVRPContext(nn.Module):
    """current node embedding + (remaining linehaul/backhaul capacity,
    current time, route length, open flag) (reference `context.py:359-388`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        feats = jnp.stack(
            [
                1.0 - state.used_capacity_linehaul,
                1.0 - state.used_capacity_backhaul,
                state.current_time,
                state.current_route_length,
                state.open_route.astype(jnp.float32),
            ],
            axis=-1,
        )
        ctx = jnp.concatenate([cur, feats.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class DPPContext(nn.Module):
    """Zero context (state captured via placements; reference `context.py:216-231`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        return jnp.zeros(
            (embeddings.shape[0], self.embed_dim), dtype=embeddings.dtype
        )


class SVRPContext(nn.Module):
    """current node embedding only (reference `context.py:169-191`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_node)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(cur)


class SMTWTPContext(nn.Module):
    """current job embedding + current time (reference `context.py:283-299`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur = gather_by_index(embeddings, state.current_job)
        t = state.current_time[:, None]
        ctx = jnp.concatenate([cur, t.astype(cur.dtype)], axis=-1)
        return nn.Dense(self.embed_dim, use_bias=False, name="project_context")(ctx)


class FLPContext(nn.Module):
    """Softmax-weighted pooling by per-candidate distance improvement
    (reference `context.py:391-407`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        cur_dist = state.distances[:, None, :]  # [B, 1, N]
        improve = jnp.clip(cur_dist - state.orig_distances, 0.0).sum(-1)  # [B, N]
        soft = jax.nn.softmax(improve, axis=-1)
        ctx = (embeddings * soft[..., None].astype(embeddings.dtype)).sum(-2)
        return nn.Dense(self.embed_dim, use_bias=True, name="project_context")(ctx)


class MCPContext(nn.Module):
    """Softmax-weighted pooling by remaining per-set coverable weight
    (reference `context.py:410-428`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        remaining = state.weights * (~state.covered[:, 1:])  # [B, n_items]
        idx = jnp.clip(state.membership - 1, 0, remaining.shape[-1] - 1)
        gathered = jax.vmap(lambda w, i: w[i])(remaining, idx)  # [B, S, M]
        valid = state.membership > 0
        set_weight = (gathered * valid).sum(-1)  # [B, n_sets]
        set_weight = jnp.where(state.chosen, 0.0, set_weight)
        soft = jax.nn.softmax(set_weight, axis=-1)
        ctx = (embeddings * soft[..., None].astype(embeddings.dtype)).sum(-2)
        return nn.Dense(self.embed_dim, use_bias=True, name="project_context")(ctx)


CONTEXT_EMBEDDING_REGISTRY: dict[str, type] = {
    "smtwtp": SMTWTPContext,
    "svrp": SVRPContext,
    "dpp": DPPContext,
    "mdpp": DPPContext,
    "mtvrp": MTVRPContext,
    "flp": FLPContext,
    "mcp": MCPContext,
    "tsp": TSPContext,
    "shpp": TSPContext,
    "mtsp": MTSPContext,
    "cvrptw": VRPTWContext,
    "pdp": PDPContext,
    "mdcpdp": MDCPDPContext,
    "mpdp": MPDPContext,
    "cvrp": VRPContext,
    "cvrpmvc": VRPContext,
    "sdvrp": VRPContext,
    "op": OPContext,
    "pctsp": PCTSPContext,
    "spctsp": PCTSPContext,
}


def env_context_embedding(env_name: str, embed_dim: int, **kwargs) -> nn.Module:
    cls = CONTEXT_EMBEDDING_REGISTRY.get(env_name)
    if cls is None:
        raise ValueError(
            f"No context embedding for env '{env_name}'. Available: {sorted(CONTEXT_EMBEDDING_REGISTRY)}"
        )
    return cls(embed_dim=embed_dim, **kwargs)
