"""Attention Model policy (Kool et al. 2019).

TPU-native re-design of `rl4co/models/zoo/am/{policy,encoder,decoder}.py`:
encoder = init embedding + graph attention stack (`zoo/am/encoder.py:70-87`);
decoder precomputes glimpse K/V + logit K + graph context once per instance
(`zoo/am/decoder.py:201-228`), then each decode step is context-embedding →
pointer attention (`zoo/am/decoder.py:156-193`). The rollout loop itself
lives in `rl4co_tpu/models/policies/constructive.py` as a `lax.scan`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.attention import PointerAttention
from rl4co_tpu.models.nn.env_embeddings import (
    env_context_embedding,
    env_dynamic_embedding,
    env_init_embedding,
)
from rl4co_tpu.models.nn.env_embeddings.dynamic import StaticEmbedding
from rl4co_tpu.models.nn.graph.attnnet import GraphAttentionNetwork
from rl4co_tpu.models.policies.constructive import ConstructivePolicy, PrecomputedCache


class AttentionModelPolicy(ConstructivePolicy):
    """AM encoder/decoder policy.

    Defaults match the reference (`zoo/am/policy.py:54-73`): embed 128,
    3 encoder layers, 8 heads, ff 512, batch norm, graph context on.
    """

    env_name: str = "tsp"
    embed_dim: int = 128
    num_encoder_layers: int = 3
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "batch"
    use_graph_context: bool = True
    mask_inner: bool = True
    pointer_impl: str = "xla"  # "pallas" fuses the decode step kernel
    init_embedding_kwargs: Any = None
    context_embedding_kwargs: Any = None

    def setup(self):
        self.init_embedding = env_init_embedding(
            self.env_name, self.embed_dim, **(self.init_embedding_kwargs or {})
        )
        self.encoder_net = GraphAttentionNetwork(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_layers=self.num_encoder_layers,
            normalization=self.normalization,
            feedforward_hidden=self.feedforward_hidden,
        )
        self.context_embedding = env_context_embedding(
            self.env_name, self.embed_dim, **(self.context_embedding_kwargs or {})
        )
        self.dynamic_embedding = env_dynamic_embedding(self.env_name, self.embed_dim)
        self._dynamic_is_static = (
            self.env_name not in ("sdvrp",)
        )
        # Precompute projections (reference `zoo/am/decoder.py:60-72`)
        self.project_node_embeddings = nn.Dense(3 * self.embed_dim, use_bias=False)
        self.project_fixed_context = nn.Dense(self.embed_dim, use_bias=False)
        self.pointer = self._make_pointer()

    def _make_pointer(self):
        """Factory for the pointer head — overridden by PolyNet / MVMoE."""
        return PointerAttention(
            self.embed_dim, self.num_heads, mask_inner=self.mask_inner,
            impl=self.pointer_impl,
        )

    def init_embed(self, instances) -> jax.Array:
        """Pre-encoder initial embeddings (exposed for SymNCO's invariance loss)."""
        return self.init_embedding(instances)

    def encode(self, instances) -> jax.Array:
        return self.encoder_net(self.init_embed(instances))

    def precompute(self, embeddings: jax.Array) -> PrecomputedCache:
        proj = self.project_node_embeddings(embeddings)
        glimpse_k, glimpse_v, logit_k = jnp.split(proj, 3, axis=-1)
        if self.use_graph_context:
            graph_context = self.project_fixed_context(embeddings.mean(axis=-2))
        else:
            graph_context = jnp.float32(0.0)
        return PrecomputedCache(
            node_embeddings=embeddings,
            graph_context=graph_context,
            glimpse_key=glimpse_k,
            glimpse_val=glimpse_v,
            logit_key=logit_k,
        )

    def decode_step(self, cache: PrecomputedCache, state, mask, num_repeats: int = 1) -> jax.Array:
        """One decode step.

        With ``num_repeats == g > 1`` the cache stays *untiled* ``[B, ...]``
        while the state/mask are flat ``[g*B, ...]`` (repeat-major): the g
        starts/samples of an instance become a query axis sharing one K/V
        load (see `pointer_logits`). Falls back to the flat path when the
        env has dynamic embeddings (per-state K/V updates).
        """
        gk, gv, lk = cache.glimpse_key, cache.glimpse_val, cache.logit_key
        if num_repeats == 1:
            query = self.context_embedding(cache.node_embeddings, state)
            query = query + cache.graph_context
            if not self._dynamic_is_static:
                dk, dv, dl = self.dynamic_embedding(state)
                gk, gv, lk = gk + dk, gv + dv, lk + dl
            return self.pointer(query, gk, gv, lk, mask)

        assert self._dynamic_is_static, "grouped decode requires static embeddings"
        g = num_repeats
        b, n, d = cache.node_embeddings.shape
        # broadcast view for per-state gathers (fuses; never materialized)
        embs_view = jnp.broadcast_to(
            cache.node_embeddings[None], (g, b, n, d)
        ).reshape(g * b, n, d)
        query = self.context_embedding(embs_view, state)  # [g*B, D]
        if self.use_graph_context:
            query = query + jnp.tile(cache.graph_context, (g, 1))
        query_g = query.reshape(g, b, d).transpose(1, 0, 2)      # [B, g, D]
        mask_g = mask.reshape(g, b, n).transpose(1, 0, 2)        # [B, g, N]
        logits = self.pointer(query_g, gk, gv, lk, mask_g)       # [B, g, N]
        return logits.transpose(1, 0, 2).reshape(g * b, n)


def AttentionModel(
    env,
    policy: AttentionModelPolicy | None = None,
    baseline="rollout",
    policy_kwargs: dict | None = None,
    **kwargs,
):
    """The Attention Model (Kool et al. 2019): AM policy + REINFORCE with a
    greedy rollout baseline (reference `zoo/am/model.py:8-32`). Convenience
    constructor mirroring the reference class; returns a `REINFORCE` algo.
    """
    from rl4co_tpu.rl.reinforce import REINFORCE

    if policy is None:
        policy = AttentionModelPolicy(env_name=env.name, **(policy_kwargs or {}))
    return REINFORCE(env=env, policy=policy, baseline=baseline, **kwargs)


def AMPPO(
    env,
    policy: AttentionModelPolicy | None = None,
    policy_kwargs: dict | None = None,
    **kwargs,
):
    """AM policy trained with PPO + shared critic (reference
    `zoo/amppo/model.py:14-60`). Returns a `PPO` algo with an auto-created
    critic."""
    from rl4co_tpu.rl.ppo import PPO

    if policy is None:
        policy = AttentionModelPolicy(env_name=env.name, **(policy_kwargs or {}))
    return PPO(env=env, policy=policy, **kwargs)
