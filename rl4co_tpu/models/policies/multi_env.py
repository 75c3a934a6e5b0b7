"""Multi-environment policy: one shared trunk, per-env embeddings.

BASELINE.json's mixed-env config (OP + PCTSP interleaved) needs a policy
that trains across environments with swapped embeddings. The reference has
no such mechanism; the natural TPU design is: a single parameter pytree
containing every env's init/context/dynamic embedding modules plus one
shared encoder/decoder trunk, and one jitted train step *per env* (XLA
specializes each env's shapes/mask logic; params are shared across all of
them, so gradients from interleaved batches update the same trunk).

Swapping envs is free at runtime: ``policy.for_env(name)`` returns a view
of the same module with a different active embedding set — applied against
the SAME params (flax ignores unused param subtrees).
"""

from __future__ import annotations

from typing import Any

import jax

from rl4co_tpu.models.nn.env_embeddings.context import env_context_embedding
from rl4co_tpu.models.nn.env_embeddings.dynamic import (
    DYNAMIC_EMBEDDING_REGISTRY,
    env_dynamic_embedding,
)
from rl4co_tpu.models.nn.env_embeddings.init import env_init_embedding
from rl4co_tpu.models.zoo.am import AttentionModelPolicy


class MultiEnvAttentionPolicy(AttentionModelPolicy):
    """AM policy with per-env embeddings and a shared encoder/pointer trunk.

    ``env_name`` selects the *active* env; ``env_names`` fixes the full set
    (and therefore the parameter structure). Initialize params with
    ``init_multi_env_params`` so every env's embedding params exist.
    """

    env_names: tuple = ("op", "pctsp")

    def setup(self):
        assert self.env_name in self.env_names, (
            f"active env {self.env_name!r} not in {self.env_names}"
        )
        d = self.embed_dim
        # name submodules by env so the param tree is stable across actives
        self.init_embeddings = {
            n: env_init_embedding(n, d, **(self.init_embedding_kwargs or {}))
            for n in self.env_names
        }
        self.context_embeddings = {
            n: env_context_embedding(n, d, **(self.context_embedding_kwargs or {}))
            for n in self.env_names
        }
        self.dynamic_embeddings = {
            n: env_dynamic_embedding(n, d) for n in self.env_names
        }
        from flax import linen as nn

        from rl4co_tpu.models.nn.graph.attnnet import GraphAttentionNetwork

        self.encoder_net = GraphAttentionNetwork(
            embed_dim=d,
            num_heads=self.num_heads,
            num_layers=self.num_encoder_layers,
            normalization=self.normalization,
            feedforward_hidden=self.feedforward_hidden,
        )
        self.init_embedding = self.init_embeddings[self.env_name]
        self.context_embedding = self.context_embeddings[self.env_name]
        self.dynamic_embedding = self.dynamic_embeddings[self.env_name]
        self._dynamic_is_static = self.env_name not in DYNAMIC_EMBEDDING_REGISTRY
        self.project_node_embeddings = nn.Dense(3 * self.embed_dim, use_bias=False)
        self.project_fixed_context = nn.Dense(self.embed_dim, use_bias=False)
        self.pointer = self._make_pointer()

    def for_env(self, name: str) -> "MultiEnvAttentionPolicy":
        """Same trunk/params, different active embeddings."""
        return self.clone(env_name=name)

    def _encode_trunk(self, h: jax.Array) -> jax.Array:
        """Shared-trunk encoder pass — hook for the MoE variant."""
        return self.encoder_net(h)

    def encode(self, instances) -> jax.Array:
        return self._encode_trunk(self.init_embed(instances))

    def touch_all(self, batches: dict, states: dict, masks: dict):
        """Run one encode+decode step for EVERY env — creates the full param
        tree at init time (flax creates params lazily on first use)."""
        out = 0.0
        for name in self.env_names:
            emb = self._encode_trunk(self.init_embeddings[name](batches[name]))
            proj = self.project_node_embeddings(emb)
            import jax.numpy as jnp

            gk, gv, lk = jnp.split(proj, 3, axis=-1)
            graph_ctx = self.project_fixed_context(emb.mean(axis=-2))
            q = self.context_embeddings[name](emb, states[name]) + graph_ctx
            if name in DYNAMIC_EMBEDDING_REGISTRY:
                dk, dv, dl = self.dynamic_embeddings[name](states[name])
                gk, gv, lk = gk + dk, gv + dv, lk + dl
            logits = self.pointer(q, gk, gv, lk, masks[name])
            out = out + logits.sum()
        return out


def init_multi_env_params(policy: MultiEnvAttentionPolicy, envs: dict, key: jax.Array):
    """Initialize the full multi-env param tree.

    ``envs``: ``{name: Env}`` covering ``policy.env_names``.
    """
    kgen, kinit = jax.random.split(key)
    batches, states, masks = {}, {}, {}
    for i, (name, env) in enumerate(envs.items()):
        b = env.generate_batch(jax.random.fold_in(kgen, i), 2)
        s = env.reset_batch(b)
        batches[name], states[name] = b, s
        masks[name] = env.action_mask_batch(s)
    return policy.init(kinit, batches, states, masks, method="touch_all")


class MultiEnvMoEPolicy(MultiEnvAttentionPolicy):
    """Multi-env policy with an MVMoE-style mixture-of-experts trunk.

    The remedy experiment for the round-4 multi-task-interference finding
    (VERDICT r4 #5, `runs/mixed_vs_single.json`): the shared dense trunk is
    replaced by MoE encoder layers + an MoE pointer projection (reference
    MVMoE, `rl4co/models/zoo/mvmoe/model.py:14-74`, built for exactly this
    multi-task VRP setting) so capacity can route per-task while embeddings
    stay per-env and everything else is unchanged.
    """

    num_experts: int = 4
    moe_topk: int = 2

    def setup(self):
        # NOTE super().setup() also constructs the dense encoder_net module
        # object; it is never CALLED here (_encode_trunk overrides it), so
        # flax never creates its params — touching policy.encoder_net on an
        # MoE policy fails loudly with a missing-param error rather than
        # silently running an untrained trunk.
        super().setup()
        from rl4co_tpu.models.zoo.mvmoe import MoEAttentionLayer

        self.moe_layers = [
            MoEAttentionLayer(
                self.embed_dim,
                self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                num_experts=self.num_experts,
                topk=self.moe_topk,
                name=f"moe_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]

    def _make_pointer(self):
        from rl4co_tpu.models.zoo.mvmoe import PointerAttnMoE

        return PointerAttnMoE(
            self.embed_dim,
            self.num_heads,
            mask_inner=self.mask_inner,
            num_experts=self.num_experts,
            topk=self.moe_topk,
        )

    def _encode_trunk(self, h: jax.Array) -> jax.Array:
        for layer in self.moe_layers:
            h = layer(h)
        return h
