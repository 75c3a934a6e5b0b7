"""MVMoE (Zhou et al. 2024) — multi-task VRP solver with Mixture-of-Experts.

Reference `rl4co/models/zoo/mvmoe/model.py:14-74`: AM/POMO policy whose
encoder FFNs and decoder output projection are MoE layers
(`rl4co/models/nn/attention.py:323-382` `PointerAttnMoE`,
`nn/moe.py`). Typically trained on the MTVRP env with POMO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.attention import MultiHeadAttention, pointer_logits
from rl4co_tpu.models.nn.moe import MoE
from rl4co_tpu.models.nn.ops import Normalization
from rl4co_tpu.models.zoo.am import AttentionModelPolicy


class MoEAttentionLayer(nn.Module):
    """Encoder layer with an MoE feed-forward (reference `attnnet.py:16-54`
    with ``moe_kwargs``)."""

    embed_dim: int
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "instance"
    num_experts: int = 4
    topk: int = 2

    @nn.compact
    def __call__(self, x, mask=None):
        h = x + MultiHeadAttention(self.embed_dim, self.num_heads, name="mha")(x, mask)
        h = Normalization(self.normalization, name="norm1")(h)
        ffn = MoE(
            self.embed_dim,
            (self.feedforward_hidden,),
            num_experts=self.num_experts,
            k=self.topk,
            name="moe_ffn",
        )
        h = h + ffn(h)
        return Normalization(self.normalization, name="norm2")(h)


class PointerAttnMoE(nn.Module):
    """Pointer attention with MoE output projection
    (reference `attention.py:323-382`)."""

    embed_dim: int
    num_heads: int = 8
    mask_inner: bool = True
    num_experts: int = 4
    topk: int = 2

    @nn.compact
    def __call__(self, query, glimpse_k, glimpse_v, logit_k, mask):
        single = query.ndim == 2
        if single:
            query = query[:, None, :]
            mask = mask[:, None, :]
        project_out = MoE(
            self.embed_dim, (), num_experts=self.num_experts, k=self.topk,
            name="project_out_moe",
        )
        logits = pointer_logits(
            query, glimpse_k, glimpse_v, logit_k, mask,
            num_heads=self.num_heads,
            project_out=project_out,
            mask_inner=self.mask_inner,
        )
        return logits[:, 0, :] if single else logits


class MVMoEPolicy(AttentionModelPolicy):
    """AM/POMO policy with MoE encoder FFNs + MoE pointer projection."""

    num_experts: int = 4
    moe_topk: int = 2

    def _make_pointer(self):
        return PointerAttnMoE(
            self.embed_dim,
            self.num_heads,
            mask_inner=self.mask_inner,
            num_experts=self.num_experts,
            topk=self.moe_topk,
        )

    def setup(self):
        super().setup()
        # swap encoder layers for MoE variants
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

    def encode(self, instances) -> jax.Array:
        h = self.init_embed(instances)
        for layer in self.moe_layers:
            h = layer(h)
        return h


def MVMoE_AM(env, policy: "MVMoEPolicy | None" = None, policy_kwargs: dict | None = None, **kwargs):
    """MVMoE with AM-style training (reference `zoo/mvmoe/model.py:14-70`):
    MoE policy + REINFORCE rollout baseline."""
    from rl4co_tpu.rl.reinforce import REINFORCE

    if policy is None:
        policy = MVMoEPolicy(env_name=env.name, **(policy_kwargs or {}))
    return REINFORCE(env=env, policy=policy, **kwargs)


def MVMoE_POMO(env, policy: "MVMoEPolicy | None" = None, policy_kwargs: dict | None = None, **kwargs):
    """MVMoE with POMO-style training (reference `zoo/mvmoe/model.py:74-120`):
    MoE policy + multistart shared-baseline REINFORCE."""
    from rl4co_tpu.models.zoo.pomo import POMO

    if policy is None:
        pk = dict(num_encoder_layers=6, normalization="instance",
                  use_graph_context=False)
        pk.update(policy_kwargs or {})
        policy = MVMoEPolicy(env_name=env.name, **pk)
    return POMO(env=env, policy=policy, **kwargs)
