"""HAM — Heterogeneous Attention Model for PDP (Li et al. 2021).

Reference `rl4co/models/zoo/ham/{attention,encoder,policy}.py`: encoder
self-attention augmented with six relation-specific attention channels
(pickup→paired delivery, pickup→all pickups, pickup→all deliveries,
delivery→paired pickup, delivery→all deliveries, delivery→all pickups),
appended as extra key columns in one extended softmax
(`ham/attention.py:7-486`). Decoder = standard AM pointer on the PDP
context.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.ops import Normalization, TransformerFFN
from rl4co_tpu.models.zoo.am import AttentionModelPolicy

NEG = -1e9


class HeterogeneousMHA(nn.Module):
    """Extended-softmax heterogeneous attention (`ham/attention.py:53-486`).

    Node layout: [depot, n_pick pickups, n_pick deliveries] (graph size odd).
    """

    embed_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        b, g, d = h.shape
        assert g % 2 == 1, "HAM requires odd graph size (depot + pairs)"
        n_pick = (g - 1) // 2
        hn = self.num_heads
        hd = d // hn
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, h.dtype))

        def proj(x, name):
            y = nn.Dense(d, use_bias=False, name=name)(x)
            return y.reshape(*x.shape[:-1], hn, hd).swapaxes(-2, -3)  # [..., H, S, hd]

        q = proj(h, "W_query")
        k = proj(h, "W_key")
        v = proj(h, "W_val")
        pick = h[:, 1 : n_pick + 1]
        delivery = h[:, n_pick + 1 :]

        # relation channels reuse the shared K/V projections (as reference)
        k_pick = k[:, :, 1 : n_pick + 1]
        k_del = k[:, :, n_pick + 1 :]
        v_pick = v[:, :, 1 : n_pick + 1]
        v_del = v[:, :, n_pick + 1 :]

        q1 = proj(pick, "W1_query")   # pickup -> its delivery
        q2 = proj(pick, "W2_query")   # pickup -> all pickups
        q3 = proj(pick, "W3_query")   # pickup -> all deliveries
        q4 = proj(delivery, "W4_query")  # delivery -> its pickup
        q5 = proj(delivery, "W5_query")  # delivery -> all deliveries
        q6 = proj(delivery, "W6_query")  # delivery -> all pickups

        compat = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale  # [B,H,G,G]

        def pad_rows(x, row_kind):
            """Place per-pickup/delivery rows into full G rows with NEG pads."""
            pads = jnp.full((b, hn, 1) + x.shape[3:], NEG, x.dtype)
            zeros_pick = jnp.full((b, hn, n_pick) + x.shape[3:], NEG, x.dtype)
            if row_kind == "pick":
                return jnp.concatenate([pads, x, zeros_pick], axis=2)
            return jnp.concatenate([pads, zeros_pick, x], axis=2)

        c_pd = (q1 * k_del).sum(-1)[..., None] * scale          # [B,H,P,1]
        c_pap = jnp.einsum("bhpd,bhkd->bhpk", q2, k_pick) * scale
        c_pad = jnp.einsum("bhpd,bhkd->bhpk", q3, k_del) * scale
        c_dp = (q4 * k_pick).sum(-1)[..., None] * scale
        c_dad = jnp.einsum("bhpd,bhkd->bhpk", q5, k_del) * scale
        c_dap = jnp.einsum("bhpd,bhkd->bhpk", q6, k_pick) * scale

        extended = jnp.concatenate(
            [
                compat,
                pad_rows(c_pd, "pick"),
                pad_rows(c_pap, "pick"),
                pad_rows(c_pad, "pick"),
                pad_rows(c_dp, "del"),
                pad_rows(c_dad, "del"),
                pad_rows(c_dap, "del"),
            ],
            axis=-1,
        )  # [B, H, G, G + 2 + 4*n_pick]
        attn = jax.nn.softmax(extended, axis=-1)

        heads = jnp.einsum("bhqk,bhkd->bhqd", attn[..., :g], v)
        # paired-delivery channel: row-aligned values [B,H,G,hd]
        zeros1 = jnp.zeros((b, hn, 1, hd), v.dtype)
        zerosP = jnp.zeros((b, hn, n_pick, hd), v.dtype)
        v_add_del = jnp.concatenate([zeros1, v_del, zerosP], axis=2)
        v_add_pick = jnp.concatenate([zeros1, zerosP, v_pick], axis=2)
        i0 = g
        heads += attn[..., i0][..., None] * v_add_del
        heads += jnp.einsum(
            "bhqk,bhkd->bhqd", attn[..., i0 + 1 : i0 + 1 + n_pick], v_pick
        )
        heads += jnp.einsum(
            "bhqk,bhkd->bhqd",
            attn[..., i0 + 1 + n_pick : i0 + 1 + 2 * n_pick], v_del,
        )
        i1 = i0 + 1 + 2 * n_pick
        heads += attn[..., i1][..., None] * v_add_pick
        heads += jnp.einsum(
            "bhqk,bhkd->bhqd", attn[..., i1 + 1 : i1 + 1 + n_pick], v_del
        )
        heads += jnp.einsum(
            "bhqk,bhkd->bhqd", attn[..., i1 + 1 + n_pick :], v_pick
        )

        merged = heads.swapaxes(-2, -3).reshape(b, g, d)
        return nn.Dense(d, use_bias=False, name="W_out")(merged)


class HAMEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "batch"

    @nn.compact
    def __call__(self, x):
        h = x + HeterogeneousMHA(self.embed_dim, self.num_heads, name="hetero_mha")(x)
        h = Normalization(self.normalization, name="norm1")(h)
        h = h + TransformerFFN(self.embed_dim, self.feedforward_hidden, name="ffn")(h)
        return Normalization(self.normalization, name="norm2")(h)


class HAMPolicy(AttentionModelPolicy):
    """AM policy with the heterogeneous encoder (reference `ham/policy.py`)."""

    env_name: str = "pdp"

    def setup(self):
        super().setup()
        self.ham_layers = [
            HAMEncoderLayer(
                self.embed_dim, self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                name=f"ham_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]

    def encode(self, instances) -> jax.Array:
        h = self.init_embed(instances)
        for layer in self.ham_layers:
            h = layer(h)
        return h


def HeterogeneousAttentionModel(
    env, policy: "HAMPolicy | None" = None, policy_kwargs: dict | None = None, **kwargs
):
    """HAM model (reference `zoo/ham/model.py:10-45`): heterogeneous-attention
    encoder policy + REINFORCE with rollout baseline on PDP."""
    from rl4co_tpu.rl.reinforce import REINFORCE

    if policy is None:
        policy = HAMPolicy(env_name=env.name, **(policy_kwargs or {}))
    return REINFORCE(env=env, policy=policy, **kwargs)


HeterogeneousAttentionModelPolicy = HAMPolicy
