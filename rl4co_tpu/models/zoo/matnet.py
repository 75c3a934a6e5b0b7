"""MatNet (Kwon et al. 2021) — matrix-encoding attention model (ATSP).

Reference `rl4co/models/zoo/matnet/{encoder,decoder,policy}.py`:
- dual row/col embeddings updated by cross-attention whose scores are mixed
  with the problem's cost matrix through a tiny per-head 2-layer MLP
  (`MixedScoresSDPA`, `matnet/encoder.py:10-89`) — flagged in SURVEY.md
  §2.6b as a fused-kernel candidate;
- decoder = AM decoder with K/V/logit-K from column embeddings and context
  queries from row embeddings (`matnet/decoder.py:24-46`).

Note: the reference's column init is a randomly shuffled one-hot
(`init.py:71-112`); here the deterministic one-hot is used (the shuffle only
breaks symmetry between identical instances in a batch).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.models.nn.ops import Normalization
from rl4co_tpu.models.policies.constructive import PrecomputedCache
from rl4co_tpu.models.zoo.am import AttentionModelPolicy


class MixedScoresAttention(nn.Module):
    """Cross-attention with cost-matrix score mixing (reference
    `matnet/encoder.py:10-89`)."""

    embed_dim: int
    num_heads: int = 16
    mixer_hidden_dim: int = 16
    num_scores: int = 1

    @nn.compact
    def __call__(self, q_input, kv_input, dmat):
        h, d = self.num_heads, self.embed_dim
        hd = d // h
        mix1_init = 0.5**0.5
        mix2_init = (1 / 16) ** 0.5

        q = nn.Dense(d, use_bias=False, name="Wq")(q_input)
        kv = nn.Dense(2 * d, use_bias=False, name="Wkv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(x):  # [B, S, D] -> [B, H, S, hd]
            return x.reshape(*x.shape[:-1], h, hd).swapaxes(-2, -3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhmd,bhnd->bhmn", q, k) / jnp.sqrt(jnp.asarray(hd, q.dtype))

        # per-head mixing MLP over (attention score, cost entry)
        mix_w1 = self.param(
            "mix_W1", nn.initializers.uniform(2 * mix1_init),
            (h, self.num_scores + 1, self.mixer_hidden_dim),
        ) - mix1_init
        mix_b1 = self.param(
            "mix_b1", nn.initializers.uniform(2 * mix1_init),
            (h, self.mixer_hidden_dim),
        ) - mix1_init
        mix_w2 = self.param(
            "mix_W2", nn.initializers.uniform(2 * mix2_init),
            (h, self.mixer_hidden_dim, 1),
        ) - mix2_init
        mix_b2 = self.param(
            "mix_b2", nn.initializers.uniform(2 * mix2_init), (h, 1)
        ) - mix2_init

        feats = jnp.stack(
            [scores, jnp.broadcast_to(dmat[:, None], scores.shape)], axis=-1
        )  # [B, H, M, N, 2]
        hmix = jax.nn.relu(
            jnp.einsum("bhmns,hsk->bhmnk", feats, mix_w1) + mix_b1[None, :, None, None, :]
        )
        mixed = (
            jnp.einsum("bhmnk,hko->bhmno", hmix, mix_w2) + mix_b2[None, :, None, None, :]
        )[..., 0]

        weights = jax.nn.softmax(mixed, axis=-1)
        out = jnp.einsum("bhmn,bhnd->bhmd", weights, v)
        out = out.swapaxes(-2, -3).reshape(*q_input.shape[:-1], d)
        return nn.Dense(d, use_bias=False, name="out_proj")(out)


class MatNetLayer(nn.Module):
    """Row↔col update block (reference `matnet/encoder.py:110-171`)."""

    embed_dim: int
    num_heads: int = 16
    feedforward_hidden: int = 512
    normalization: str = "instance"

    @nn.compact
    def __call__(self, row_emb, col_emb, dmat):
        row_out = MixedScoresAttention(
            self.embed_dim, self.num_heads, name="row_block"
        )(row_emb, col_emb, dmat)
        col_out = MixedScoresAttention(
            self.embed_dim, self.num_heads, name="col_block"
        )(col_emb, row_emb, dmat.swapaxes(-2, -1))

        def ffn_block(x_new, x_old, name):
            hnorm = Normalization(self.normalization, name=f"{name}_norm1")(x_new + x_old)
            f = nn.Dense(self.feedforward_hidden, name=f"{name}_ff1")(hnorm)
            f = jax.nn.relu(f)
            f = nn.Dense(self.embed_dim, name=f"{name}_ff2")(f)
            return Normalization(self.normalization, name=f"{name}_norm2")(hnorm + f)

        row_emb = ffn_block(row_out, row_emb, "F_a")
        col_emb = ffn_block(col_out, col_emb, "F_b")
        return row_emb, col_emb


class MatNetPolicy(AttentionModelPolicy):
    """MatNet policy for ATSP (reference `matnet/policy.py:26-70`:
    embed 256, 16 heads, 5 layers, instance norm)."""

    env_name: str = "atsp"
    embed_dim: int = 256
    num_heads: int = 16
    num_encoder_layers: int = 5
    normalization: str = "instance"
    use_graph_context: bool = False

    def setup(self):
        self.matnet_layers = [
            MatNetLayer(
                self.embed_dim, self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                name=f"matnet_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        from rl4co_tpu.models.nn.env_embeddings.context import TSPContext

        self.context_embedding = TSPContext(self.embed_dim)
        self.project_node_embeddings = nn.Dense(3 * self.embed_dim, use_bias=False)
        self.project_fixed_context = nn.Dense(self.embed_dim, use_bias=False)
        self.pointer = self._make_pointer()
        self._dynamic_is_static = True

    def encode(self, instances) -> Any:
        dmat = instances["cost_matrix"]
        b, n, _ = dmat.shape
        row_emb = jnp.zeros((b, n, self.embed_dim))
        # deterministic one-hot column seed (see module docstring)
        col_emb = jnp.broadcast_to(
            jnp.eye(n, self.embed_dim)[None], (b, n, self.embed_dim)
        )
        for layer in self.matnet_layers:
            row_emb, col_emb = layer(row_emb, col_emb, dmat)
        return row_emb, col_emb

    def precompute(self, embeddings) -> PrecomputedCache:
        row_emb, col_emb = embeddings
        proj = self.project_node_embeddings(col_emb)
        gk, gv, lk = jnp.split(proj, 3, axis=-1)
        if self.use_graph_context:
            graph_context = self.project_fixed_context(col_emb.mean(axis=-2))
        else:
            graph_context = jnp.float32(0.0)
        return PrecomputedCache(
            node_embeddings=row_emb,  # queries gather from row embeddings
            graph_context=graph_context,
            glimpse_key=gk,
            glimpse_val=gv,
            logit_key=lk,
        )


def MatNet(env, policy: MatNetPolicy | None = None, policy_kwargs: dict | None = None, **kwargs):
    """MatNet model (reference `zoo/matnet/model.py`): mixed-score dual
    attention policy + POMO-style multistart REINFORCE with shared baseline.
    Returns a `POMO` algo."""
    from rl4co_tpu.models.zoo.pomo import POMO

    if policy is None:
        policy = MatNetPolicy(env_name=env.name, **(policy_kwargs or {}))
    return POMO(env=env, policy=policy, num_augment=1, **kwargs)
