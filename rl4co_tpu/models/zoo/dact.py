"""DACT — Dual-Aspect Collaborative Transformer (Ma et al. 2021).

Improvement policy for the 2-opt MDP (`rl4co_tpu/envs/routing/tsp_kopt.py`).
Reference `rl4co/models/zoo/dact/{encoder,decoder,policy}.py`:

- encoder: node-feature (NFE) and cyclic-positional (PFE) aspects updated by
  collaborative attention — each aspect attends with its own scores but also
  consumes the other aspect's attention pattern (`dact/encoder.py:17-102`);
- decoder: max-pooling refinement + dual MultiHeadCompat scores → MLP over
  2H per-pair features → N×N pair logits (`dact/decoder.py:17-97`);
- action: flattened pair (i, j) categorical with self-pairs masked and the
  previous action's pair masked out (`dact/policy.py:128-141`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec, decode_action, process_logits
from rl4co_tpu.models.nn.env_embeddings.init import TSPInitEmbedding
from rl4co_tpu.models.nn.ops import MLP, Normalization
from rl4co_tpu.models.nn.pos_embeddings import pos_init_embedding


class DACAttention(nn.Module):
    """Collaborative dual-aspect attention (reference `dact/encoder.py:17-102`)."""

    embed_dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, h_node, h_pos):
        d = self.embed_dim
        hd = d // self.num_heads

        def heads(x, name):
            y = nn.Dense(d, use_bias=False, name=name)(x)  # [B, N, D]
            return y.reshape(*y.shape[:-1], self.num_heads, hd).swapaxes(-2, -3)

        q_node = heads(h_node, "W_query_node")  # [B, H, N, hd]
        k_node = heads(h_node, "W_key_node")
        q_pos = heads(h_pos, "W_query_pos")
        k_pos = heads(h_pos, "W_key_pos")
        v_node_self = heads(h_node, "W_val_node_self")
        v_node_cross = heads(h_node, "W_val_node_cross")
        v_pos_self = heads(h_pos, "W_val_pos_self")
        v_pos_cross = heads(h_pos, "W_val_pos_cross")

        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, h_node.dtype))
        attn_node = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q_node, k_node) * scale, axis=-1
        )
        attn_pos = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q_pos, k_pos) * scale, axis=-1
        )

        def agg(attn, v):
            return jnp.einsum("bhnm,bhmd->bhnd", attn, v)

        heads_node = jnp.concatenate(
            [agg(attn_node, v_node_self), agg(attn_pos, v_node_cross)], axis=-1
        )  # [B, H, N, 2hd]
        heads_pos = jnp.concatenate(
            [agg(attn_node, v_pos_cross), agg(attn_pos, v_pos_self)], axis=-1
        )

        def merge(x):
            x = x.swapaxes(-2, -3)  # [B, N, H, 2hd]
            return x.reshape(*x.shape[:-2], -1)

        out_node = nn.Dense(d, use_bias=False, name="W_out_node")(merge(heads_node))
        out_pos = nn.Dense(d, use_bias=False, name="W_out_pos")(merge(heads_pos))
        return out_node, out_pos


class DACTEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int = 4
    feedforward_hidden: int = 64
    normalization: str = "layer"

    @nn.compact
    def __call__(self, h_node, h_pos):
        a_node, a_pos = DACAttention(self.embed_dim, self.num_heads, name="dac_att")(
            h_node, h_pos
        )
        h_node = Normalization(self.normalization, name="norm_a1")(h_node + a_node)
        h_pos = Normalization(self.normalization, name="norm_a2")(h_pos + a_pos)
        f_node = MLP(self.embed_dim, (self.feedforward_hidden,), name="ff_node")(h_node)
        f_pos = MLP(self.embed_dim, (self.feedforward_hidden,), name="ff_pos")(h_pos)
        h_node = Normalization(self.normalization, name="norm_f1")(h_node + f_node)
        h_pos = Normalization(self.normalization, name="norm_f2")(h_pos + f_pos)
        return h_node, h_pos


class DACTPolicy(nn.Module):
    """Encoder + pair decoder; `act` performs one improvement-policy step."""

    embed_dim: int = 64
    num_heads: int = 4
    num_encoder_layers: int = 3
    feedforward_hidden: int = 64
    normalization: str = "layer"
    pos_type: str = "CPE"

    def setup(self):
        self.init_embedding = TSPInitEmbedding(self.embed_dim)
        self.pos_embedding = pos_init_embedding(self.pos_type, self.embed_dim)
        self.layers = [
            DACTEncoderLayer(
                self.embed_dim, self.num_heads, self.feedforward_hidden,
                self.normalization, name=f"layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        # decoder parts (reference `dact/decoder.py:29-60`)
        self.project_graph_node = nn.Dense(self.embed_dim, use_bias=False)
        self.project_graph_pos = nn.Dense(self.embed_dim, use_bias=False)
        self.project_node_node = nn.Dense(self.embed_dim, use_bias=False)
        self.project_node_pos = nn.Dense(self.embed_dim, use_bias=False)
        self.compat_node_q = nn.Dense(self.embed_dim, use_bias=False)
        self.compat_node_k = nn.Dense(self.embed_dim, use_bias=False)
        self.compat_pos_q = nn.Dense(self.embed_dim, use_bias=False)
        self.compat_pos_k = nn.Dense(self.embed_dim, use_bias=False)
        self.value_head = MLP(1, (32, 32))

    def encode(self, state):
        h_node = self.init_embedding({"locs": state.locs})
        h_pos = self.pos_embedding(state)
        for layer in self.layers:
            h_node, h_pos = layer(h_node, h_pos)
        return h_node, h_pos

    def _compat(self, x, q_proj, k_proj):
        hd = self.embed_dim // self.num_heads
        q = q_proj(x).reshape(*x.shape[:-1], self.num_heads, hd)
        k = k_proj(x).reshape(*x.shape[:-1], self.num_heads, hd)
        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, x.dtype))
        return jnp.einsum("bnhd,bmhd->bnmh", q, k) * scale  # [B, N, N, H]

    def pair_logits(self, state) -> tuple[jax.Array, jax.Array]:
        """Returns (logits [B, N, N], embeds [B, N, 2D])."""
        nfe, pfe = self.encode(state)
        h_node = self.project_node_node(nfe) + self.project_graph_node(
            nfe.max(axis=-2)
        )[:, None, :]
        h_pos = self.project_node_pos(pfe) + self.project_graph_pos(
            pfe.max(axis=-2)
        )[:, None, :]
        compat = jnp.concatenate(
            [
                self._compat(h_pos, self.compat_pos_q, self.compat_pos_k),
                self._compat(h_node, self.compat_node_q, self.compat_node_k),
            ],
            axis=-1,
        )  # [B, N, N, 2H]
        norm_factor = 1.0 / jnp.sqrt(jnp.asarray(self.embed_dim, compat.dtype))
        logits = self.value_head(norm_factor * compat)[..., 0]
        embeds = jnp.concatenate([nfe, pfe], axis=-1)
        return logits, embeds

    def __call__(self, state):
        return self.pair_logits(state)


def dact_act(
    policy: DACTPolicy,
    params,
    state,
    key: jax.Array,
    spec: DecodeSpec,
    prev_action: Optional[jax.Array] = None,
    replay_action: Optional[jax.Array] = None,
):
    """One policy step: pair logits → masked flat categorical → (i, j) action.

    Returns (action [B, 2], logprob [B], embeds [B, N, 2D]).
    """
    logits, embeds = policy.apply(params, state)
    b, n, _ = logits.shape
    mask = ~jnp.eye(n, dtype=bool)[None].repeat(b, axis=0)
    if prev_action is not None:
        oh0 = jax.nn.one_hot(prev_action[:, 0], n, dtype=bool)
        oh1 = jax.nn.one_hot(prev_action[:, 1], n, dtype=bool)
        pair = (oh0[:, :, None] & oh1[:, None, :]) | (oh1[:, :, None] & oh0[:, None, :])
        mask = mask & ~pair
    flat_logits = logits.reshape(b, n * n).astype(jnp.float32)
    flat_mask = mask.reshape(b, n * n)
    logprobs = process_logits(
        flat_logits, flat_mask,
        temperature=spec.temperature, tanh_clipping=spec.tanh_clipping,
    )
    flat_replay = (
        replay_action[:, 0] * n + replay_action[:, 1]
        if replay_action is not None
        else None
    )
    action_flat, logprob = decode_action(key, logprobs, flat_mask, spec, flat_replay)
    action = jnp.stack([action_flat // n, action_flat % n], axis=-1)
    return action, logprob, embeds


class ImprovementCritic(nn.Module):
    """Critic over improvement-policy embeddings
    (reference `dact/decoder.py:100-140` CriticDecoder)."""

    embed_dim: int  # dimension of the policy embeds (2 * policy embed_dim)

    @nn.compact
    def __call__(self, embeds: jax.Array) -> jax.Array:
        mean_pool = embeds.mean(axis=-2)
        graph = nn.Dense(self.embed_dim, use_bias=False, name="project_graph")(mean_pool)
        node = nn.Dense(self.embed_dim, use_bias=False, name="project_node")(embeds)
        fusion = node + graph[:, None, :]
        v = MLP(1, (self.embed_dim, self.embed_dim // 2), name="mlp")(fusion.mean(axis=-2))
        return v[..., 0]


def DACT(env=None, policy: DACTPolicy | None = None, policy_kwargs: dict | None = None, **kwargs):
    """DACT model (reference `zoo/dact/model.py:13-60`): dual-aspect
    collaborative transformer policy + n-step PPO with CL curriculum on the
    2-opt improvement env. Returns an `NStepPPO` algo."""
    from rl4co_tpu.envs.routing.tsp_kopt import TSPkopt
    from rl4co_tpu.rl.n_step_ppo import NStepPPO

    if env is None:
        env = TSPkopt(k_max=2)
    if policy is None:
        policy = DACTPolicy(**(policy_kwargs or {}))
    return NStepPPO(env=env, policy=policy, act_fn=dact_act, action_dim=2, **kwargs)
