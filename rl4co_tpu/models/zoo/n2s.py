"""N2S — Neural Neighborhood Search for pickup-and-delivery (Ma et al. 2022).

Reference `rl4co/models/zoo/n2s/{policy,decoder,encoder}.py`: Synth-Att
encoder (shared module `n2s_encoder.py`), a node-pair removal decoder
scoring each pickup-delivery pair from linked-list neighbor compatibilities
plus recent-action history, and a reinsertion decoder scoring (first,
second) insertion position pairs. Trains with n-step PPO on
`PDPRuinRepair`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec, decode_action, process_logits
from rl4co_tpu.envs.routing.pdp_ruin_repair import reinsertion_mask
from rl4co_tpu.models.nn.attention import MultiHeadCompat
from rl4co_tpu.models.nn.ops import MLP
from rl4co_tpu.models.zoo.n2s_encoder import N2SEncoder
from rl4co_tpu.utils.ops import gather_by_index


class NodePairRemovalDecoder(nn.Module):
    """(reference `n2s/decoder.py:17-108`)"""

    embed_dim: int = 128
    num_heads: int = 4

    @nn.compact
    def __call__(self, h, state):
        b, gs, d = h.shape
        hn = self.num_heads
        hd = d // hn
        solution = state.rec_current
        pre = jax.vmap(
            lambda r: jnp.argsort(r).astype(r.dtype)
        )(solution)
        post = jnp.take_along_axis(solution, solution, axis=1)

        def heads(name):
            y = nn.Dense(d, use_bias=False, name=name)(h)
            return y.reshape(b, gs, hn, hd)

        q = heads("W_Q")
        k = heads("W_K")
        # dense-backward gather (scatter-add VJPs serialize on TPU;
        # this decoder runs inside the n-step PPO segment scan)
        gather = lambda x, idx: gather_by_index(
            x.reshape(b, gs, d), idx
        ).reshape(b, gs, hn, hd)
        q_pre = gather(q, pre)
        k_post = gather(k, post)
        compat = (
            (q_pre * k).sum(-1) + (q * k_post).sum(-1) - (q_pre * k_post).sum(-1)
        )[:, 1:, :]  # [B, gs-1, H]
        half = gs // 2
        compat_pair = jnp.concatenate(
            [compat[:, :half], compat[:, half:]], axis=-1
        )  # [B, half, 2H]
        recent = jnp.concatenate(
            [state.action_record[:, -3:], state.action_record.mean(1, keepdims=True)],
            axis=1,
        )  # [B, 4, half]
        feats = jnp.concatenate(
            [compat_pair, jnp.moveaxis(recent, 1, 2).astype(compat_pair.dtype)], axis=-1
        )  # [B, half, 2H+4]
        return MLP(1, (32, 32), name="agg")(feats)[..., 0]  # [B, half]


class NodePairReinsertionDecoder(nn.Module):
    """(reference `n2s/decoder.py:109-198`)"""

    embed_dim: int = 128
    num_heads: int = 4

    @nn.compact
    def __call__(self, h, state, action_removal):
        b, gs, d = h.shape
        hn = self.num_heads
        half = gs // 2
        pos_pickup = 1 + action_removal
        pos_delivery = pos_pickup + half
        h_pickup = gather_by_index(h, pos_pickup)[:, None, :]
        h_delivery = gather_by_index(h, pos_delivery)[:, None, :]
        h_k_neighbour = gather_by_index(h, state.rec_current)
        c1 = MultiHeadCompat(self.embed_dim, hn, name="compater_insert1")
        c2 = MultiHeadCompat(self.embed_dim, hn, name="compater_insert2")
        pick_pre = jnp.moveaxis(c1(h_pickup, h)[:, :, 0, :], 0, -1)      # [B, gs, H]
        pick_post = jnp.moveaxis(c2(h_pickup, h_k_neighbour)[:, :, 0, :], 0, -1)
        del_pre = jnp.moveaxis(c1(h_delivery, h)[:, :, 0, :], 0, -1)
        del_post = jnp.moveaxis(c2(h_delivery, h_k_neighbour)[:, :, 0, :], 0, -1)
        feats = jnp.concatenate(
            [
                jnp.broadcast_to(pick_pre[:, :, None, :], (b, gs, gs, hn)),
                jnp.broadcast_to(pick_post[:, :, None, :], (b, gs, gs, hn)),
                jnp.broadcast_to(del_pre[:, None, :, :], (b, gs, gs, hn)),
                jnp.broadcast_to(del_post[:, None, :, :], (b, gs, gs, hn)),
            ],
            axis=-1,
        )
        return MLP(1, (32, 32), name="agg")(feats)[..., 0]  # [B, gs, gs]


class N2SPolicy(nn.Module):
    embed_dim: int = 128
    num_heads: int = 4
    num_encoder_layers: int = 3
    feedforward_hidden: int = 128
    normalization: str = "layer"
    pos_type: str = "CPE"

    def setup(self):
        self.encoder = N2SEncoder(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_layers=self.num_encoder_layers,
            feedforward_hidden=self.feedforward_hidden,
            normalization=self.normalization,
            pos_type=self.pos_type,
        )
        self.removal_decoder = NodePairRemovalDecoder(self.embed_dim, self.num_heads)
        self.reinsertion_decoder = NodePairReinsertionDecoder(
            self.embed_dim, self.num_heads
        )

    def encode(self, state):
        return self.encoder(state)

    def removal_logits(self, h, state):
        return self.removal_decoder(h, state)

    def reinsertion_logits(self, h, state, action_removal):
        return self.reinsertion_decoder(h, state, action_removal)

    def __call__(self, state):
        # init path; second element is the embeds tensor (NStepPPO contract)
        h = self.encode(state)
        r = self.removal_logits(h, state)
        self.reinsertion_logits(h, state, jnp.zeros(h.shape[0], jnp.int32))
        return r, h


def n2s_act(
    policy: N2SPolicy,
    params,
    state,
    key: jax.Array,
    spec: DecodeSpec,
    prev_action: Optional[jax.Array] = None,
    replay_action: Optional[jax.Array] = None,
):
    """One N2S step: removal pair → masked reinsertion position pair.

    Returns (action [B, 3], logprob [B], embeds [B, gs, D]).
    """
    h = policy.apply(params, state, method="encode")
    b, gs, d = h.shape
    half = gs // 2
    k1, k2 = jax.random.split(key)

    removal_logits = policy.apply(params, h, state, method="removal_logits")
    mask1 = jnp.ones((b, half), bool)
    if prev_action is not None:
        mask1 = mask1 & ~jax.nn.one_hot(prev_action[:, 0], half, dtype=bool)
    lp1 = process_logits(
        removal_logits.astype(jnp.float32), mask1,
        temperature=spec.temperature, tanh_clipping=spec.tanh_clipping,
    )
    a_removal, logp1 = decode_action(
        k1, lp1, mask1, spec,
        replay_action[:, 0] if replay_action is not None else None,
    )

    re_logits = policy.apply(
        params, h, state, a_removal, method="reinsertion_logits"
    )
    mask2 = jax.vmap(reinsertion_mask)(state.visited_time, a_removal + 1)
    flat_logits = re_logits.reshape(b, gs * gs).astype(jnp.float32)
    flat_mask = mask2.reshape(b, gs * gs)
    lp2 = process_logits(
        flat_logits, flat_mask,
        temperature=spec.temperature, tanh_clipping=spec.tanh_clipping,
    )
    flat_replay = (
        replay_action[:, 1] * gs + replay_action[:, 2]
        if replay_action is not None
        else None
    )
    a_flat, logp2 = decode_action(k2, lp2, flat_mask, spec, flat_replay)
    action = jnp.stack([a_removal, a_flat // gs, a_flat % gs], axis=-1)
    return action, logp1 + logp2, h


def N2S(env=None, policy: N2SPolicy | None = None, policy_kwargs: dict | None = None, **kwargs):
    """N2S model (reference `zoo/n2s/model.py:14-60`): synth-attention
    ruin-repair policy + n-step PPO on the PDP ruin-repair env. Returns an
    `NStepPPO` algo."""
    from rl4co_tpu.envs.routing.pdp_ruin_repair import PDPRuinRepair
    from rl4co_tpu.models.zoo.dact import ImprovementCritic
    from rl4co_tpu.rl.n_step_ppo import NStepPPO

    if env is None:
        env = PDPRuinRepair()
    if policy is None:
        policy = N2SPolicy(**(policy_kwargs or {}))
    kwargs.setdefault("critic", ImprovementCritic(embed_dim=policy.embed_dim))
    return NStepPPO(env=env, policy=policy, act_fn=n2s_act, action_dim=3, **kwargs)
