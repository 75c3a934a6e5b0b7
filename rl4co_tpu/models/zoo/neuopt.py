"""NeuOpt (Ma et al. 2023) — learning flexible k-opt.

Reference `rl4co/models/zoo/neuopt/{policy,decoder}.py`: N2S encoder + RDS
(recurrent dual-stream) decoder; the k-opt move is factorized into k_max
sequential node selections through two GRU streams, with an early-stop
("S-move") when the selection closes the cycle
(`neuopt/policy.py:118-292`). Works with `TSPkopt(k_max > 2)`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec, decode_action, process_logits, take_along_last
from rl4co_tpu.models.zoo.n2s_encoder import N2SEncoder


class RDSDecoder(nn.Module):
    """Dual-stream additive attention scorer (reference `neuopt/decoder.py:12-78`)."""

    embed_dim: int = 128

    @nn.compact
    def __call__(self, h, q1, q2, input_q1, input_q2):
        d = self.embed_dim
        q1 = nn.GRUCell(d, name="rnn1")(q1, input_q1)[0]
        q2 = nn.GRUCell(d, name="rnn2")(q2, input_q2)[0]
        v1 = self.param("linear_V1", nn.initializers.uniform(0.1), (d,))
        v2 = self.param("linear_V2", nn.initializers.uniform(0.1), (d,))
        k1 = nn.Dense(d, use_bias=False, name="linear_K1")(h)
        k2 = nn.Dense(d, use_bias=False, name="linear_K2")(h)
        k3 = nn.Dense(d, use_bias=False, name="linear_K3")(h)
        k4 = nn.Dense(d, use_bias=False, name="linear_K4")(h)
        q1p = nn.Dense(d, use_bias=False, name="linear_Q1")(q1)
        q2p = nn.Dense(d, use_bias=False, name="linear_Q2")(q2)
        q3p = nn.Dense(d, use_bias=False, name="linear_Q3")(q1)
        q4p = nn.Dense(d, use_bias=False, name="linear_Q4")(q2)
        mu = (v1[None, None, :] * jnp.tanh(k1 + q1p[:, None, :] + k3 * q3p[:, None, :])).sum(-1)
        lam = (v2[None, None, :] * jnp.tanh(k2 + q2p[:, None, :] + k4 * q4p[:, None, :])).sum(-1)
        return mu + lam, q1, q2


class NeuOptPolicy(nn.Module):
    """Encoder + RDS decoder; `neuopt_act` drives the k_max selection loop."""

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
        self.decoder = RDSDecoder(self.embed_dim)
        self.init_hidden_W = nn.Dense(self.embed_dim)
        self.init_query = self.param(
            "init_query", nn.initializers.uniform(0.1), (self.embed_dim,)
        )

    def encode(self, state):
        return self.encoder(state)

    def decode(self, h, q1, q2, input_q1, input_q2):
        return self.decoder(h, q1, q2, input_q1, input_q2)

    def init_queries(self, h):
        b = h.shape[0]
        init_q = jnp.broadcast_to(self.init_query[None, :], (b, self.embed_dim))
        init_hidden = self.init_hidden_W(h.mean(axis=1))
        return init_q, init_hidden

    def __call__(self, state):
        # init path; second element is the embeds tensor (NStepPPO contract,
        # same shape convention as DACTPolicy.pair_logits)
        h = self.encode(state)
        init_q, init_hidden = self.init_queries(h)
        logits, q1, q2 = self.decode(h, init_hidden, init_hidden, init_q, init_q)
        return logits, h


def neuopt_act(
    policy: NeuOptPolicy,
    params,
    state,
    key: jax.Array,
    spec: DecodeSpec,
    prev_action: Optional[jax.Array] = None,  # [B, 3*k_max] previous packed action
    replay_action: Optional[jax.Array] = None,
    k_max: int = 4,
):
    """k_max-step k-opt action construction (reference `policy.py:175-282`).

    Returns (packed action [B, 3*k_max], logprob [B], embeds [B, N, D]).
    """
    h = policy.apply(params, state, method="encode")
    b, gs, d = h.shape
    init_q, init_hidden = policy.apply(params, h, method="init_queries")
    q1 = q2 = init_hidden
    input_q1 = input_q2 = init_q

    rec = state.rec_current
    visited_time = state.visited_time
    action_index = jnp.zeros((b, k_max), jnp.int32)
    k_left = jnp.zeros((b, k_max + 1), jnp.int32)
    k_right = jnp.zeros((b, k_max), jnp.int32)
    next_of_last = jnp.full((b,), -1, jnp.int32)
    mask = jnp.zeros((b, gs), bool)  # True = forbidden
    stopped = jnp.ones((b,), bool)
    ll = jnp.zeros((b,))
    visited_time_tag = jnp.zeros_like(visited_time)
    bidx = jnp.arange(b)
    keys = jax.random.split(key, k_max)

    for i in range(k_max):
        logits, q1, q2 = policy.apply(
            params, h, q1, q2, input_q1, input_q2, method="decode"
        )
        if i == 0 and prev_action is not None:
            mask = mask | jax.nn.one_hot(prev_action[:, 0], gs, dtype=bool)
        feasible = ~mask
        logprobs = process_logits(
            logits.astype(jnp.float32), feasible,
            temperature=spec.temperature, tanh_clipping=spec.tanh_clipping,
        )
        replay_i = replay_action[:, i] if replay_action is not None else None
        a, logprob = decode_action(keys[i], logprobs, feasible, spec, replay_i)
        if i > 0:
            a = jnp.where(stopped, action_index[:, 0], a)
            logprob = take_along_last(logprobs, a)
            ll = ll + jnp.where(stopped, 0.0, logprob)
        else:
            ll = ll + logprob

        next_of_new = rec[bidx, a]
        action_index = action_index.at[:, i].set(a)
        k_left = k_left.at[:, i].set(jnp.where(stopped, a, k_left[:, i]))
        if i > 0:
            k_right = k_right.at[:, i - 1].set(
                jnp.where(~stopped, a, k_right[:, i - 1])
            )
        k_left = k_left.at[:, i + 1].set(next_of_new)

        input_q1 = h[bidx, a]
        input_q2 = jnp.where(
            stopped[:, None], input_q1, h[bidx, next_of_last % gs]
        )

        newly_stopped = a == next_of_last
        stopped = newly_stopped if i == 0 else (stopped | newly_stopped)

        k_left = k_left.at[:, i].set(
            jnp.where(stopped & (i > 0), k_left[:, i - 1], k_left[:, i])
        ) if i > 0 else k_left
        k_right = k_right.at[:, i].set(
            jnp.where(stopped & (i > 0), k_right[:, i - 1], k_right[:, i])
        ) if i > 0 else k_right

        if i == 0:
            visited_time_tag = (visited_time - visited_time[bidx, a][:, None]) % gs
        mask = visited_time_tag <= visited_time_tag[bidx, a][:, None]
        if i == 0:
            mask = mask | (visited_time_tag > (gs - 2))
        # clear position a for stopped rows (scatter-free)
        mask = mask & ~(jax.nn.one_hot(a, gs, dtype=bool) & stopped[:, None])
        allow_first = (~stopped) & (next_of_new == action_index[:, 0])
        mask = mask & ~(
            jax.nn.one_hot(action_index[:, 0], gs, dtype=bool)
            & allow_first[:, None]
        )

        next_of_last = jnp.where(stopped, -1, next_of_new)

    k_right = k_right.at[:, -1].set(
        jnp.where(~stopped, k_left[:, -1], k_right[:, -1])
    )
    action_all = jnp.concatenate([action_index, k_left[:, :k_max], k_right], axis=-1)
    return action_all, ll, h


def NeuOpt(env=None, policy: NeuOptPolicy | None = None, policy_kwargs: dict | None = None, **kwargs):
    """NeuOpt model (reference `zoo/neuopt/model.py:14-60`): RDS-decoder
    k-opt policy + n-step PPO with CL curriculum on `TSPkopt(k_max>2)`.
    Returns an `NStepPPO` algo."""
    import functools

    from rl4co_tpu.envs.routing.tsp_kopt import TSPkopt
    from rl4co_tpu.rl.n_step_ppo import NStepPPO

    if env is None:
        env = TSPkopt(k_max=4)
    if policy is None:
        policy = NeuOptPolicy(**(policy_kwargs or {}))
    k_max = getattr(env, "k_max", 4)
    act = functools.partial(neuopt_act, k_max=k_max)
    if "critic" not in kwargs:
        from rl4co_tpu.models.zoo.dact import ImprovementCritic

        kwargs["critic"] = ImprovementCritic(embed_dim=policy.embed_dim)
    return NStepPPO(env=env, policy=policy, act_fn=act, action_dim=3 * k_max, **kwargs)
