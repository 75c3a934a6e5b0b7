"""Pointer Network (Vinyals et al. 2015 / Bello et al. 2016).

Reference `rl4co/models/zoo/ptrnet/{encoder,decoder,policy,critic}.py`: LSTM
encoder over the node sequence, LSTM decoder whose input is the embedding of
the previously selected node, Bahdanau attention pointer with tanh
exploration. The recurrent decode loop gets its own scan (the generic
constructive rollout assumes a stateless decoder).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import (
    DecodeSpec,
    decode_action,
    get_log_likelihood,
    process_logits_spec,
)
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import RolloutOutput
from rl4co_tpu.utils.ops import gather_by_index


class PointerNetwork(nn.Module):
    """Encoder + recurrent decoder pieces, exposed as separate methods."""

    embed_dim: int = 128
    hidden_dim: int = 128
    tanh_clipping: float = 10.0

    def setup(self):
        self.embedder = nn.Dense(self.embed_dim, name="embed")
        self.enc_cell = nn.OptimizedLSTMCell(self.hidden_dim, name="enc_lstm")
        self.dec_cell = nn.OptimizedLSTMCell(self.hidden_dim, name="dec_lstm")
        self.W_q = nn.Dense(self.hidden_dim, use_bias=False, name="W_q")
        self.W_ref = nn.Dense(self.hidden_dim, use_bias=False, name="W_ref")
        self.v = self.param("v", nn.initializers.uniform(0.2), (self.hidden_dim,))
        self.decoder_input0 = self.param(
            "decoder_input0", nn.initializers.uniform(0.2), (self.embed_dim,)
        )

    def encode(self, locs: jax.Array):
        """locs [B, N, 2] -> (enc_outputs [B, N, H], final lstm carry)."""
        emb = self.embedder(locs)  # [B, N, E]
        b = emb.shape[0]
        carry = self.enc_cell.initialize_carry(
            jax.random.PRNGKey(0), (b, self.embed_dim)
        )
        # materialize cell params outside the scan (init-time tracer hygiene)
        self.enc_cell(carry, emb[:, 0])

        def step(carry, x_t):
            carry, out = self.enc_cell(carry, x_t)
            return carry, out

        carry, outs = jax.lax.scan(step, carry, jnp.moveaxis(emb, 1, 0))
        return emb, jnp.moveaxis(outs, 0, 1), carry

    def decode_step(self, dec_carry, dec_input, enc_outputs, mask):
        """One decoder step -> (logits [B, N], new carry)."""
        dec_carry, q = self.dec_cell(dec_carry, dec_input)
        scores = jnp.einsum(
            "h,bnh->bn",
            self.v,
            jnp.tanh(self.W_q(q)[:, None, :] + self.W_ref(enc_outputs)),
        )
        return scores, dec_carry

    def __call__(self, locs):
        """Param-init path: touch encoder, decoder, and start token."""
        emb, enc_outputs, carry = self.encode(locs)
        dec_input = jnp.broadcast_to(
            self.decoder_input0[None, :], (locs.shape[0], self.embed_dim)
        )
        scores, _ = self.decode_step(carry, dec_input, enc_outputs, None)
        return scores


def ptrnet_rollout(
    policy: PointerNetwork,
    params,
    env: Env,
    instances,
    key: jax.Array,
    spec: DecodeSpec,
    replay_actions: Optional[jax.Array] = None,
) -> RolloutOutput:
    locs = instances["locs"]
    emb, enc_outputs, enc_carry = policy.apply(params, locs, method="encode")
    b = locs.shape[0]
    state0 = env.reset_batch(instances)
    t_steps = env.max_steps
    keys = jax.random.split(key, t_steps)
    replay = (
        jnp.moveaxis(replay_actions, 1, 0)
        if replay_actions is not None
        else jnp.zeros((t_steps, b), dtype=jnp.int32)
    )
    dec_input0 = jnp.broadcast_to(
        policy.apply(params, method=lambda m: m.decoder_input0)[None, :],
        (b, emb.shape[-1]),
    )

    def step_fn(carry, xs):
        state, dec_carry, dec_input = carry
        k, replay_t = xs
        mask = env.action_mask_batch(state)
        logits, dec_carry = policy.apply(
            params, dec_carry, dec_input, enc_outputs, mask, method="decode_step"
        )
        logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        action, logprob = decode_action(k, logprobs, mask, spec, replay_t)
        probs = jnp.exp(logprobs)
        ent = -jnp.sum(jnp.where(probs > 0, probs * logprobs, 0.0), axis=-1)
        logprob = jnp.where(state.done, 0.0, logprob)
        ent = jnp.where(state.done, 0.0, ent)
        next_state = env.step_batch(state, action)
        next_input = gather_by_index(emb, action)
        return (next_state, dec_carry, next_input), (action, logprob, ent)

    (state, _, _), (actions, logprobs, ents) = jax.lax.scan(
        step_fn, (state0, enc_carry, dec_input0), (keys, replay)
    )
    actions = jnp.moveaxis(actions, 0, 1)
    logprobs = jnp.moveaxis(logprobs, 0, 1)
    reward = env.reward_batch(state, actions)
    return RolloutOutput(
        reward=reward,
        log_likelihood=get_log_likelihood(logprobs),
        actions=actions,
        logprobs=logprobs,
        entropy=ents.sum(axis=0),
    )


@dataclasses.dataclass(frozen=True)
class PointerNetworkModel:
    """REINFORCE wrapper for PtrNet (reference `ptrnet/policy.py` + exp.
    moving baseline as in Bello et al.)."""

    env: Env
    policy: PointerNetwork
    lr: float = 1e-4
    grad_clip: float = 1.0
    train_spec: DecodeSpec = DecodeSpec(kind="sampling", tanh_clipping=10.0)

    def init(self, key: jax.Array):
        import optax

        from rl4co_tpu.rl.reinforce import TrainState

        kg, kp = jax.random.split(key)
        locs = self.env.generate_batch(kg, 2)["locs"]
        params = self.policy.init(kp, locs)
        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))
        return TrainState(
            params=params, opt_state=tx.init(params),
            baseline_state=jnp.float32(jnp.nan), step=jnp.int32(0),
        )

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        import optax

        from rl4co_tpu.rl.reinforce import TrainState

        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))

        def loss_fn(params, bl, instances, k):
            out = ptrnet_rollout(
                self.policy, params, self.env, instances, k, self.train_spec
            )
            bl_val = jnp.where(jnp.isnan(bl), out.reward.mean(), bl)
            adv = out.reward - bl_val
            loss = -(adv * out.log_likelihood).mean()
            return loss, (out.reward.mean(), {"loss": loss, "reward": out.reward.mean()})

        def step(state, key):
            kd, kr = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kd, batch_size)
            grads, (mean_r, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.baseline_state, instances, kr
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            bl = jnp.where(
                jnp.isnan(state.baseline_state),
                mean_r,
                0.8 * state.baseline_state + 0.2 * mean_r,
            )
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=bl, step=state.step + 1),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec: DecodeSpec = None):
        spec = spec or DecodeSpec(
            kind="greedy", tanh_clipping=self.train_spec.tanh_clipping
        )

        def eval_step(params, instances, key):
            out = ptrnet_rollout(self.policy, params, self.env, instances, key, spec)
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state, host: dict):
        return state, host


# Reference exports the policy under this name (`models/__init__.py:41`).
PointerNetworkPolicy = PointerNetwork
