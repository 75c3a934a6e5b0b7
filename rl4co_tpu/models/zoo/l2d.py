"""L2D — Learning to Dispatch for JSSP/FJSP (Zhang et al. 2020 lineage).

Reference `rl4co/models/zoo/l2d/{model,policy,decoder,encoder}.py` and
`rl4co/models/nn/graph/hgnn.py`: a heterogeneous ops↔machines GNN re-encodes
the schedule state every step (stepwise encoding, `l2d/policy.py:26-92`);
the actor scores job-machine pairs. Ops features follow
`JSSPInitEmbedding._op_features` (`init.py:447-458`).

Here the ops↔machine bipartite graph is the dense eligibility matrix
``proc_times > 0`` (static shapes), and the full stepwise rollout is one
`lax.scan` with re-encoding inside the step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec, decode_action, process_logits_spec
from rl4co_tpu.models.nn.ops import MLP, Normalization
from rl4co_tpu.models.policies.constructive import RolloutOutput
from rl4co_tpu.rl.reinforce import TrainState
from rl4co_tpu.utils.ops import mark_where_in, gather_by_index


class HetGNNLayer(nn.Module):
    """Bipartite ops<->machines message passing (reference `graph/hgnn.py:98+`)."""

    embed_dim: int
    normalization: str = "instance"

    @nn.compact
    def __call__(self, ops_emb, ma_emb, adj):
        # adj [B, M, O] eligibility (proc > 0)
        deg_m = adj.sum(-1, keepdims=True) + 1e-9
        ma_msg = (adj @ ops_emb) / deg_m  # [B, M, D]
        ma_new = Normalization(self.normalization, name="ma_norm")(
            ma_emb + nn.Dense(self.embed_dim, name="ma_up")(
                jnp.concatenate([ma_emb, ma_msg], axis=-1)
            )
        )
        deg_o = adj.sum(-2)[..., None] + 1e-9
        ops_msg = (adj.swapaxes(-1, -2) @ ma_new) / deg_o
        ops_new = Normalization(self.normalization, name="ops_norm")(
            ops_emb + nn.Dense(self.embed_dim, name="ops_up")(
                jnp.concatenate([ops_emb, ops_msg], axis=-1)
            )
        )
        return ops_new, ma_new


class L2DPolicy(nn.Module):
    """Stepwise encoder + job-machine actor (+ optional critic head for PPO,
    reference `l2d/policy.py:152+` L2DPolicy4PPO)."""

    embed_dim: int = 64
    num_encoder_layers: int = 2
    normalization: str = "instance"
    actor_hidden_dim: int = 64
    scaling_factor: float = 100.0
    with_critic: bool = False

    @nn.compact
    def __call__(self, state):
        """state: batched FJSPState -> (logits [B, 1+J*M], value [B] | None)."""
        proc = state.proc_times  # [B, M, O]
        b, m, o = proc.shape
        j = state.next_op.shape[-1]
        mean_dur = proc.sum(1) / ((proc > 0).sum(1) + 1e-9)
        num_eligible = (proc > 0).sum(1).astype(jnp.float32)
        prev_finish = jnp.concatenate(
            [jnp.zeros((b, 1)), state.finish_times[:, :-1]], axis=1
        )
        is_first = jax.vmap(
            lambda so: mark_where_in(jnp.zeros((o,), bool), so, True)
        )(state.start_op)
        is_ready = (
            (jnp.where(~is_first, prev_finish, 0.0) <= state.time[:, None])
            & ~state.op_scheduled
        )
        ops_feats = jnp.stack(
            [
                mean_dur / self.scaling_factor,
                is_ready.astype(jnp.float32),
                num_eligible,
                state.ops_job_map.astype(jnp.float32),
                state.op_scheduled.astype(jnp.float32),
            ],
            axis=-1,
        )
        ops_emb = nn.Dense(self.embed_dim, name="init_ops_embed")(ops_feats)
        ops_emb = jnp.where(state.pad_mask[..., None], 0.0, ops_emb)
        busy_for = (state.busy_until - state.time[:, None]) / self.scaling_factor
        ma_emb = nn.Dense(self.embed_dim, name="init_ma_embed")(busy_for[..., None])

        adj = (proc > 0).astype(jnp.float32)
        for i in range(self.num_encoder_layers):
            ops_emb, ma_emb = HetGNNLayer(
                self.embed_dim, self.normalization, name=f"layer_{i}"
            )(ops_emb, ma_emb, adj)

        # actor: score each (job, machine) pair
        job_emb = jnp.take_along_axis(
            ops_emb, state.next_op[..., None].repeat(self.embed_dim, -1), axis=1
        )  # [B, J, D]
        pooled = jnp.concatenate([ops_emb.mean(1), ma_emb.mean(1)], axis=-1)  # [B, 2D]
        pooled_emb = nn.Dense(self.embed_dim, name="pool_proj")(pooled)
        pair = jnp.concatenate(
            [
                jnp.broadcast_to(job_emb[:, :, None, :], (b, j, m, self.embed_dim)),
                jnp.broadcast_to(ma_emb[:, None, :, :], (b, j, m, self.embed_dim)),
                jnp.broadcast_to(pooled_emb[:, None, None, :], (b, j, m, self.embed_dim)),
            ],
            axis=-1,
        )
        pair_logits = MLP(1, (self.actor_hidden_dim, self.actor_hidden_dim),
                          name="actor")(pair)[..., 0].reshape(b, j * m)
        noop_logit = MLP(1, (self.actor_hidden_dim,), name="noop_head")(pooled_emb)
        logits = jnp.concatenate([noop_logit, pair_logits], axis=-1)
        value = None
        if self.with_critic:
            value = MLP(1, (self.actor_hidden_dim,), name="critic")(pooled_emb)[..., 0]
        return logits, value


def l2d_rollout(
    policy: L2DPolicy,
    params,
    env,
    instances,
    key: jax.Array,
    spec: DecodeSpec,
    replay_actions: Optional[jax.Array] = None,
) -> RolloutOutput:
    """Stepwise rollout: re-encode every step (reference stepwise encoding)."""
    state0 = env.reset_batch(instances)
    t_steps = env.max_steps
    keys = jax.random.split(key, t_steps)
    replay = (
        jnp.moveaxis(replay_actions, 1, 0)
        if replay_actions is not None
        else jnp.zeros((t_steps, state0.done.shape[0]), dtype=jnp.int32)
    )

    def step_fn(state, xs):
        k, replay_t = xs
        mask = env.action_mask_batch(state)
        logits, _ = policy.apply(params, state)
        logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        action, logprob = decode_action(k, logprobs, mask, spec, replay_t)
        logprob = jnp.where(state.done, 0.0, logprob)
        next_state = env.step_batch(state, action)
        return next_state, (action, logprob)

    final_state, (actions, logprobs) = jax.lax.scan(step_fn, state0, (keys, replay))
    actions = jnp.moveaxis(actions, 0, 1)
    logprobs = jnp.moveaxis(logprobs, 0, 1)
    reward = env.reward_batch(final_state, actions)
    return RolloutOutput(
        reward=reward,
        log_likelihood=logprobs.sum(-1),
        actions=actions,
        logprobs=logprobs,
        entropy=jnp.zeros_like(reward),
    )


class L2DAttnPolicy(nn.Module):
    """Encode-once transformer variant of L2D (reference `l2d/policy.py:95-151`
    ``L2DAttnPolicy`` + `l2d/decoder.py:315-385` ``L2DAttnActor``).

    Encoder: MatNet-style dual ops↔machines embeddings over the processing
    time matrix (reference ``FJSPMatNetInitEmbedding``, `init.py:500-522`),
    run ONCE per instance. Decoder: per step, per-job K/V/logit-K gathered by
    ``next_op`` + `JSSPDynamicEmbedding` deltas; queries are the machine
    embeddings shifted by current busy time (``SchedulingContext``,
    `context.py:346-356`); pointer scores summed over machines (JSSP head of
    ``L2DAttnPointer``, `decoder.py:260-272`). Action space = [no-op, jobs].
    """

    embed_dim: int = 128
    num_heads: int = 8
    num_encoder_layers: int = 4
    normalization: str = "batch"
    scaling_factor: float = 1000.0
    # reference `matnet_w_sa.py:109-125`: each encoder layer runs ops↔ops and
    # ma↔ma self-attention before the cross mixed-score update
    use_self_attention: bool = True

    def setup(self):
        from rl4co_tpu.models.nn.attention import MultiHeadAttention, PointerAttention
        from rl4co_tpu.models.nn.env_embeddings.dynamic import JSSPDynamicEmbedding
        from rl4co_tpu.models.nn.ops import Normalization, PositionalEncoding
        from rl4co_tpu.models.zoo.matnet import MatNetLayer

        d = self.embed_dim
        self.init_ops_embed = nn.Dense(d, use_bias=False, name="init_ops_embed")
        self.pos_encoder = PositionalEncoding(d, name="pos_encoder")
        self.init_ma_embed = nn.Dense(d, use_bias=False, name="init_ma_embed")
        self.layers = [
            MatNetLayer(d, self.num_heads, feedforward_hidden=2 * d,
                        normalization=self.normalization, name=f"layer_{i}")
            for i in range(self.num_encoder_layers)
        ]
        if self.use_self_attention:
            self.ops_self_attn = [
                MultiHeadAttention(d, self.num_heads, use_bias=False,
                                   name=f"ops_sa_{i}")
                for i in range(self.num_encoder_layers)
            ]
            self.ma_self_attn = [
                MultiHeadAttention(d, self.num_heads, use_bias=False,
                                   name=f"ma_sa_{i}")
                for i in range(self.num_encoder_layers)
            ]
            self.ops_sa_norm = [
                Normalization(self.normalization, name=f"ops_sa_norm_{i}")
                for i in range(self.num_encoder_layers)
            ]
            self.ma_sa_norm = [
                Normalization(self.normalization, name=f"ma_sa_norm_{i}")
                for i in range(self.num_encoder_layers)
            ]
        self.project_kvl = nn.Dense(3 * d, use_bias=False, name="project_kvl")
        self.proj_busy = nn.Dense(d, use_bias=False, name="proj_busy")
        self.pointer = PointerAttention(d, self.num_heads, mask_inner=False,
                                        name="pointer")
        self.dynamic_embedding = JSSPDynamicEmbedding(
            d, self.scaling_factor, name="dynamic_embedding"
        )
        self.dummy = self.param("dummy", nn.initializers.uniform(1.0), (1, d))

    def _busy_for(self, state):
        return ((state.busy_until - state.time[:, None])
                / self.scaling_factor)[..., None]

    def encode(self, state):
        """Batched reset-state FJSPState -> decode cache."""
        proc = state.proc_times  # [B, M, O]
        mean_dur = proc.sum(1) / ((proc > 0).sum(1) + 1e-9)
        num_eligible = (proc > 0).sum(1).astype(jnp.float32)
        prev_finish = jnp.concatenate(
            [jnp.zeros((proc.shape[0], 1)), state.finish_times[:, :-1]], axis=1
        )
        is_first = jax.vmap(
            lambda so: mark_where_in(jnp.zeros((proc.shape[-1],), bool), so, True)
        )(state.start_op)
        is_ready = (
            (jnp.where(~is_first, prev_finish, 0.0) <= state.time[:, None])
            & ~state.op_scheduled
        )
        ops_feats = jnp.stack(
            [
                mean_dur / self.scaling_factor,
                is_ready.astype(jnp.float32),
                num_eligible,
                state.ops_job_map.astype(jnp.float32),
                state.op_scheduled.astype(jnp.float32),
            ],
            axis=-1,
        )
        ops_emb = self.pos_encoder(self.init_ops_embed(ops_feats),
                                   state.ops_seq_order)
        ops_emb = jnp.where(state.pad_mask[..., None], 0.0, ops_emb)
        ma_emb = self.init_ma_embed(self._busy_for(state))
        dmat = proc.swapaxes(-1, -2) / self.scaling_factor  # [B, O, M]
        for i, layer in enumerate(self.layers):
            if self.use_self_attention:
                ops_emb = self.ops_sa_norm[i](
                    ops_emb + self.ops_self_attn[i](ops_emb)
                )
                ma_emb = self.ma_sa_norm[i](ma_emb + self.ma_self_attn[i](ma_emb))
            ops_emb, ma_emb = layer(ops_emb, ma_emb, dmat)
        k, v, lk = jnp.split(self.project_kvl(ops_emb), 3, axis=-1)
        return {"ops_emb": ops_emb, "ma_emb": ma_emb, "k": k, "v": v, "lk": lk}

    def decode_step(self, cache, state, lbs, is_ready):
        """One decode step -> logits [B, 1 + num_jobs]."""
        ma_emb = cache["ma_emb"]
        b = ma_emb.shape[0]
        q = ma_emb + self.proj_busy(self._busy_for(state))  # [B, M, D]

        # dense-backward gathers (stepwise-PPO differentiates through these)
        k = gather_by_index(cache["k"], state.next_op)
        v = gather_by_index(cache["v"], state.next_op)
        lk = gather_by_index(cache["lk"], state.next_op)
        dk, dv, dl = self.dynamic_embedding(state, ma_emb, lbs, is_ready)
        k, v, lk = k + dk, v + dv, lk + dl
        lk = jnp.concatenate(
            [jnp.broadcast_to(self.dummy[None], (b, 1, self.embed_dim)), lk], axis=1
        )
        full = jnp.ones((b, q.shape[1], lk.shape[1]), bool)
        logits = self.pointer(q, k, v, lk, full)  # [B, M, 1+J]
        return logits.sum(axis=1)

    def __call__(self, state, lbs, is_ready):
        """init-path convenience: encode + one decode step."""
        cache = self.encode(state)
        return self.decode_step(cache, state, lbs, is_ready)


def l2d_attn_rollout(
    policy: L2DAttnPolicy,
    params,
    env,
    instances,
    key: jax.Array,
    spec: DecodeSpec,
    replay_actions: Optional[jax.Array] = None,
) -> RolloutOutput:
    """Encode once, decode with dynamic-embedding updates (reference
    non-stepwise L2DAttn path, `l2d/decoder.py:343-363`)."""
    state0 = env.reset_batch(instances)
    cache = policy.apply(params, state0, method=L2DAttnPolicy.encode)
    t_steps = env.max_steps
    keys = jax.random.split(key, t_steps)
    replay = (
        jnp.moveaxis(replay_actions, 1, 0)
        if replay_actions is not None
        else jnp.zeros((t_steps, state0.done.shape[0]), dtype=jnp.int32)
    )
    lb_fn = jax.vmap(env.calc_lower_bound)
    ready_fn = jax.vmap(env.op_is_ready)

    def step_fn(state, xs):
        k, replay_t = xs
        mask = env.action_mask_batch(state)
        logits = policy.apply(params, cache, state, lb_fn(state), ready_fn(state),
                              method=L2DAttnPolicy.decode_step)
        logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        action, logprob = decode_action(k, logprobs, mask, spec, replay_t)
        logprob = jnp.where(state.done, 0.0, logprob)
        next_state = env.step_batch(state, action)
        return next_state, (action, logprob)

    final_state, (actions, logprobs) = jax.lax.scan(step_fn, state0, (keys, replay))
    actions = jnp.moveaxis(actions, 0, 1)
    logprobs = jnp.moveaxis(logprobs, 0, 1)
    reward = env.reward_batch(final_state, actions)
    return RolloutOutput(
        reward=reward,
        log_likelihood=logprobs.sum(-1),
        actions=actions,
        logprobs=logprobs,
        entropy=jnp.zeros_like(reward),
    )


@dataclasses.dataclass(frozen=True)
class L2DModel:
    """REINFORCE trainer for L2D (reference `l2d/model.py:8-67`; the
    StepwisePPO variant reuses `rl4co_tpu.rl.ppo` machinery)."""

    env: object
    policy: L2DPolicy
    lr: float = 1e-4
    grad_clip: float = 1.0
    train_spec: DecodeSpec = DecodeSpec(kind="sampling")

    def init(self, key: jax.Array) -> TrainState:
        kg, kp = jax.random.split(key)
        instances = self.env.generate_batch(kg, 2)
        state0 = self.env.reset_batch(instances)
        params = self.policy.init(kp, state0)
        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))
        return TrainState(params=params, opt_state=tx.init(params),
                          baseline_state=None, step=jnp.int32(0))

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))

        def loss_fn(params, instances, k):
            out = l2d_rollout(self.policy, params, self.env, instances, k, self.train_spec)
            adv = out.reward - out.reward.mean()
            loss = -(adv * out.log_likelihood).mean()
            return loss, {"loss": loss, "reward": out.reward.mean()}

        def step(state: TrainState, key):
            kd, kr = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kd, batch_size)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, instances, kr)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=None, step=state.step + 1),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec: DecodeSpec = None):
        spec = spec or DecodeSpec(kind="greedy")

        def eval_step(params, instances, key):
            out = l2d_rollout(self.policy, params, self.env, instances, key, spec)
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state: TrainState, host: dict):
        return state, host


@dataclasses.dataclass(frozen=True)
class L2DAttnModel:
    """REINFORCE trainer for the encode-once attention variant (reference
    `l2d/model.py` with L2DAttnPolicy)."""

    env: object
    policy: L2DAttnPolicy
    lr: float = 1e-4
    grad_clip: float = 1.0
    train_spec: DecodeSpec = DecodeSpec(kind="sampling")

    def init(self, key: jax.Array) -> TrainState:
        kg, kp = jax.random.split(key)
        instances = self.env.generate_batch(kg, 2)
        state0 = self.env.reset_batch(instances)
        lbs = jax.vmap(self.env.calc_lower_bound)(state0)
        is_ready = jax.vmap(self.env.op_is_ready)(state0)
        params = self.policy.init(kp, state0, lbs, is_ready)
        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))
        return TrainState(params=params, opt_state=tx.init(params),
                          baseline_state=None, step=jnp.int32(0))

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr))

        def loss_fn(params, instances, k):
            out = l2d_attn_rollout(self.policy, params, self.env, instances, k,
                                   self.train_spec)
            adv = out.reward - out.reward.mean()
            loss = -(adv * out.log_likelihood).mean()
            return loss, {"loss": loss, "reward": out.reward.mean()}

        def step(state: TrainState, key):
            kd, kr = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kd, batch_size)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, instances, kr)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=None, step=state.step + 1),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec: DecodeSpec = None):
        spec = spec or DecodeSpec(kind="greedy")

        def eval_step(params, instances, key):
            out = l2d_attn_rollout(self.policy, params, self.env, instances,
                                   key, spec)
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state: TrainState, host: dict):
        return state, host
