"""PPO for the single-step constructive MDP
(reference `rl4co/models/rl/ppo/ppo.py:17-229`).

Autoregressive decoding is treated as an algorithmic choice, not MDP
transitions: one rollout = one action, advantage = reward − V(instance), no
GAE. The reference's K inner epochs over a shuffled minibatch DataLoader
become a `lax.scan` over permuted minibatch index blocks, all inside a
single jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import (
    ConstructivePolicy,
    init_policy_params,
    rollout,
)
from rl4co_tpu.rl.critic import CriticNetwork
from rl4co_tpu.rl.reinforce import TrainState


@dataclasses.dataclass(frozen=True)
class PPO:
    """Hyperparameters mirror the reference (`ppo.py:63-75`)."""

    env: Env
    policy: ConstructivePolicy
    critic: Optional[CriticNetwork] = None
    clip_range: float = 0.2
    ppo_epochs: int = 2
    mini_batch_fraction: float = 0.25
    vf_lambda: float = 0.5
    entropy_lambda: float = 0.0
    normalize_adv: bool = False
    max_grad_norm: float = 0.5
    lr: float = 1e-4
    train_spec: DecodeSpec = DecodeSpec(kind="sampling")
    val_spec: DecodeSpec = DecodeSpec(kind="greedy")

    def __post_init__(self):
        if self.critic is None:
            # create critic mirroring the actor encoder (reference
            # `critic.py:65-72` create_critic_from_actor)
            p = self.policy
            object.__setattr__(
                self,
                "critic",
                CriticNetwork(
                    env_name=p.env_name,
                    embed_dim=p.embed_dim,
                    num_encoder_layers=p.num_encoder_layers,
                    num_heads=p.num_heads,
                    feedforward_hidden=p.feedforward_hidden,
                    normalization=p.normalization,
                ),
            )

    def make_optimizer(self):
        tx = optax.adam(self.lr)
        if self.max_grad_norm and self.max_grad_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(self.max_grad_norm), tx)
        return tx

    def init(self, key: jax.Array) -> TrainState:
        kp, kc, kg = jax.random.split(key, 3)
        policy_params = init_policy_params(self.policy, self.env, kp)
        dummy = self.env.generate_batch(kg, 2)
        critic_params = self.critic.init(kc, dummy)
        params = {"policy": policy_params, "critic": critic_params}
        opt_state = self.make_optimizer().init(params)
        return TrainState(
            params=params, opt_state=opt_state, baseline_state=None, step=jnp.int32(0)
        )

    def _minibatch_loss(self, params, instances, actions, old_ll, reward, key):
        out = rollout(
            self.policy, params["policy"], self.env, instances, key,
            dataclasses.replace(self.train_spec, kind="evaluate"),
            replay_actions=actions,
        )
        ratio = jnp.exp(out.log_likelihood - old_ll)
        value = self.critic.apply(params["critic"], instances)
        adv = reward - jax.lax.stop_gradient(value)
        if self.normalize_adv:
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        surrogate = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - self.clip_range, 1 + self.clip_range) * adv,
        ).mean()
        value_loss = optax.huber_loss(value, reward).mean()
        entropy = out.entropy.mean()
        loss = surrogate + self.vf_lambda * value_loss - self.entropy_lambda * entropy
        metrics = {
            "loss": loss,
            "surrogate_loss": surrogate,
            "value_loss": value_loss,
            "entropy": entropy,
        }
        return loss, metrics

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = self.make_optimizer()
        mb_size = max(1, int(batch_size * self.mini_batch_fraction))
        num_mb = batch_size // mb_size

        def step(state: TrainState, key: jax.Array):
            kdata, kroll, kperm = jax.random.split(
                jax.random.fold_in(key, state.step), 3
            )
            instances = self.env.generate_batch(kdata, batch_size)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                instances = jax.lax.with_sharding_constraint(
                    instances, NamedSharding(mesh, P("dp"))
                )
            # rollout with the current (old) policy — no grad
            out = rollout(
                self.policy, state.params["policy"], self.env, instances, kroll,
                self.train_spec,
            )
            old_ll = jax.lax.stop_gradient(out.log_likelihood)
            actions = out.actions
            reward = out.reward

            def inner_update(carry, mb_idx):
                params, opt_state = carry
                take = lambda x: jnp.take(x, mb_idx, axis=0)
                grads, metrics = jax.grad(self._minibatch_loss, has_aux=True)(
                    params,
                    jax.tree_util.tree_map(take, instances),
                    take(actions), take(old_ll), take(reward),
                    kroll,
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            # K epochs x shuffled minibatches, as one scan
            perms = []
            for e in range(self.ppo_epochs):
                perm = jax.random.permutation(
                    jax.random.fold_in(kperm, e), batch_size
                )[: num_mb * mb_size]
                perms.append(perm.reshape(num_mb, mb_size))
            all_mb = jnp.concatenate(perms, axis=0)  # [K*num_mb, mb]

            (params, opt_state), metrics = jax.lax.scan(
                inner_update, (state.params, state.opt_state), all_mb
            )
            metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
            metrics["reward"] = reward.mean()
            new_state = TrainState(
                params=params, opt_state=opt_state,
                baseline_state=None, step=state.step + 1,
            )
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec: Optional[DecodeSpec] = None):
        spec = spec or self.val_spec

        def eval_step(params, instances, key):
            out = rollout(
                self.policy, params["policy"], self.env, instances, key, spec
            )
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state: TrainState, host: dict):
        return state, host

    def greedy_reward_fn(self):
        spec = DecodeSpec(kind="greedy", tanh_clipping=self.train_spec.tanh_clipping)
        fixed_key = jax.random.PRNGKey(0)

        def fn(params, instances):
            return rollout(
                self.policy, params["policy"], self.env, instances, fixed_key, spec
            ).reward

        return fn
