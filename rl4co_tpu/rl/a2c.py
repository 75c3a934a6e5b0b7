"""A2C = REINFORCE with a learned critic baseline
(reference `rl4co/models/rl/a2c/a2c.py:13-58`).

The reference uses separate actor/critic optimizer groups; here both live in
one param dict with per-branch learning rates via `optax.multi_transform`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from rl4co_tpu.models.policies.constructive import init_policy_params, rollout
from rl4co_tpu.rl.critic import CriticNetwork
from rl4co_tpu.rl.reinforce import REINFORCE, TrainState


@dataclasses.dataclass(frozen=True)
class A2C(REINFORCE):
    critic: Optional[CriticNetwork] = None
    critic_lr: Optional[float] = None  # default: same as actor lr

    def __post_init__(self):
        object.__setattr__(self, "baseline", None)  # critic plays the baseline
        if self.critic is None:
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
        actor_tx = optax.adam(self.lr)
        critic_tx = optax.adam(self.critic_lr or self.lr)
        tx = optax.multi_transform(
            {"policy": actor_tx, "critic": critic_tx},
            param_labels={"policy": "policy", "critic": "critic"},
        )
        if self.grad_clip and self.grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
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

    def loss(self, params, baseline_state, instances, key):
        out = rollout(
            self.policy, params["policy"], self.env, instances, key, self.train_spec
        )
        value = self.critic.apply(params["critic"], instances)
        advantage = out.reward - jax.lax.stop_gradient(value)
        reinforce_loss = -(advantage * out.log_likelihood).mean()
        bl_loss = jnp.square(value - out.reward).mean()
        loss = reinforce_loss + bl_loss
        metrics = {
            "loss": loss,
            "reinforce_loss": reinforce_loss,
            "bl_loss": bl_loss,
            "reward": out.reward.mean(),
            "bl_val": value.mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, metrics

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = self.make_optimizer()

        def step(state: TrainState, key: jax.Array):
            kdata, kroll = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kdata, batch_size)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                instances = jax.lax.with_sharding_constraint(
                    instances, NamedSharding(mesh, P("dp"))
                )
            grads, metrics = jax.grad(self.loss, has_aux=True)(
                state.params, None, instances, kroll
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state,
                baseline_state=None, step=state.step + 1,
            )
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec=None):
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
        from rl4co_tpu.decoding import DecodeSpec

        spec = DecodeSpec(kind="greedy", tanh_clipping=self.train_spec.tanh_clipping)
        fixed_key = jax.random.PRNGKey(0)

        def fn(params, instances):
            return rollout(
                self.policy, params["policy"], self.env, instances, fixed_key, spec
            ).reward

        return fn
