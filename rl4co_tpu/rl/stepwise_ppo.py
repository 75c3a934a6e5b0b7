"""Stepwise PPO (reference `rl4co/models/rl/ppo/stepwise_ppo.py:40-167`).

The reference rolls the frozen old policy stepwise into a TorchRL replay
buffer (per-step rewards from the env's ``stepwise_reward`` mode — for
FJSP/JSSP the decrease of the makespan lower bound, `fjsp/env.py:277-283`),
then runs K clipped-PPO epochs over minibatches. Here the "replay buffer"
is the stacked scan output ``[T, B]`` flattened to ``[T*B]`` transitions
(with done-steps weighted out), and the whole train step is one jitted
program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from rl4co_tpu.decoding import (DecodeSpec, decode_action,
                               process_logits_spec, take_along_last)
from rl4co_tpu.rl.reinforce import TrainState


@dataclasses.dataclass(frozen=True)
class StepwisePPO:
    env: Any
    policy: Any  # stepwise policy with critic: apply(params, state) -> (logits, value)
    clip_range: float = 0.2
    ppo_epochs: int = 2
    mini_batch_size: int = 256
    vf_lambda: float = 0.5
    entropy_lambda: float = 0.01
    max_grad_norm: float = 0.5
    lr: float = 1e-4
    train_spec: DecodeSpec = DecodeSpec(kind="sampling")

    def make_optimizer(self):
        return optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm), optax.adam(self.lr)
        )

    def init(self, key: jax.Array) -> TrainState:
        kg, kp = jax.random.split(key)
        instances = self.env.generate_batch(kg, 2)
        state0 = self.env.reset_batch(instances)
        params = self.policy.init(kp, state0)
        tx = self.make_optimizer()
        return TrainState(params=params, opt_state=tx.init(params),
                          baseline_state=None, step=jnp.int32(0))

    def _lb_max(self, state):
        return jax.vmap(self.env.calc_lower_bound)(state).max(-1)

    def _collect(self, params_old, instances, key):
        """Stepwise rollout with the old policy; per-step reward = decrease of
        the makespan lower bound."""
        state0 = self.env.reset_batch(instances)
        t_steps = self.env.max_steps

        def body(state, k):
            mask = self.env.action_mask_batch(state)
            logits, _ = self.policy.apply(params_old, state)
            logprobs = process_logits_spec(logits.astype(jnp.float32), mask, self.train_spec)
            action, logprob = decode_action(k, logprobs, mask, self.train_spec)
            lb_before = self._lb_max(state)
            next_state = self.env.step_batch(state, action)
            reward = -(self._lb_max(next_state) - lb_before)
            valid = ~state.done
            return next_state, (state, action, logprob, reward, valid)

        final_state, memory = jax.lax.scan(
            body, state0, jax.random.split(key, t_steps)
        )
        return final_state, memory

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = self.make_optimizer()
        t_steps = self.env.max_steps
        total = t_steps * batch_size
        mb = min(self.mini_batch_size, total)
        num_mb = total // mb

        def minibatch_loss(params, states, actions, old_lp, rewards, valid):
            logits, value = self.policy.apply(params, states)
            mask = self.env.action_mask_batch(states)
            logprobs = process_logits_spec(logits.astype(jnp.float32), mask, self.train_spec)
            lp = take_along_last(logprobs, actions)
            probs = jnp.exp(logprobs)
            entropy = -jnp.sum(jnp.where(probs > 0, probs * logprobs, 0.0), -1)
            w = valid.astype(jnp.float32)
            wsum = w.sum() + 1e-9
            ratios = jnp.exp(lp - old_lp)
            adv = rewards - jax.lax.stop_gradient(value)
            surr = -jnp.minimum(
                ratios * adv,
                jnp.clip(ratios, 1 - self.clip_range, 1 + self.clip_range) * adv,
            )
            surrogate = (surr * w).sum() / wsum
            value_loss = (jnp.square(value - rewards) * w).sum() / wsum
            ent = (entropy * w).sum() / wsum
            loss = surrogate + self.vf_lambda * value_loss - self.entropy_lambda * ent
            return loss, {
                "loss": loss, "surrogate_loss": surrogate,
                "value_loss": value_loss, "entropy": ent,
            }

        def step(train_state: TrainState, key):
            kd, kr, kperm = jax.random.split(jax.random.fold_in(key, train_state.step), 3)
            instances = self.env.generate_batch(kd, batch_size)
            final_state, (states, actions, old_lp, rewards, valid) = self._collect(
                train_state.params, instances, kr
            )
            # flatten [T, B] -> [T*B]
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((total,) + x.shape[2:]), states
            )
            actions = actions.reshape(-1)
            old_lp = jax.lax.stop_gradient(old_lp.reshape(-1))
            rewards = rewards.reshape(-1)
            valid = valid.reshape(-1)

            def inner(carry, mb_idx):
                params, opt_state = carry
                take = lambda x: jnp.take(x, mb_idx, axis=0)
                grads, metrics = jax.grad(minibatch_loss, has_aux=True)(
                    params,
                    jax.tree_util.tree_map(take, flat),
                    take(actions), take(old_lp), take(rewards), take(valid),
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            perms = []
            for e in range(self.ppo_epochs):
                perm = jax.random.permutation(
                    jax.random.fold_in(kperm, e), total
                )[: num_mb * mb]
                perms.append(perm.reshape(num_mb, mb))
            all_mb = jnp.concatenate(perms, axis=0)
            (params, opt_state), metrics = jax.lax.scan(
                inner, (train_state.params, train_state.opt_state), all_mb
            )
            metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
            makespan = jnp.where(
                final_state.pad_mask, -jnp.inf, final_state.finish_times
            ).max(-1)
            metrics["reward"] = (-makespan).mean()
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=None, step=train_state.step + 1),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, spec: DecodeSpec = None):
        """Greedy stepwise rollout; reward = -makespan (reference logs the
        same final objective for the stepwise L2D path)."""
        spec = spec or DecodeSpec(kind="greedy")
        t_steps = self.env.max_steps

        def eval_step(params, instances, key):
            state0 = self.env.reset_batch(instances)

            def body(state, k):
                mask = self.env.action_mask_batch(state)
                logits, _ = self.policy.apply(params, state)
                logprobs = process_logits_spec(
                    logits.astype(jnp.float32), mask, spec
                )
                action, _ = decode_action(k, logprobs, mask, spec)
                return self.env.step_batch(state, action), None

            final_state, _ = jax.lax.scan(
                body, state0, jax.random.split(key, t_steps)
            )
            makespan = jnp.where(
                final_state.pad_mask, -jnp.inf, final_state.finish_times
            ).max(-1)
            r = -makespan
            return {"reward": r.mean(), "max_reward": r.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state: TrainState, host: dict):
        return state, host
