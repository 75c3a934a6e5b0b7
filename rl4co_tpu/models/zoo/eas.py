"""Transductive search: Active Search and Efficient Active Search (EAS).

Reference:
- `rl4co/models/zoo/active_search/search.py:19-196`: per-instance
  fine-tuning of ALL policy params at test time (Bello et al. 2016).
- `rl4co/models/zoo/eas/{search,decoder}.py`: EAS (Hottung et al. 2022) —
  fine-tune only the instance embeddings (EAS-Emb) or an injected residual
  layer in the pointer (EAS-Lay); loss = REINFORCE (multistart advantage) +
  λ × imitation toward the incumbent best solution
  (`eas/search.py:198-280`).

Functional JAX re-design: the "trainable" part is just a pytree handed to
`jax.grad`; EAS-Emb optimizes the encoder output embeddings directly, and
the whole per-iteration update is one jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from rl4co_tpu.data.transforms import augment_instances
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import (
    ConstructivePolicy,
    rollout,
    rollout_from_cache,
)
from rl4co_tpu.utils.ops import unbatchify


def _multistart_spec(env: Env, tanh_clipping: float) -> tuple[DecodeSpec, int]:
    s = env.get_num_starts()
    return (
        DecodeSpec(kind="sampling", multistart=True, num_starts=s,
                   tanh_clipping=tanh_clipping),
        s,
    )


@dataclasses.dataclass(frozen=True)
class ActiveSearch:
    """Fine-tune all params per instance batch (reference
    `active_search/search.py`, lr 2.6e-4)."""

    env: Env
    policy: ConstructivePolicy
    max_iters: int = 200
    lr: float = 2.6e-4
    tanh_clipping: float = 10.0

    def search(self, params, instances, key: jax.Array):
        spec, s = _multistart_spec(self.env, self.tanh_clipping)
        tx = optax.adamw(self.lr, weight_decay=1e-6)
        opt_state = tx.init(params)

        def loss_fn(p, k):
            out = rollout(self.policy, p, self.env, instances, k, spec)
            reward = unbatchify(out.reward, s)
            ll = unbatchify(out.log_likelihood, s)
            adv = reward - reward.mean(axis=-1, keepdims=True)
            return -(adv * ll).mean(), reward.max(axis=-1)

        @jax.jit
        def step(p, opt_state, best, k):
            grads, iter_best = jax.grad(loss_fn, has_aux=True)(p, k)
            updates, opt_state = tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            best = jnp.maximum(best, iter_best)
            return p, opt_state, best

        b = jax.tree_util.tree_leaves(instances)[0].shape[0]
        best = jnp.full((b,), -jnp.inf)
        for it in range(self.max_iters):
            params, opt_state, best = step(
                params, opt_state, best, jax.random.fold_in(key, it)
            )
        return {"params": params, "best_reward": best}


@dataclasses.dataclass(frozen=True)
class EASLay:
    """EAS-Lay: fine-tune a small residual layer instead of the embeddings
    (reference `eas/decoder.py:12-60` injects it on the pointer glimpse; here
    the residual MLP acts on the encoder output embeddings feeding the
    decoder cache — same trainable-bottleneck idea, insertion point noted as
    a divergence)."""

    env: Env
    policy: ConstructivePolicy
    max_iters: int = 200
    lr: float = 4.1e-3
    eas_lambda: float = 0.013
    hidden_dim: int = 0  # 0 -> embed_dim
    tanh_clipping: float = 10.0

    def search(self, params, instances, key: jax.Array):
        spec, s = _multistart_spec(self.env, self.tanh_clipping)
        spec_eval = dataclasses.replace(
            spec, kind="evaluate", multistart=False, num_starts=0
        )
        embeddings = self.policy.apply(params, instances, method="encode")
        b, n, d = embeddings.shape
        h = self.hidden_dim or d
        k0, key = jax.random.split(key)
        eas = {
            "w1": 0.01 * jax.random.normal(k0, (d, h)),
            "b1": jnp.zeros((h,)),
            "w2": jnp.zeros((h, d)),  # zero-init: starts as identity residual
            "b2": jnp.zeros((d,)),
        }
        tx = optax.adamw(self.lr, weight_decay=1e-6)
        opt_state = tx.init(eas)
        t = self.env.max_steps

        def apply_eas(eas, emb):
            hmid = jax.nn.relu(emb @ eas["w1"] + eas["b1"])
            return emb + hmid @ eas["w2"] + eas["b2"]

        def loss_fn(eas, best_actions, have_best, k):
            emb = apply_eas(eas, embeddings)
            cache = self.policy.apply(params, emb, method="precompute")
            out = rollout_from_cache(
                self.policy, params, self.env, instances, cache, k, spec
            )
            reward = unbatchify(out.reward, s)
            ll = unbatchify(out.log_likelihood, s)
            adv = reward - reward.mean(axis=-1, keepdims=True)
            rl_loss = -(adv * ll).mean()
            out_best = rollout_from_cache(
                self.policy, params, self.env, instances, cache, k, spec_eval,
                replay_actions=best_actions,
            )
            il_loss = -jnp.where(have_best, out_best.log_likelihood, 0.0).mean()
            loss = rl_loss + self.eas_lambda * il_loss
            iter_best = reward.max(axis=-1)
            idx = reward.argmax(axis=-1)
            acts = unbatchify(out.actions, s)
            iter_best_actions = jnp.take_along_axis(
                acts, idx[:, None, None], axis=1
            )[:, 0]
            return loss, (iter_best, iter_best_actions)

        @jax.jit
        def step(eas, opt_state, best, best_actions, have_best, k):
            grads, (iter_best, iter_best_actions) = jax.grad(
                loss_fn, has_aux=True
            )(eas, best_actions, have_best, k)
            updates, opt_state = tx.update(grads, opt_state, eas)
            eas = optax.apply_updates(eas, updates)
            improved = iter_best > best
            best = jnp.where(improved, iter_best, best)
            best_actions = jnp.where(improved[:, None], iter_best_actions, best_actions)
            return eas, opt_state, best, best_actions, have_best | improved

        best = jnp.full((b,), -jnp.inf)
        best_actions = jnp.zeros((b, t), dtype=jnp.int32)
        have_best = jnp.zeros((b,), dtype=bool)
        for it in range(self.max_iters):
            eas, opt_state, best, best_actions, have_best = step(
                eas, opt_state, best, best_actions, have_best,
                jax.random.fold_in(key, it),
            )
        return {"eas_params": eas, "best_reward": best, "best_actions": best_actions}


@dataclasses.dataclass(frozen=True)
class EASEmb:
    """EAS-Emb: optimize the encoder output embeddings per instance
    (reference `eas/search.py`, lr 4.1e-3, λ=0.013, dihedral-8 augment)."""

    env: Env
    policy: ConstructivePolicy
    max_iters: int = 200
    lr: float = 4.1e-3
    eas_lambda: float = 0.013
    augment_size: int = 8
    tanh_clipping: float = 10.0

    def search(self, params, instances, key: jax.Array):
        if self.augment_size > 1:
            instances = augment_instances(instances, self.augment_size, "dihedral8")
        spec, s = _multistart_spec(self.env, self.tanh_clipping)
        spec_eval = dataclasses.replace(spec, kind="evaluate", multistart=False,
                                        num_starts=0)

        embeddings = self.policy.apply(params, instances, method="encode")
        tx = optax.adamw(self.lr, weight_decay=1e-6)
        opt_state = tx.init(embeddings)
        b = embeddings.shape[0]
        t = self.env.max_steps

        def loss_fn(emb, best_actions, have_best, k):
            cache = self.policy.apply(params, emb, method="precompute")
            out = rollout_from_cache(
                self.policy, params, self.env, instances, cache, k, spec
            )
            reward = unbatchify(out.reward, s)
            ll = unbatchify(out.log_likelihood, s)
            adv = reward - reward.mean(axis=-1, keepdims=True)
            rl_loss = -(adv * ll).mean()
            # imitation toward incumbent best (reference `eas/search.py:232-266`)
            out_best = rollout_from_cache(
                self.policy, params, self.env, instances, cache, k, spec_eval,
                replay_actions=best_actions,
            )
            il_loss = -jnp.where(have_best, out_best.log_likelihood, 0.0).mean()
            loss = rl_loss + self.eas_lambda * il_loss
            iter_best = reward.max(axis=-1)
            iter_best_idx = reward.argmax(axis=-1)
            acts = unbatchify(out.actions, s)  # [B, S, T]
            iter_best_actions = jnp.take_along_axis(
                acts, iter_best_idx[:, None, None], axis=1
            )[:, 0]
            return loss, (iter_best, iter_best_actions, rl_loss, il_loss)

        @jax.jit
        def step(emb, opt_state, best, best_actions, have_best, k):
            grads, aux = jax.grad(loss_fn, has_aux=True)(emb, best_actions, have_best, k)
            iter_best, iter_best_actions, rl_loss, il_loss = aux
            updates, opt_state = tx.update(grads, opt_state, emb)
            emb = optax.apply_updates(emb, updates)
            improved = iter_best > best
            best = jnp.where(improved, iter_best, best)
            best_actions = jnp.where(improved[:, None], iter_best_actions, best_actions)
            have_best = have_best | improved
            return emb, opt_state, best, best_actions, have_best, rl_loss, il_loss

        best = jnp.full((b,), -jnp.inf)
        best_actions = jnp.zeros((b, t), dtype=jnp.int32)
        have_best = jnp.zeros((b,), dtype=bool)
        for it in range(self.max_iters):
            embeddings, opt_state, best, best_actions, have_best, rl_loss, il_loss = step(
                embeddings, opt_state, best, best_actions, have_best,
                jax.random.fold_in(key, it),
            )
        if self.augment_size > 1:
            best = unbatchify(best, self.augment_size).max(axis=-1)
        return {
            "embeddings": embeddings,
            "best_reward": best,
            "best_actions": best_actions,
        }


# Reference exports `EAS` as the base transductive search with embedding
# fine-tuning enabled by default (`zoo/eas/search.py:19-60`,
# `models/__init__.py:28`); EASEmb is that default configuration.
EAS = EASEmb
