"""Mixed-environment REINFORCE: interleaved per-env batches, shared trunk.

BASELINE.json's OP+PCTSP config: one policy trained across several envs.
Design (see `models/policies/multi_env.py`): one param pytree holds every
env's embeddings + the shared encoder/decoder; each env gets its own jitted
train step (XLA specializes per-env masks/shapes); the host round-robins
between them — every step updates the same shared parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models.policies.constructive import rollout
from rl4co_tpu.models.policies.multi_env import (
    MultiEnvAttentionPolicy,
    init_multi_env_params,
)
from rl4co_tpu.rl.baselines import get_reinforce_baseline
from rl4co_tpu.rl.reinforce import TrainState


@struct.dataclass
class MultiEnvBaselineState:
    """Per-env baseline states as a dict pytree."""

    states: Any


@dataclasses.dataclass(frozen=True)
class MultiEnvREINFORCE:
    """REINFORCE over several envs with a shared-trunk policy.

    ``envs``: ``{name: Env}``. Each env keeps its own baseline state; train
    steps interleave envs round-robin (reference parity target: train one
    policy across OP+PCTSP with swapped embeddings, BASELINE.json:configs).
    """

    envs: Any                              # dict {name: Env}
    policy: MultiEnvAttentionPolicy = None
    baseline: str = "exponential"
    train_spec: DecodeSpec = DecodeSpec(kind="sampling", tanh_clipping=10.0)
    val_spec: DecodeSpec = DecodeSpec(kind="greedy", tanh_clipping=10.0)
    lr: float = 1e-4
    grad_clip: float = 1.0

    def __post_init__(self):
        if self.policy is None:
            object.__setattr__(
                self,
                "policy",
                MultiEnvAttentionPolicy(
                    env_name=next(iter(self.envs)),
                    env_names=tuple(self.envs),
                ),
            )
        object.__setattr__(
            self, "_baselines",
            {n: get_reinforce_baseline(self.baseline) for n in self.envs},
        )

    @property
    def env(self):  # Trainer compatibility: primary env
        return self.envs[next(iter(self.envs))]

    def make_optimizer(self):
        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr)
        )

    def greedy_reward_fn(self, name: str):
        spec = DecodeSpec(kind="greedy",
                          tanh_clipping=self.train_spec.tanh_clipping,
                          compute_dtype=self.train_spec.compute_dtype)
        policy = self.policy.for_env(name)
        env = self.envs[name]
        fixed = jax.random.PRNGKey(0)

        def fn(params, instances):
            return rollout(policy, params, env, instances, fixed, spec).reward

        return fn

    def init(self, key: jax.Array) -> TrainState:
        kp, kb = jax.random.split(key)
        params = init_multi_env_params(self.policy, self.envs, kp)
        opt_state = self.make_optimizer().init(params)
        bl_states = {
            n: self._baselines[n].init_state(
                jax.random.fold_in(kb, i), params, self.greedy_reward_fn(n)
            )
            for i, n in enumerate(self.envs)
        }
        return TrainState(
            params=params,
            opt_state=opt_state,
            baseline_state=MultiEnvBaselineState(states=bl_states),
            step=jnp.int32(0),
        )

    def _loss_for(self, name: str):
        policy = self.policy.for_env(name)
        env = self.envs[name]
        bl = self._baselines[name]
        greedy_fn = self.greedy_reward_fn(name)

        def loss(params, bl_state, instances, key):
            out = rollout(policy, params, env, instances, key, self.train_spec)
            bl_val, bl_loss = bl.eval(bl_state, instances, out.reward, greedy_fn)
            advantage = out.reward - bl_val
            l = -(advantage * out.log_likelihood).mean() + bl_loss
            return l, {"loss": l, "reward": out.reward.mean()}

        return loss

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = False,
                        chunk: int = 1):
        """Round-robin over envs; one jitted step per env, shared params.

        With ``chunk > 1``, each dispatch scans ``chunk`` consecutive steps
        of ONE env under `lax.scan` (different envs have different instance
        pytree shapes, so they cannot share a scan body) and the host
        alternates envs across dispatches — interleaving granularity
        becomes ``chunk`` steps instead of 1. At the production chunk of
        125 and 1,250 steps/epoch that is 10 alternations per epoch; the
        per-step RNG stream is identical to ``chunk=1`` (each step folds
        the dispatch key with ``state.step``). Without this the mixed run
        is dispatch-bound on remote tunnels: 1,250 round trips/epoch
        (round-2's 174 s/epoch mixed pace was exactly this).
        """
        tx = self.make_optimizer()
        names = list(self.envs)

        def make_env_step(name):
            loss_fn = self._loss_for(name)
            bl = self._baselines[name]
            env = self.envs[name]

            def step(state: TrainState, key: jax.Array):
                kd, kr = jax.random.split(jax.random.fold_in(key, state.step))
                instances = env.generate_batch(kd, batch_size)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    instances = jax.lax.with_sharding_constraint(
                        instances, NamedSharding(mesh, P("dp")))
                bl_states = dict(state.baseline_state.states)
                grads, metrics = jax.grad(loss_fn, has_aux=True)(
                    state.params, bl_states[name], instances, kr
                )
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                bl_states[name] = bl.update_step(bl_states[name],
                                                 metrics["reward"][None])
                return TrainState(
                    params=params, opt_state=opt_state,
                    baseline_state=MultiEnvBaselineState(states=bl_states),
                    step=state.step + 1,
                ), metrics

            if chunk > 1:
                def superstep(state: TrainState, key: jax.Array):
                    return jax.lax.scan(
                        lambda s, _: step(s, key), state, None, length=chunk
                    )
                return jax.jit(superstep,
                               donate_argnums=(0,) if donate else ())
            return jax.jit(step, donate_argnums=(0,) if donate else ())

        env_steps = {n: make_env_step(n) for n in names}
        counter = {"i": 0}

        def dispatch(state, key):
            name = names[counter["i"] % len(names)]
            counter["i"] += 1
            state, metrics = env_steps[name](state, key)
            metrics = dict(metrics)
            # stacked over chunk so the Trainer's `v[-1]` log picks the name
            metrics["env"] = (np.asarray([name] * chunk) if chunk > 1 else name)
            return state, metrics

        return dispatch

    def make_eval_step(self, spec: Optional[DecodeSpec] = None, env_name=None):
        spec = spec or self.val_spec
        name = env_name or next(iter(self.envs))
        policy = self.policy.for_env(name)
        env = self.envs[name]

        @jax.jit
        def eval_step(params, instances, key):
            out = rollout(policy, params, env, instances, key, spec)
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return eval_step

    def epoch_end(self, state: TrainState, host: dict):
        return state, host
