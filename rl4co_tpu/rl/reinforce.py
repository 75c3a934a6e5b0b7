"""REINFORCE (reference `rl4co/models/rl/reinforce/reinforce.py:21-208`).

Functional re-design: the Lightning module's `shared_step` becomes a pure
``loss(params, ...)`` and a jit-compiled ``train_step`` that fuses on-device
data generation, rollout, loss, and the optimizer update into one XLA
program (reference generates data in CPU DataLoader workers and runs a
Python decode loop — `rl/common/base.py:306-316`, §3.2 of SURVEY.md).
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
from rl4co_tpu.rl.baselines import Baseline, get_reinforce_baseline


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    baseline_state: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class REINFORCE:
    """REINFORCE with pluggable baseline.

    Args mirror the reference: policy, baseline name/object, optimizer
    settings (`configs/experiment/base.yaml:34-48`: Adam lr 1e-4,
    grad-clip 1.0).
    """

    env: Env
    policy: ConstructivePolicy
    baseline: Baseline | str = "rollout"
    train_spec: DecodeSpec = DecodeSpec(kind="sampling")
    val_spec: DecodeSpec = DecodeSpec(kind="greedy")
    lr: float = 1e-4
    grad_clip: float = 1.0
    optimizer: str = "adam"  # by-name (reference `optim_helpers.py:34-40`)
    lr_schedule: object = None  # optax.Schedule overriding constant lr
    # Fuse the baseline's greedy re-rollout into the SAME scan as the
    # sampling rollout (rollout baseline only): params are stacked
    # [live, snapshot] and vmapped, with a per-member traced temperature
    # (τ→0 = exact greedy under the sharpened categorical). Halves the
    # sequential decode steps per train step — the small-batch train step
    # is scan-latency-bound, not FLOPs-bound (618k env-steps/s at TSP-100
    # batch 512 where the 25.6k-wide eval rollout hits 6.9M). MEASURED
    # round 4 (runs/ab_fused_train.json): 1.003x on the chip — the step is
    # compute/HBM-bound, vmapping doubles per-step work while halving
    # steps. Kept opt-in as a validated equivalence (loss/grad-identical,
    # tested); not a performance lever on this hardware.
    fused_rollout_baseline: bool = False

    def __post_init__(self):
        if isinstance(self.baseline, str):
            object.__setattr__(self, "baseline", get_reinforce_baseline(self.baseline))

    # ---- components ----

    def make_optimizer(self) -> optax.GradientTransformation:
        from rl4co_tpu.utils.optim import get_optimizer

        return get_optimizer(
            self.optimizer,
            self.lr_schedule if self.lr_schedule is not None else self.lr,
            grad_clip=self.grad_clip,
        )

    def greedy_reward_fn(self):
        """(params, instances) -> greedy rewards; used by the rollout baseline
        (reference `baselines.py:189-198`)."""
        spec = DecodeSpec(
            kind="greedy",
            tanh_clipping=self.train_spec.tanh_clipping,
            compute_dtype=self.train_spec.compute_dtype,
        )
        fixed_key = jax.random.PRNGKey(0)  # greedy decode consumes no randomness

        def fn(params, instances):
            return rollout(
                self.policy, params, self.env, instances, fixed_key, spec
            ).reward

        return fn

    # ---- init ----

    def init(self, key: jax.Array) -> TrainState:
        kp, kb = jax.random.split(key)
        params = init_policy_params(self.policy, self.env, kp)
        opt_state = self.make_optimizer().init(params)
        baseline_state = self.baseline.init_state(kb, params, self.greedy_reward_fn())
        return TrainState(
            params=params,
            opt_state=opt_state,
            baseline_state=baseline_state,
            step=jnp.int32(0),
        )

    # ---- loss (reference `reinforce.py:71-111` calculate_loss) ----

    def loss(self, params, baseline_state, instances, key):
        from rl4co_tpu.rl.baselines import RolloutBaseline

        if (
            self.fused_rollout_baseline
            and isinstance(self.baseline, RolloutBaseline)
        ):
            return self._fused_loss(params, baseline_state, instances, key)
        out = rollout(
            self.policy, params, self.env, instances, key, self.train_spec
        )
        bl_val, bl_loss = self.baseline.eval(
            baseline_state, instances, out.reward, self.greedy_reward_fn()
        )
        advantage = out.reward - bl_val
        reinforce_loss = -(advantage * out.log_likelihood).mean()
        loss = reinforce_loss + bl_loss
        metrics = {
            "loss": loss,
            "reinforce_loss": reinforce_loss,
            "bl_loss": bl_loss,
            "reward": out.reward.mean(),
            "bl_val": jnp.asarray(bl_val).mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, (metrics, out)

    def _fused_loss(self, params, baseline_state, instances, key):
        """Sampling rollout + rollout-baseline greedy re-rollout in ONE
        vmapped scan: member 0 = live params at the spec temperature,
        member 1 = baseline snapshot params at τ→0 (exact greedy — after
        tanh clipping logits are in [-clip, clip], so /1e-9 sharpens the
        categorical to its argmax in f32). Same math as the unfused path
        (member 1 is under stop_gradient; the stack isolates member 0's
        gradient), half the sequential decode steps."""
        stacked = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, jax.lax.stop_gradient(b)]),
            params, baseline_state.bl_params,
        )
        temps = jnp.array([self.train_spec.temperature, 1e-9], jnp.float32)

        outs = jax.vmap(
            lambda p, t: rollout(
                self.policy, p, self.env, instances, key, self.train_spec,
                temperature_override=t,
            )
        )(stacked, temps)
        reward = outs.reward[0]
        ll = outs.log_likelihood[0]
        bl_val = jax.lax.stop_gradient(outs.reward[1])
        advantage = reward - bl_val
        reinforce_loss = -(advantage * ll).mean()
        metrics = {
            "loss": reinforce_loss,
            "reinforce_loss": reinforce_loss,
            "bl_loss": jnp.float32(0.0),
            "reward": reward.mean(),
            "bl_val": bl_val.mean(),
            "entropy": outs.entropy[0].mean(),
        }
        out = jax.tree_util.tree_map(lambda x: x[0], outs)
        return reinforce_loss, (metrics, out)

    # ---- train step factory ----

    def make_train_step(
        self, batch_size: int, mesh=None, donate: bool = True, chunk: int = 1
    ):
        """Build the jitted train step: generate → rollout → loss → update.

        With ``mesh``, instances are constrained to the ``dp`` axis and params
        replicated — XLA inserts the psum gradient reduction (the TPU
        equivalent of DDP all-reduce, SURVEY.md §2.10).

        With ``chunk > 1``, one dispatch runs ``chunk`` consecutive train
        steps under a single `lax.scan` and returns stacked ``(chunk,)``
        metrics. The per-step RNG stream is identical to ``chunk=1`` because
        each step folds the dispatch key with ``state.step`` — chaining is a
        pure dispatch-overhead optimization (the axon TPU tunnel charges a
        multi-ms round trip per dispatch, which at batch 512 is a large
        fraction of the ~100 ms step).
        """
        tx = self.make_optimizer()

        def step(state: TrainState, key: jax.Array):
            kdata, kroll = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kdata, batch_size)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                instances = jax.lax.with_sharding_constraint(
                    instances,
                    NamedSharding(mesh, P("dp")),
                )
            grads, (metrics, out) = jax.grad(self.loss, has_aux=True)(
                state.params, state.baseline_state, instances, kroll
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            baseline_state = self.baseline.update_step(state.baseline_state, out.reward)
            new_state = TrainState(
                params=params,
                opt_state=opt_state,
                baseline_state=baseline_state,
                step=state.step + 1,
            )
            return new_state, metrics

        if chunk > 1:
            def superstep(state: TrainState, key: jax.Array):
                return jax.lax.scan(
                    lambda s, _: step(s, key), state, None, length=chunk
                )
            return jax.jit(superstep, donate_argnums=(0,) if donate else ())
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # ---- evaluation ----

    def make_eval_step(self, spec: Optional[DecodeSpec] = None):
        spec = spec or self.val_spec

        def eval_step(params, instances, key):
            out = rollout(self.policy, params, self.env, instances, key, spec)
            return {"reward": out.reward.mean(), "max_reward": out.reward.max()}

        return jax.jit(eval_step)

    # ---- epoch-end hook (host side) ----

    def epoch_end(self, state: TrainState, host: dict):
        bl_state, host = self.baseline.epoch_end(
            state.baseline_state, state.params, self.greedy_reward_fn(), host
        )
        return state.replace(baseline_state=bl_state), host
