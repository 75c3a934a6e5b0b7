"""REINFORCE baselines (reference `rl4co/models/rl/reinforce/baselines.py:19-299`).

Functional re-design: each baseline is a frozen config object with

    init_state(key, ...) -> pytree state
    eval(state, instances, reward, rollout_fn) -> (bl_val [B], bl_loss scalar)
    update_step(state, reward)               -> state   (per-step, jittable)
    epoch_end(state, params, ...)            -> state   (host-side, e.g. t-test)

`rollout_fn(params, instances)` is a greedy no-grad rollout closure supplied
by the algorithm (used by the rollout baseline; reference
`baselines.py:189-198`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class BaselineState:
    """Union-ish jittable state shared by all baselines (unused fields stay
    None). Host-side state (the rollout baseline's held-out eval set and its
    rewards) lives in a plain dict owned by the trainer and is threaded
    through ``epoch_end`` only — it never enters the jitted train step."""

    value: Any = None          # exponential moving value (scalar) or None
    bl_params: Any = None      # rollout baseline policy params snapshot
    epoch: Any = None          # current epoch (int array)


@dataclasses.dataclass(frozen=True)
class Baseline:
    name = "no"

    def init_state(self, key, params, rollout_fn) -> BaselineState:
        return BaselineState()

    def eval(self, state: BaselineState, instances, reward, rollout_fn):
        return jnp.zeros_like(reward), jnp.float32(0.0)

    def update_step(self, state: BaselineState, reward) -> BaselineState:
        return state

    def epoch_end(self, state: BaselineState, params, rollout_fn, host: dict):
        """Host-side per-epoch hook; returns (state, host)."""
        if state.epoch is not None:
            state = state.replace(epoch=state.epoch + 1)
        return state, host

    @property
    def wrap_warmup(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class NoBaseline(Baseline):
    name = "no"


@dataclasses.dataclass(frozen=True)
class SharedBaseline(Baseline):
    """Mean over the POMO starts/samples group (reference `baselines.py:55-59`).

    Assumes the flat batch has repeat-major layout ``[S*B]`` produced by
    multistart/multisample expansion.
    """

    name = "shared"
    num_repeats: int = 1

    def eval(self, state, instances, reward, rollout_fn):
        r = reward.reshape(self.num_repeats, -1)
        bl = jnp.broadcast_to(r.mean(axis=0, keepdims=True), r.shape).reshape(-1)
        return bl, jnp.float32(0.0)


@dataclasses.dataclass(frozen=True)
class ExponentialBaseline(Baseline):
    """EMA of the batch-mean reward (reference `baselines.py:62-81`)."""

    name = "exponential"
    beta: float = 0.8

    def init_state(self, key, params, rollout_fn):
        return BaselineState(value=jnp.float32(jnp.nan))

    def eval(self, state, instances, reward, rollout_fn):
        v = jnp.where(jnp.isnan(state.value), reward.mean(), state.value)
        return jnp.broadcast_to(v, reward.shape), jnp.float32(0.0)

    def update_step(self, state, reward):
        m = reward.mean()
        v = jnp.where(
            jnp.isnan(state.value), m, self.beta * state.value + (1 - self.beta) * m
        )
        return state.replace(value=v)


@dataclasses.dataclass(frozen=True)
class MeanBaseline(Baseline):
    """Per-batch mean reward (reference `baselines.py:84-92`)."""

    name = "mean"

    def eval(self, state, instances, reward, rollout_fn):
        return jnp.broadcast_to(reward.mean(), reward.shape), jnp.float32(0.0)


@dataclasses.dataclass(frozen=True)
class CriticBaseline(Baseline):
    """Learned value function (reference `baselines.py:118-134`).

    The critic's params live inside the main param pytree (trained jointly);
    ``critic_fn(instances) -> value [B]`` is bound by the algorithm.
    """

    name = "critic"
    critic_fn: Optional[Callable] = None  # set by algorithm; excluded from hash
    huber: bool = False

    def __hash__(self):
        return hash((self.name, self.huber))

    def eval(self, state, instances, reward, rollout_fn):
        assert self.critic_fn is not None, "CriticBaseline requires critic_fn"
        value = self.critic_fn(instances)
        # value learns toward reward; actor sees stop_gradient(value)
        if self.huber:
            bl_loss = optax_huber(value, jax.lax.stop_gradient(reward)).mean()
        else:
            bl_loss = jnp.square(value - jax.lax.stop_gradient(reward)).mean()
        return jax.lax.stop_gradient(value), bl_loss


def optax_huber(pred, target, delta: float = 1.0):
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad**2 + delta * (abs_err - quad)


@dataclasses.dataclass(frozen=True)
class RolloutBaseline(Baseline):
    """Greedy rollout of a frozen policy snapshot (reference `baselines.py:160-262`).

    Per step: bl_val = greedy reward of the snapshot params on the same
    instances (no grad). Per epoch: challenge on a held-out set; accept the
    candidate when its mean reward improves and a one-sided paired t-test is
    significant at α=0.05 (reference `baselines.py:200-218`).
    """

    name = "rollout"
    bl_alpha: float = 0.05
    eval_batch_size: int = 256

    def init_state(self, key, params, rollout_fn):
        # Copy the snapshot: bl_params must not alias the live params, or
        # buffer donation in the jitted train step would donate them twice.
        return BaselineState(bl_params=_copy_pytree(params), epoch=jnp.int32(0))

    def eval(self, state, instances, reward, rollout_fn):
        bl_reward = jax.lax.stop_gradient(
            rollout_fn(state.bl_params, instances)
        )
        return bl_reward, jnp.float32(0.0)

    def epoch_end(self, state, params, rollout_fn, host: dict):
        """T-test challenge on the held-out set (reference
        `baselines.py:200-218`). ``host['eval_instances']`` is set up by the
        trainer; ``host['eval_rewards']`` holds the incumbent's rewards."""
        state = state.replace(epoch=state.epoch + 1)
        if host.get("eval_instances") is None:
            return state, host
        cand = np.asarray(rollout_fn(params, host["eval_instances"]))
        base = host.get("eval_rewards")
        if base is not None and np.shape(base) != cand.shape:
            # resumed with a different held-out-set size: the restored
            # incumbent rewards belong to other instances — restart the
            # incumbent from the current params instead of crashing
            base = None
        if base is None:
            return (
                state.replace(bl_params=_copy_pytree(params)),
                {**host, "eval_rewards": cand},
            )
        base = np.asarray(base)
        if cand.mean() - base.mean() > 0:
            p = paired_ttest_pvalue(cand, base)
            if p < self.bl_alpha:
                return (
                    state.replace(bl_params=_copy_pytree(params)),
                    {**host, "eval_rewards": cand},
                )
        return state, host


def _copy_pytree(tree):
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), tree)


def paired_ttest_pvalue(cand: np.ndarray, base: np.ndarray) -> float:
    """One-sided paired t-test p-value (H1: cand > base).

    Matches `scipy.stats.ttest_rel(cand, base).pvalue / 2` semantics used by
    the reference (`baselines.py:208-214`) without requiring scipy: for the
    n ≥ 30 sample sizes used here the normal approximation to the t
    distribution is accurate to ~1e-3.
    """
    d = cand - base
    n = d.shape[0]
    sd = d.std(ddof=1)
    if sd == 0:
        return 0.0 if d.mean() > 0 else 1.0
    t = d.mean() / (sd / math.sqrt(n))
    # one-sided p-value via normal tail
    return 0.5 * math.erfc(t / math.sqrt(2.0))


@dataclasses.dataclass(frozen=True)
class WarmupBaseline(Baseline):
    """Wraps another baseline; blends with an exponential baseline for the
    first ``n_epochs`` (reference `baselines.py:95-115`)."""

    name = "warmup"
    inner: Baseline = dataclasses.field(default_factory=RolloutBaseline)
    n_epochs: int = 1
    warmup_exp_beta: float = 0.8

    def init_state(self, key, params, rollout_fn):
        inner_state = self.inner.init_state(key, params, rollout_fn)
        return inner_state.replace(value=jnp.float32(jnp.nan), epoch=jnp.int32(0))

    def eval(self, state, instances, reward, rollout_fn):
        inner_val, inner_loss = self.inner.eval(state, instances, reward, rollout_fn)
        exp_val = jnp.where(jnp.isnan(state.value), reward.mean(), state.value)
        alpha = jnp.clip(state.epoch.astype(jnp.float32) / self.n_epochs, 0.0, 1.0)
        bl = alpha * inner_val + (1 - alpha) * exp_val
        return bl, alpha * inner_loss

    def update_step(self, state, reward):
        m = reward.mean()
        v = jnp.where(
            jnp.isnan(state.value),
            m,
            self.warmup_exp_beta * state.value + (1 - self.warmup_exp_beta) * m,
        )
        return state.replace(value=v)

    def epoch_end(self, state, params, rollout_fn, host):
        return self.inner.epoch_end(state, params, rollout_fn, host)


REINFORCE_BASELINES = {
    "no": NoBaseline,
    "none": NoBaseline,
    "shared": SharedBaseline,
    "exponential": ExponentialBaseline,
    "mean": MeanBaseline,
    "critic": CriticBaseline,
    "rollout": RolloutBaseline,
    "warmup": WarmupBaseline,
}


def get_reinforce_baseline(name: str, **kwargs) -> Baseline:
    """Factory (reference `baselines.py:265-299`). ``rollout`` is wrapped in a
    one-epoch warmup like the reference default."""
    if name == "rollout" and kwargs.pop("warmup", True):
        return WarmupBaseline(inner=RolloutBaseline(**kwargs), n_epochs=1)
    cls = REINFORCE_BASELINES.get(name)
    if cls is None:
        raise ValueError(f"Unknown baseline {name}. Available: {sorted(REINFORCE_BASELINES)}")
    return cls(**kwargs)
