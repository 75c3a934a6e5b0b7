"""Environment engine core.

TPU-native re-design of `rl4co/envs/common/base.py:19-333` (`RL4COEnvBase`):
instead of a stateful TorchRL `EnvBase` operating on TensorDicts, an
environment here is a *frozen config object* exposing **pure, per-instance,
jittable functions**:

    generate(key)            -> instance  (dict[str, Array], unbatched)
    reset(instance)          -> state     (flax.struct pytree, unbatched)
    step(state, action)      -> state
    action_mask(state)       -> bool[num_actions]
    reward(state, actions)   -> scalar    (deferred, episode-end; reference
                                           `base.py:180-190` get_reward)

The framework vmaps these over the batch axis; POMO multistart and dihedral
augmentation become additional vmap axes instead of `batchify` copies
(reference `rl4co/utils/decoding.py:282-330`).

Conventions every env obeys (these are what make fixed-trip-count `lax.scan`
decoding work — SURVEY.md §7 "hard parts"):

- ``state.done: bool`` and ``state.i: int32`` (steps taken) always exist.
- ``max_steps`` is a *static* upper bound on episode length (jit trip count).
- Once ``done``, ``step`` is an identity (absorbing) and ``action_mask``
  allows exactly one "padding" action whose logprob the decode loop zeroes,
  and which never changes the reward (e.g. stay at depot).
- ``check_solution_validity(instance, actions)`` raises on infeasible
  solutions (host-side, test/debug only; reference `base.py:211-215`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, ClassVar, Dict

import jax
import jax.numpy as jnp

Instance = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class Env:
    """Base frozen env config. Subclasses add static fields (e.g. ``num_loc``).

    Frozen + eq/hash by config so env objects can be jit static arguments or
    closed over without retracing surprises.
    """

    name: ClassVar[str] = "base"

    # ---- per-instance pure functions (override in subclasses) ----

    def generate(self, key: jax.Array) -> Instance:
        raise NotImplementedError

    def reset(self, instance: Instance) -> Any:
        raise NotImplementedError

    def step(self, state: Any, action: jax.Array) -> Any:
        raise NotImplementedError

    def action_mask(self, state: Any) -> jax.Array:
        raise NotImplementedError

    def reward(self, state: Any, actions: jax.Array) -> jax.Array:
        raise NotImplementedError

    # ---- static shape info ----

    @property
    def num_actions(self) -> int:
        raise NotImplementedError

    @property
    def max_steps(self) -> int:
        """Static upper bound on decode steps (scan trip count)."""
        raise NotImplementedError

    # ---- multistart hooks (POMO; reference `envs/common/base.py:205-209`,
    #      `utils/ops.py:115-161`) ----

    def get_num_starts(self) -> int:
        return self.num_actions

    def select_start_nodes(self, instance: Instance, num_starts: int) -> jax.Array:
        """Return ``[num_starts]`` forced first actions for one instance."""
        return jnp.arange(num_starts, dtype=jnp.int32)

    # ---- host-side checks (reference `base.py:211-215`) ----

    def check_solution_validity(self, instance: Instance, actions) -> None:
        raise NotImplementedError

    # ---- classical-solver hook (reference `base.py:300-317`) ----

    def solve(self, instances: Instance, max_runtime: float = 10.0, **kwargs):
        """Solve instances with a classical solver; returns (actions, cost).
        Envs with baselines override this (e.g. MTVRP)."""
        raise NotImplementedError(f"No classical solver for env {self.name!r}")

    # ---- batched conveniences ----

    def generate_batch(self, key: jax.Array, batch_size: int) -> Instance:
        return jax.vmap(self.generate)(jax.random.split(key, batch_size))

    def reset_batch(self, instances: Instance) -> Any:
        return jax.vmap(self.reset)(instances)

    def step_batch(self, state: Any, action: jax.Array) -> Any:
        return jax.vmap(self.step)(state, action)

    def action_mask_batch(self, state: Any) -> jax.Array:
        return jax.vmap(self.action_mask)(state)

    def reward_batch(self, state: Any, actions: jax.Array) -> jax.Array:
        return jax.vmap(self.reward)(state, actions)

    def rollout_random(self, key: jax.Array, batch_size: int):
        """Random-policy rollout used by env smoke tests
        (reference helper `rl4co/utils/decoding.py:78-106`)."""
        kgen, kact = jax.random.split(key)
        instances = self.generate_batch(kgen, batch_size)
        state = self.reset_batch(instances)

        def body(carry, k):
            st = carry
            mask = self.action_mask_batch(st)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            action = jax.random.categorical(k, logits, axis=-1)
            st = self.step_batch(st, action.astype(jnp.int32))
            return st, action

        keys = jax.random.split(kact, self.max_steps)
        state, actions = jax.lax.scan(body, state, keys)
        actions = jnp.moveaxis(actions, 0, 1)  # [B, T]
        reward = self.reward_batch(state, actions)
        return instances, state, actions, reward


def make_composite_step(env: Env) -> Callable:
    """Return a jitted batched (mask → sample → step) closure for interactive use."""

    @jax.jit
    def _step(state, action):
        return env.step_batch(state, action)

    return _step
