"""Single Machine Total Weighted Tardiness Problem environment.

TPU-native re-design of `rl4co/envs/scheduling/smtwtp/env.py:15-194`
(`SMTWTPEnv`) and `smtwtp/generator.py` (Ye et al. 2023 sampling): order
``num_job`` jobs on one machine; node 0 is a dummy start with zero features;
reward = −Σ weight·max(0, completion − due).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import set_at


@struct.dataclass
class SMTWTPState:
    job_due_time: jax.Array      # [J+1]
    job_weight: jax.Array        # [J+1]
    job_process_time: jax.Array  # [J+1]
    current_job: jax.Array       # i32
    current_time: jax.Array      # f32
    available: jax.Array         # bool [J+1]
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        return self.current_job


@dataclasses.dataclass(frozen=True)
class SMTWTP(Env):
    name = "smtwtp"
    num_job: int = 10
    min_time_span: float = 0.0
    max_time_span: float | None = None  # default num_job / 2
    min_job_weight: float = 0.0
    max_job_weight: float = 1.0
    min_process_time: float = 0.0
    max_process_time: float = 1.0

    @property
    def _max_time_span(self) -> float:
        return self.max_time_span if self.max_time_span is not None else self.num_job / 2

    def generate(self, key: jax.Array) -> Instance:
        kd, kw, kp = jax.random.split(key, 3)
        n = self.num_job + 1
        due = jax.random.uniform(kd, (n,), minval=self.min_time_span, maxval=self._max_time_span)
        weight = jax.random.uniform(kw, (n,), minval=self.min_job_weight, maxval=self.max_job_weight)
        process = jax.random.uniform(
            kp, (n,), minval=self.min_process_time, maxval=self.max_process_time
        )
        # dummy start node 0 has zero features (reference `generator.py:66-69`)
        due = due.at[0].set(0.0)
        weight = weight.at[0].set(0.0)
        process = process.at[0].set(0.0)
        return {"job_due_time": due, "job_weight": weight, "job_process_time": process}

    def reset(self, instance: Instance) -> SMTWTPState:
        available = jnp.ones((self.num_job + 1,), dtype=bool).at[0].set(False)
        return SMTWTPState(
            job_due_time=instance["job_due_time"],
            job_weight=instance["job_weight"],
            job_process_time=instance["job_process_time"],
            current_job=jnp.int32(0),
            current_time=jnp.float32(0.0),
            available=available,
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: SMTWTPState, action: jax.Array) -> SMTWTPState:
        action = action.astype(jnp.int32)
        available = set_at(state.available, action, False)
        current_time = state.current_time + state.job_process_time[action]
        new = state.replace(
            current_job=action,
            current_time=current_time,
            available=available,
            i=state.i + 1,
            done=~available.any(),
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: SMTWTPState) -> jax.Array:
        pad = jnp.zeros_like(state.available).at[0].set(True)
        return jnp.where(state.done, pad, state.available)

    def reward(self, state: SMTWTPState, actions: jax.Array) -> jax.Array:
        # -total weighted tardiness (reference `smtwtp/env.py:169-186`)
        acts = actions[: self.num_job]
        proc = state.job_process_time[acts]
        completion = jnp.cumsum(proc)
        due = state.job_due_time[acts]
        weight = state.job_weight[acts]
        tardiness = jnp.maximum(0.0, completion - due)
        return -(weight * tardiness).sum()

    @property
    def num_actions(self) -> int:
        return self.num_job + 1

    @property
    def max_steps(self) -> int:
        return self.num_job

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.num_job]
        assert (np.sort(actions) == np.arange(1, self.num_job + 1)).all(), (
            "Each job must be scheduled exactly once"
        )
