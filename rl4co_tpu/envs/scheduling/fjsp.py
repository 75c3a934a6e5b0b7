"""Flexible Job-Shop Scheduling Problem (+ JSSP) environments.

TPU-native re-design of `rl4co/envs/scheduling/fjsp/env.py:16-493`
(`FJSPEnv`), `fjsp/utils.py:190-271` (lower bounds / readiness) and
`rl4co/envs/scheduling/jssp/env.py:13-121` (`JSSPEnv(FJSPEnv)`, Taillard
generator).

Action space: ``1 + num_jobs × num_mas`` (index 0 = no-op, used only as the
absorbing pad action once done — `mask_no_ops=True` semantics). Scheduling
an action triggers the reference's transit-to-next-time loop
(`fjsp/env.py:352-394`), here a per-instance `lax.while_loop` advancing the
clock until a feasible action exists.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import mark_where_in, set_at

INIT_FINISH = 9999.0


@struct.dataclass
class FJSPState:
    proc_times: jax.Array     # [M, O] remaining processable times (0 = not eligible / scheduled)
    orig_proc_times: jax.Array  # [M, O] static copy (features)
    pad_mask: jax.Array       # bool [O] True = padding op
    start_op: jax.Array       # [J]
    end_op: jax.Array         # [J]
    job_ops_adj: jax.Array    # [J, O] binary job-op membership
    ops_job_map: jax.Array    # [O] job id per op
    ops_seq_order: jax.Array  # [O] position of op within its job (decremented)
    start_times: jax.Array    # [O]
    finish_times: jax.Array   # [O] INIT_FINISH if unscheduled
    ma_of_op: jax.Array       # [O] machine assignment (-1 unassigned)
    busy_until: jax.Array     # [M]
    next_op: jax.Array        # [J]
    op_scheduled: jax.Array   # bool [O]
    job_in_process: jax.Array # bool [J]
    job_done: jax.Array       # bool [J]
    time: jax.Array           # f32
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        return jnp.zeros_like(self.i)


@dataclasses.dataclass(frozen=True)
class FJSP(Env):
    name = "fjsp"
    num_jobs: int = 5
    num_mas: int = 3
    min_ops_per_job: int = 2
    max_ops_per_job: int = 4
    min_processing_time: int = 1
    max_processing_time: int = 20
    min_eligible_ma_per_op: int = 1
    max_eligible_ma_per_op: int = 2

    @property
    def n_ops_max(self) -> int:
        return self.num_jobs * self.max_ops_per_job

    # ---- generation (reference `fjsp/generator.py:117-175`) ----

    def generate(self, key: jax.Array) -> Instance:
        kn, ke, kp, kperm = jax.random.split(key, 4)
        j, m, o = self.num_jobs, self.num_mas, self.n_ops_max
        n_ops = jax.random.randint(
            kn, (j,), self.min_ops_per_job, self.max_ops_per_job + 1
        )
        end_op = jnp.cumsum(n_ops) - 1
        start_op = jnp.concatenate([jnp.zeros((1,), end_op.dtype), end_op[:-1] + 1])
        total = n_ops.sum()
        pad_mask = jnp.arange(o) >= total
        n_eligible = jax.random.randint(
            ke, (o,), self.min_eligible_ma_per_op, self.max_eligible_ma_per_op + 1
        )
        n_eligible = jnp.where(pad_mask, 0, n_eligible)
        # eligible machines: random ranking per op, top n_eligible
        scores = jax.random.uniform(kperm, (o, m))
        rank = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
        eligible = rank < n_eligible[:, None]  # [O, M]
        times = jax.random.randint(
            kp, (o, m), self.min_processing_time, self.max_processing_time + 1
        ).astype(jnp.float32)
        proc_times = jnp.where(eligible, times, 0.0).T  # [M, O]
        return {
            "proc_times": proc_times,
            "pad_mask": pad_mask,
            "start_op_per_job": start_op.astype(jnp.int32),
            "end_op_per_job": end_op.astype(jnp.int32),
        }

    # ---- reset (reference `fjsp/env.py:147-186`) ----

    def reset(self, instance: Instance) -> FJSPState:
        j, m, o = self.num_jobs, self.num_mas, self.n_ops_max
        start_op = instance["start_op_per_job"]
        end_op = instance["end_op_per_job"]
        ops = jnp.arange(o)
        job_ops_adj = (
            (ops[None, :] >= start_op[:, None]) & (ops[None, :] <= end_op[:, None])
        ).astype(jnp.float32)
        job_ops_adj = job_ops_adj * (~instance["pad_mask"])[None, :]
        ops_job_map = jnp.argmax(job_ops_adj, axis=0).astype(jnp.int32)
        ops_seq_order = (job_ops_adj * (jnp.cumsum(job_ops_adj, axis=1) - 1)).sum(0)
        return FJSPState(
            proc_times=instance["proc_times"],
            orig_proc_times=instance["proc_times"],
            pad_mask=instance["pad_mask"],
            start_op=start_op,
            end_op=end_op,
            job_ops_adj=job_ops_adj,
            ops_job_map=ops_job_map,
            ops_seq_order=ops_seq_order.astype(jnp.int32),
            start_times=jnp.zeros((o,)),
            finish_times=jnp.full((o,), INIT_FINISH),
            ma_of_op=jnp.full((o,), -1, jnp.int32),
            busy_until=jnp.zeros((m,)),
            next_op=start_op.astype(jnp.int32),
            op_scheduled=jnp.zeros((o,), bool),
            job_in_process=jnp.zeros((j,), bool),
            job_done=jnp.zeros((j,), bool),
            time=jnp.float32(0.0),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    # ---- mask (reference `fjsp/env.py:187-216`) ----

    def _job_machine_feasible(self, state: FJSPState) -> jax.Array:
        j, m = self.num_jobs, self.num_mas
        infeasible = (
            state.job_done[:, None]
            | state.job_in_process[:, None]
            | (state.busy_until > state.time)[None, :]
        )
        next_proc = state.proc_times[:, state.next_op].T  # [J, M]
        infeasible = infeasible | (next_proc == 0)
        return ~infeasible

    def action_mask(self, state: FJSPState) -> jax.Array:
        feasible = self._job_machine_feasible(state).reshape(-1)
        return jnp.concatenate([state.done[None], feasible & ~state.done])

    # ---- transitions ----

    def _transit_once(self, state: FJSPState) -> FJSPState:
        # advance clock to the next machine-idle event
        # (reference `_transit_to_next_time`, `fjsp/env.py:352-394`)
        future = jnp.where(state.busy_until > state.time, state.busy_until, jnp.inf)
        new_time = jnp.minimum(future.min(), 1e12)
        time = jnp.where(jnp.isfinite(future.min()), new_time, state.time)
        curr_ops_end = state.finish_times[state.next_op]
        op_finished = state.job_in_process & (curr_ops_end <= time)
        job_finished = op_finished & (state.next_op == state.end_op)
        next_op = jnp.where(op_finished & ~job_finished, state.next_op + 1, state.next_op)
        job_in_process = state.job_in_process & ~op_finished
        job_done = state.job_done | job_finished
        return state.replace(
            time=time,
            next_op=next_op,
            job_in_process=job_in_process,
            job_done=job_done,
            done=job_done.all(),
        )

    def _make_step(self, state: FJSPState, action: jax.Array) -> FJSPState:
        job = action // self.num_mas
        machine = action % self.num_mas
        op = state.next_op[job]
        proc = state.proc_times[machine, op]
        finish = state.time + proc
        op_col = jnp.arange(state.proc_times.shape[1]) == op
        return state.replace(
            job_in_process=set_at(state.job_in_process, job, True),
            op_scheduled=set_at(state.op_scheduled, op, True),
            start_times=set_at(state.start_times, op, state.time),
            finish_times=set_at(state.finish_times, op, finish),
            ma_of_op=set_at(state.ma_of_op, op, machine),
            busy_until=set_at(state.busy_until, machine, finish),
            proc_times=jnp.where(op_col[None, :], 0.0, state.proc_times),
            ops_seq_order=jnp.maximum(
                state.ops_seq_order - state.job_ops_adj[job].astype(jnp.int32), 0
            ),
        )

    def step(self, state: FJSPState, action: jax.Array) -> FJSPState:
        action = action.astype(jnp.int32)
        is_noop = action == 0
        new = jax.lax.cond(
            is_noop, lambda s: s, lambda s: self._make_step(s, action - 1), state
        )

        # advance time until some action is feasible (or done)
        def no_action(s):
            return ~self._job_machine_feasible(s).any() & ~s.done

        new = jax.lax.while_loop(no_action, self._transit_once, new)
        new = new.replace(i=state.i + 1)
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def reward(self, state: FJSPState, actions: jax.Array) -> jax.Array:
        # -makespan (reference `fjsp/env.py:396-402`)
        ft = jnp.where(state.pad_mask, -jnp.inf, state.finish_times)
        return -ft.max()

    # ---- lower bounds (reference `fjsp/utils.py:190-259`) ----

    def calc_lower_bound(self, state: FJSPState) -> jax.Array:
        o = self.n_ops_max
        # predecessor finish time (op-1 within the same job, else 0);
        # "first op of job" from the static structure (reference builds the
        # pred adjacency once at reset, `fjsp/env.py:120-133`)
        is_first = mark_where_in(jnp.zeros((o,), bool), state.start_op, True)
        prev_finish = jnp.concatenate([jnp.zeros((1,)), state.finish_times[:-1]])
        maybe_start = jnp.where(~is_first, prev_finish, 0.0)
        wait = jnp.clip(state.busy_until[:, None] - maybe_start[None, :], 0.0)
        ptw = jnp.where(state.proc_times == 0, 0.0, state.proc_times + wait)
        ops_proc = ptw.sum(0) / (jnp.maximum((state.proc_times > 0).sum(0), 0) + 1e-9)
        ops_proc = jnp.where(state.op_scheduled, 0.0, ops_proc)
        sched = state.op_scheduled.astype(jnp.float32)
        assigned = state.job_ops_adj * sched[None, :]
        not_sched = state.job_ops_adj * (1.0 - sched[None, :])
        ft_rows = assigned * state.finish_times[None, :]
        first_diff = ft_rows - jnp.concatenate(
            [jnp.zeros_like(ft_rows[:, :1]), ft_rows[:, :-1]], axis=1
        )
        ft_diff = assigned * first_diff
        lb_end = not_sched * ops_proc[None, :] + ft_diff
        lbs = (state.job_ops_adj * jnp.cumsum(lb_end, axis=-1)).sum(0)
        return jnp.nan_to_num(lbs, nan=0.0)

    def op_is_ready(self, state: FJSPState) -> jax.Array:
        o = self.n_ops_max
        is_first = mark_where_in(jnp.zeros((o,), bool), state.start_op, True)
        prev_finish = jnp.concatenate([jnp.zeros((1,)), state.finish_times[:-1]])
        pred_done = jnp.where(~is_first, prev_finish, 0.0) <= state.time
        return pred_done & ~state.op_scheduled

    @property
    def num_actions(self) -> int:
        return 1 + self.num_jobs * self.num_mas

    @property
    def max_steps(self) -> int:
        return self.n_ops_max + 1

    def check_solution_validity(self, instance: Instance, actions) -> None:
        pass  # schedule consistency enforced by construction

    def rollout_random(self, key: jax.Array, batch_size: int):
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
        actions = jnp.moveaxis(actions, 0, 1)
        reward = self.reward_batch(state, actions)
        return instances, state, actions, reward


@dataclasses.dataclass(frozen=True)
class JSSP(FJSP):
    """Job-Shop Scheduling: every job has exactly ``num_mas`` operations,
    each eligible on exactly one (distinct) machine — Taillard-style
    (reference `rl4co/envs/scheduling/jssp/{env,generator}.py`)."""

    name = "jssp"
    min_ops_per_job: int = 0  # unused
    max_ops_per_job: int = 0  # unused

    @property
    def n_ops_max(self) -> int:
        return self.num_jobs * self.num_mas

    # JSSP actions select a JOB; the machine is implied by the next op's
    # unique eligibility (reference `jssp/env.py:100-105` _translate_action).

    @property
    def num_actions(self) -> int:
        return 1 + self.num_jobs

    def action_mask(self, state: FJSPState) -> jax.Array:
        feasible_jm = self._job_machine_feasible(state)  # [J, M]
        feasible_job = feasible_jm.any(axis=-1)
        return jnp.concatenate([state.done[None], feasible_job & ~state.done])

    def _make_step(self, state: FJSPState, action: jax.Array) -> FJSPState:
        job = action  # already 0-based job index
        op = state.next_op[job]
        machine = jnp.argmax(state.orig_proc_times[:, op] > 0)
        proc = state.proc_times[machine, op]
        finish = state.time + proc
        op_col = jnp.arange(state.proc_times.shape[1]) == op
        return state.replace(
            job_in_process=set_at(state.job_in_process, job, True),
            op_scheduled=set_at(state.op_scheduled, op, True),
            start_times=set_at(state.start_times, op, state.time),
            finish_times=set_at(state.finish_times, op, finish),
            ma_of_op=set_at(state.ma_of_op, op, machine.astype(jnp.int32)),
            busy_until=set_at(state.busy_until, machine, finish),
            proc_times=jnp.where(op_col[None, :], 0.0, state.proc_times),
            ops_seq_order=jnp.maximum(
                state.ops_seq_order - state.job_ops_adj[job].astype(jnp.int32), 0
            ),
        )

    def _transit_guard(self, s):
        return ~self._job_machine_feasible(s).any() & ~s.done

    def step(self, state: FJSPState, action: jax.Array) -> FJSPState:
        action = action.astype(jnp.int32)
        is_noop = action == 0
        new = jax.lax.cond(
            is_noop, lambda s: s, lambda s: self._make_step(s, action - 1), state
        )
        new = jax.lax.while_loop(self._transit_guard, self._transit_once, new)
        new = new.replace(i=state.i + 1)
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def generate(self, key: jax.Array) -> Instance:
        kp, km = jax.random.split(key)
        j, m = self.num_jobs, self.num_mas
        o = j * m
        times = jax.random.randint(
            kp, (j, m), self.min_processing_time, self.max_processing_time + 1
        ).astype(jnp.float32)
        # machine order per job: random permutation
        perms = jax.vmap(lambda k: jax.random.permutation(k, m))(
            jax.random.split(km, j)
        )  # [J, M] machine of each op position
        ops_machine = perms.reshape(-1)  # [O]
        # column j has exactly one machine -> one-hot matmul-free build
        proc_times = jax.nn.one_hot(
            ops_machine, m, axis=0, dtype=times.dtype
        ) * times.reshape(-1)[None, :]
        end_op = (jnp.arange(j) + 1) * m - 1
        start_op = jnp.arange(j) * m
        return {
            "proc_times": proc_times,
            "pad_mask": jnp.zeros((o,), bool),
            "start_op_per_job": start_op.astype(jnp.int32),
            "end_op_per_job": end_op.astype(jnp.int32),
        }
