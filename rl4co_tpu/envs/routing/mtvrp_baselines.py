"""Classical-solver escape hatch for MTVRP (all 16 variants).

Reference `rl4co/envs/routing/mtvrp/baselines/solve.py:29-83` dispatches to
external solvers (PyVRP / LKH-3 / OR-Tools) via a multiprocessing pool, each
a pip-installed native package. This environment is zero-egress, so the
in-tree default is a TPU-native **multistart nearest-feasible-neighbor**
construction that reuses the env's own jitted feasibility mask — one
rollout handles every variant combination (O/TW/L/B) exactly as the MDP
defines it — followed by best-of-S selection. External adapters keep the
reference's interface and raise ImportError when the package is absent
(mirroring `solve.py:50-62`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def greedy_solve(env, instances, num_samples: int = 16, key: Optional[jax.Array] = None):
    """Multistart nearest-feasible-neighbor over the env's action mask.

    Sample 0 is pure greedy; samples 1.. perturb distances with Gumbel noise
    for diversity. Returns (actions [B, T], cost [B]) with cost = −reward.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    from rl4co_tpu.utils.ops import batchify, unbatchify

    b = jax.tree_util.tree_leaves(instances)[0].shape[0]
    s = num_samples
    tiled = batchify(instances, s)
    state0 = env.reset_batch(tiled)
    t_steps = env.max_steps
    keys = jax.random.split(key, t_steps)
    # sample index of each tiled row (repeat-major): row k*b + i -> sample k
    sample_idx = jnp.repeat(jnp.arange(s), b)

    def step_fn(state, k):
        mask = env.action_mask_batch(state)                      # [S*B, N+1]
        cur = state.locs[jnp.arange(state.locs.shape[0]), state.current_node]
        d = jnp.linalg.norm(state.locs - cur[:, None, :], axis=-1)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(k, d.shape, minval=1e-9, maxval=1.0)
        ))
        temp = jnp.where(sample_idx == 0, 0.0, 0.05)[:, None]
        score = -d + temp * gumbel
        # light depot penalty: avoid returning while customers are feasible
        score = score.at[:, 0].add(-0.1)
        score = jnp.where(mask, score, -jnp.inf)
        action = jnp.argmax(score, axis=-1).astype(jnp.int32)
        return env.step_batch(state, action), action

    final_state, actions = jax.lax.scan(step_fn, state0, keys)
    actions = jnp.moveaxis(actions, 0, 1)                        # [S*B, T]
    reward = env.reward_batch(final_state, actions)              # [S*B]
    reward_g = unbatchify(reward, s)                             # [B, S]
    best = jnp.argmax(reward_g, axis=-1)                         # [B]
    actions_g = unbatchify(actions, s)                           # [B, S, T]
    best_actions = jnp.take_along_axis(
        actions_g, best[:, None, None], axis=1
    )[:, 0]
    return best_actions, -reward_g.max(axis=-1)


def solve(
    instances,
    max_runtime: float = 10.0,
    num_procs: int = 1,
    solver: str = "greedy",
    env=None,
    **kwargs,
):
    """Dispatch mirroring reference `solve.py:29-83`. ``solver='greedy'``
    (default) is the in-tree TPU-native baseline; 'pyvrp' / 'lkh' /
    'ortools' require the external packages."""
    if solver == "greedy":
        assert env is not None, "greedy solver needs env= for masks/reward"
        return greedy_solve(env, instances, **kwargs)
    from rl4co_tpu.envs.routing.solver_adapters import SOLVERS, solve_batch

    if solver in SOLVERS:
        actions, rewards = solve_batch(
            instances, solver, max_runtime=max_runtime, num_procs=num_procs,
            **kwargs,
        )
        return actions, -rewards  # dispatch returns reward; solve() costs
    raise ValueError(f"Unknown solver {solver!r}. Available: greedy, {SOLVERS}")
