"""DeepACO (Ye et al. 2023) — NAR heatmap + Ant System.

Reference `rl4co/models/zoo/deepaco/{model,policy,antsystem}.py`:
- training: sample ``n_ants`` solutions per instance from the heatmap,
  REINFORCE with shared (per-instance mean over ants) baseline
  (`deepaco/model.py:63-91`);
- inference: Ant System iterations — sample ants from
  ``alpha·log(pheromone) + beta·log(heuristic)``, track best, deposit
  min-max-squared-mapped rewards along tour edges, decay
  (`deepaco/antsystem.py:120-294`). Here the pheromone loop is a pure
  `lax`-compatible function (one jitted program per iteration count).
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
from rl4co_tpu.models.policies.nonautoregressive import (
    nar_rollout,
    random_feasible_starts,
)
from rl4co_tpu.models.zoo.nargnn import NARGNNEncoder
from rl4co_tpu.rl.reinforce import TrainState
from rl4co_tpu.utils.ops import unbatchify


@struct.dataclass
class ACOCarry:
    pheromone: jax.Array      # [B, A, A]
    best_actions: jax.Array   # [B, T]
    best_reward: jax.Array    # [B]


def sample_ants(
    pheromone: jax.Array,
    env: Env,
    instances,
    log_heuristic: jax.Array,
    key: jax.Array,
    n_ants: int,
    alpha: float,
    beta: float,
):
    """Sample one round of ant trajectories from pheromone × heuristic
    (reference `antsystem.py:149-171`). Returns flat ([B·ants, T], [B·ants])."""
    kstart, kroll = jax.random.split(key)
    heat = alpha * jnp.log(pheromone) + beta * log_heuristic
    spec = DecodeSpec(kind="sampling", multistart=True, num_starts=n_ants)
    first = random_feasible_starts(env, instances, n_ants, kstart)
    out = nar_rollout(env, instances, heat, kroll, spec, first_actions=first)
    return out.actions, out.reward


def update_ant_state(
    carry: ACOCarry,
    actions: jax.Array,  # [B·ants, T]
    reward: jax.Array,   # [B·ants]
    n_ants: int,
    decay: float,
    q: float,
) -> ACOCarry:
    """Best-ant bookkeeping + pheromone deposit/decay
    (reference `antsystem.py:232-276`)."""
    num_nodes = carry.pheromone.shape[-1]
    reward_g = unbatchify(reward, n_ants)   # [B, ants]
    actions_g = unbatchify(actions, n_ants)  # [B, ants, T]

    # best-ant bookkeeping (reference `antsystem.py:232-248`)
    best_idx = jnp.argmax(reward_g, axis=-1)
    it_best_reward = jnp.take_along_axis(reward_g, best_idx[:, None], axis=1)[:, 0]
    it_best_actions = jnp.take_along_axis(
        actions_g, best_idx[:, None, None], axis=1
    )[:, 0]
    improved = it_best_reward > carry.best_reward
    best_reward = jnp.where(improved, it_best_reward, carry.best_reward)
    best_actions = jnp.where(improved[:, None], it_best_actions, carry.best_actions)

    # pheromone update (reference `antsystem.py:249-276`)
    m = reward_g.min(axis=-1, keepdims=True)
    mx = reward_g.max(axis=-1, keepdims=True)
    mapped = ((reward_g - m) / (mx - m + 1e-10)) ** 2 * q  # [B, ants]
    from_node = actions_g[..., :-1]  # [B, ants, T-1]
    to_node = actions_g[..., 1:]

    def deposit(fb, tb, rb):
        # scatter-add as a one-hot matmul (MXU; avoids the batched-scatter
        # path this image's TPU backend miscompiles at batch >= ~1024)
        n = num_nodes
        f = fb.reshape(-1)
        t = tb.reshape(-1)
        w = jnp.broadcast_to(rb[:, None], fb.shape).reshape(-1)
        f_oh = jax.nn.one_hot(f, n, dtype=w.dtype) * w[:, None]   # [E, N]
        t_oh = jax.nn.one_hot(t, n, dtype=w.dtype)                # [E, N]
        z = f_oh.T @ t_oh                                          # [N, N]
        keep = ~((jnp.arange(n) == 0)[:, None] & (jnp.arange(n) == 0)[None, :])
        return jnp.where(keep, z, 0.0)  # ignore trailing zero-padding arcs

    delta = jax.vmap(deposit)(from_node, to_node, mapped)
    pheromone = carry.pheromone * decay + delta
    return ACOCarry(
        pheromone=pheromone, best_actions=best_actions, best_reward=best_reward
    )


def ant_system_step(
    carry: ACOCarry,
    env: Env,
    instances,
    log_heuristic: jax.Array,
    key: jax.Array,
    n_ants: int,
    alpha: float,
    beta: float,
    decay: float,
    q: float,
    local_search_fn=None,
) -> ACOCarry:
    """One ACO iteration (reference `antsystem.py:120-147` `_one_step`)."""
    actions, reward = sample_ants(
        carry.pheromone, env, instances, log_heuristic, key, n_ants, alpha, beta
    )
    if local_search_fn is not None:
        from rl4co_tpu.utils.ops import batchify

        inst_tiled = batchify(instances, n_ants)  # match the flat ant batch
        actions, reward = local_search_fn(inst_tiled, actions, reward)
    return update_ant_state(carry, actions, reward, n_ants, decay, q)


def run_ant_system(
    env: Env,
    instances,
    log_heuristic: jax.Array,
    key: jax.Array,
    n_ants: int = 20,
    n_iterations: int = 10,
    alpha: float = 1.0,
    beta: float = 1.0,
    decay: float = 0.95,
    q: Optional[float] = None,
    local_search_fn=None,
):
    """Full Ant System run; returns (best_actions [B, T], best_reward [B])."""
    q = (1.0 / n_ants / decay) if q is None else q
    b = log_heuristic.shape[0]
    t = env.max_steps
    carry = ACOCarry(
        pheromone=jnp.ones_like(log_heuristic),
        best_actions=jnp.zeros((b, t), dtype=jnp.int32),
        best_reward=jnp.full((b,), -jnp.inf),
    )

    def body(carry, k):
        carry = ant_system_step(
            carry, env, instances, log_heuristic, k, n_ants,
            alpha, beta, decay, q, local_search_fn,
        )
        return carry, carry.best_reward.mean()

    carry, reward_trace = jax.lax.scan(body, carry, jax.random.split(key, n_iterations))
    return carry.best_actions, carry.best_reward, reward_trace


def run_ant_system_host_ls(
    env: Env,
    instances,
    log_heuristic: jax.Array,
    key: jax.Array,
    host_ls,
    n_ants: int = 20,
    n_iterations: int = 10,
    alpha: float = 1.0,
    beta: float = 1.0,
    decay: float = 0.95,
    q: Optional[float] = None,
):
    """Ant System with host-side local search BETWEEN jitted segments.

    The reference's own structure: sampling on device, 2-opt/SWAP* on CPU
    with the instance data, pheromone update back on device
    (`antsystem.py:173-210` runs LS outside the sampling graph). This is
    the path for backends that reject in-jit host callbacks (the axon TPU
    tunnel) — two small jitted programs (sample / update) driven by a host
    loop, LS feedback still reaching the pheromone like the reference.
    """
    import numpy as np

    from rl4co_tpu.utils.ops import batchify

    q = (1.0 / n_ants / decay) if q is None else q
    b = log_heuristic.shape[0]
    t = env.max_steps
    carry = ACOCarry(
        pheromone=jnp.ones_like(log_heuristic),
        best_actions=jnp.zeros((b, t), dtype=jnp.int32),
        best_reward=jnp.full((b,), -jnp.inf),
    )

    @jax.jit
    def _sample(pheromone, k):
        return sample_ants(
            pheromone, env, instances, log_heuristic, k, n_ants, alpha, beta
        )

    @jax.jit
    def _update(c, actions, reward):
        c = update_ant_state(c, actions, reward, n_ants, decay, q)
        return c, c.best_reward.mean()

    inst_tiled = jax.device_get(batchify(instances, n_ants))
    trace = []
    for k in jax.random.split(key, n_iterations):
        actions, reward = _sample(carry.pheromone, k)
        a_h, r_h = host_ls(inst_tiled, np.asarray(actions), np.asarray(reward))
        carry, mean_best = _update(
            carry, jnp.asarray(a_h, dtype=jnp.int32),
            jnp.asarray(r_h, dtype=reward.dtype),
        )
        trace.append(mean_best)
    return carry.best_actions, carry.best_reward, jnp.stack(trace)


@dataclasses.dataclass(frozen=True)
class DeepACO:
    """DeepACO algorithm (training + ACO eval)."""

    env: Env
    encoder: Optional[Any] = None  # NARGNNEncoder module
    n_ants_train: int = 30
    n_ants_eval: int = 48
    n_iterations_eval: int = 10
    use_local_search: bool = False  # native C++ NLS in the ACO loop
    # "auto": in-jit pure_callback where the backend supports it, else
    # host-side polish between jitted segments (the reference's structure —
    # LS on CPU between sampling rounds, `antsystem.py:173-210`).
    ls_mode: str = "auto"  # "auto" | "in_jit" | "host_segments"
    aco_alpha: float = 1.0
    aco_beta: float = 1.0
    aco_decay: float = 0.95
    lr: float = 1e-4
    grad_clip: float = 1.0
    temperature: float = 1.0
    top_k: int = 0

    def __post_init__(self):
        if self.encoder is None:
            object.__setattr__(self, "encoder", NARGNNEncoder(env_name=self.env.name))

    def make_optimizer(self):
        tx = optax.adam(self.lr)
        if self.grad_clip and self.grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        return tx

    def init(self, key: jax.Array) -> TrainState:
        kgen, kinit = jax.random.split(key)
        instances = self.env.generate_batch(kgen, 2)
        params = self.encoder.init(kinit, instances)
        opt_state = self.make_optimizer().init(params)
        return TrainState(
            params=params, opt_state=opt_state, baseline_state=None, step=jnp.int32(0)
        )

    def loss(self, params, _baseline_state, instances, key):
        kstart, kroll = jax.random.split(key)
        heat = self.encoder.apply(params, instances)
        s = self.n_ants_train
        spec = DecodeSpec(
            kind="sampling", multistart=True, num_starts=s,
            temperature=self.temperature, top_k=self.top_k,
        )
        first = random_feasible_starts(self.env, instances, s, kstart)
        out = nar_rollout(self.env, instances, heat, kroll, spec, first_actions=first)
        reward = unbatchify(out.reward, s)
        ll = unbatchify(out.log_likelihood, s)
        advantage = reward - reward.mean(axis=-1, keepdims=True)
        loss = -(advantage * ll).mean()
        metrics = {
            "loss": loss,
            "reward": reward.mean(),
            "best_ant_reward": reward.max(axis=-1).mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, metrics

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        tx = self.make_optimizer()

        def step(state: TrainState, key: jax.Array):
            kdata, kroll = jax.random.split(jax.random.fold_in(key, state.step))
            instances = self.env.generate_batch(kdata, batch_size)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                instances = jax.lax.with_sharding_constraint(
                    instances, NamedSharding(mesh, P("dp"))
                )
            grads, metrics = jax.grad(self.loss, has_aux=True)(
                state.params, None, instances, kroll
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=None, step=state.step + 1),
                metrics,
            )

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def _resolved_ls_mode(self) -> Optional[str]:
        """None (LS off) | "in_jit" | "host_segments"."""
        if not self.use_local_search or self.env.name not in ("tsp", "cvrp"):
            return None
        if self.ls_mode in ("in_jit", "host_segments"):
            return self.ls_mode
        from rl4co_tpu.envs.routing.local_search import host_callbacks_supported

        return "in_jit" if host_callbacks_supported() else "host_segments"

    def _local_search_fn(self):
        """Native C++ local search as a jit-safe callback (reference NLS,
        `antsystem.py:173-231`); tsp/cvrp only, in_jit mode only."""
        if self._resolved_ls_mode() != "in_jit":
            return None
        from rl4co_tpu.envs.routing.local_search import (
            make_cvrp_ls_fn,
            make_tsp_ls_fn,
        )

        return make_tsp_ls_fn() if self.env.name == "tsp" else make_cvrp_ls_fn()

    def _host_ls_fn(self):
        """Host-side LS closure for the segmented loop (works everywhere)."""
        from rl4co_tpu.envs.routing.local_search import (
            make_host_cvrp_ls,
            make_host_tsp_ls,
        )

        return (make_host_tsp_ls() if self.env.name == "tsp"
                else make_host_cvrp_ls())

    def _apply_heatmap(self, params, instances):
        return self.encoder.apply(params, instances)

    def make_eval_step(self, spec=None):
        mode = self._resolved_ls_mode()
        if mode == "host_segments":
            # host-driven loop (sample/update jitted inside); not one jit
            def eval_step(params, instances, key):
                heat = self._apply_heatmap(params, instances)
                _, best_reward, _ = run_ant_system_host_ls(
                    self.env, instances, heat, key, self._host_ls_fn(),
                    n_ants=self.n_ants_eval,
                    n_iterations=self.n_iterations_eval,
                    alpha=self.aco_alpha, beta=self.aco_beta,
                    decay=self.aco_decay,
                )
                return {"reward": best_reward.mean(),
                        "max_reward": best_reward.max()}

            return eval_step

        ls_fn = self._local_search_fn()

        def eval_step(params, instances, key):
            heat = self._apply_heatmap(params, instances)
            _, best_reward, _ = run_ant_system(
                self.env, instances, heat, key,
                n_ants=self.n_ants_eval,
                n_iterations=self.n_iterations_eval,
                alpha=self.aco_alpha, beta=self.aco_beta, decay=self.aco_decay,
                local_search_fn=ls_fn,
            )
            return {"reward": best_reward.mean(), "max_reward": best_reward.max()}

        return jax.jit(eval_step)

    def epoch_end(self, state: TrainState, host: dict):
        return state, host

    def greedy_reward_fn(self):
        def fn(params, instances):
            heat = self.encoder.apply(params, instances)
            spec = DecodeSpec(kind="greedy")
            return nar_rollout(
                self.env, instances, heat, jax.random.PRNGKey(0), spec
            ).reward

        return fn
