"""GFACS — GFlowNet-guided ACO (Kim et al. 2024).

Reference `rl4co/models/zoo/gfacs/{model,policy,encoder}.py`: DeepACO's
NARGNN encoder extended with a log-partition head (``logZ``,
`gfacs/encoder.py:46-68`); training minimizes the squared trajectory-balance
residual ``(log_likelihood + logZ − log_pb − β·advantage)²``
(`gfacs/model.py:90-138`), with α/β annealed over epochs
(`gfacs/model.py:75-88`). With ``train_with_local_search`` the encoder grows a
second logZ head (`gfacs/policy.py:56-58`) and the loss adds an off-policy TB
term over native-local-search-improved trajectories (`gfacs/model.py:126-138`),
with the on-policy advantage blended as ``(1-α)·adv + α·ls_adv``
(`gfacs/model.py:110-115`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models.policies.nonautoregressive import (
    nar_rollout,
    random_feasible_starts,
)
from rl4co_tpu.models.zoo.deepaco import DeepACO
from rl4co_tpu.models.zoo.nargnn import EdgeHeatmapGenerator, NARGNNEncoder
from rl4co_tpu.rl.reinforce import TrainState
from rl4co_tpu.models.nn.env_embeddings import env_init_embedding
from rl4co_tpu.models.nn.env_embeddings.edge import env_edge_embedding
from rl4co_tpu.models.nn.graph.gnn import SparseGNNEncoder
from rl4co_tpu.utils.ops import batchify, unbatchify


class GFACSEncoder(nn.Module):
    """NARGNN + logZ head (reference `gfacs/encoder.py:8-68`)."""

    env_name: str = "tsp"
    embed_dim: int = 64
    num_layers_graph_encoder: int = 15
    num_layers_heatmap_generator: int = 5
    act_fn: str = "silu"
    agg_fn: str = "mean"
    k_sparse: Optional[int] = None
    z_out_dim: int = 1

    @nn.compact
    def __call__(self, instances):
        x = env_init_embedding(self.env_name, self.embed_dim)(instances)
        w, nbr_idx = env_edge_embedding(
            self.env_name, self.embed_dim, k_sparse=self.k_sparse
        )(instances)
        x, w = SparseGNNEncoder(
            self.embed_dim,
            num_layers=self.num_layers_graph_encoder,
            act_fn=self.act_fn,
            agg_fn=self.agg_fn,
            name="graph_network",
        )(x, w, nbr_idx)
        z = nn.Dense(self.embed_dim, name="z_net_0")(w)
        z = jax.nn.silu(z)
        logZ = nn.Dense(self.z_out_dim, name="z_net_1")(z).mean(axis=(-3, -2))  # [B, z]
        heat = EdgeHeatmapGenerator(
            self.embed_dim,
            num_layers=self.num_layers_heatmap_generator,
            name="heatmap_generator",
        )(w, nbr_idx)
        return heat, logZ


def log_pb_uniform(env_name: str, actions: jax.Array) -> jax.Array:
    """Uniform backward-policy log-prob per env (reference `gfacs/model.py:141-157`)."""
    if env_name == "tsp":
        return jnp.full(actions.shape[0], math.log(0.5 * actions.shape[1]))
    if env_name == "cvrp":
        a = actions
        n_nodes = (a != 0).sum(axis=1)
        n_routes = (a[:, 1:] != a[:, :-1]).sum(axis=1) - n_nodes
        n_multi = (a[:, 2:] != a[:, :-2]).sum(axis=1) - n_nodes
        return (
            -jax.scipy.special.gammaln(n_routes.astype(jnp.float32) + 1.0)
            - n_multi.astype(jnp.float32) * math.log(2.0)
        )
    if env_name in ("op", "pctsp"):
        return jnp.full(actions.shape[0], math.log(0.5))
    raise ValueError(f"Unknown environment for GFACS: {env_name}")


@dataclasses.dataclass(frozen=True)
class GFACS(DeepACO):
    """GFACS algorithm: DeepACO sampling/ACO with a TB loss.

    β is passed per-step via ``beta`` (the trainer can anneal it per epoch
    with `beta_at_epoch`; reference `gfacs/model.py:75-88`).
    """

    beta_min: float = 1.0
    beta_max: float = 1.0
    beta_flat_epochs: int = 5
    total_epochs: int = 100
    beta: float = 1.0
    # Off-policy local-search training (reference `gfacs/model.py:40,110-138`):
    # α blends the on-policy advantage with the LS-improved advantage and is
    # annealed linearly over epochs (`gfacs/model.py:76-81`).
    train_with_local_search: bool = False
    alpha_min: float = 0.5
    alpha_max: float = 1.0
    alpha_flat_epochs: int = 5
    alpha: float = 1.0

    def __post_init__(self):
        if self.train_with_local_search and not self.use_local_search:
            # reference asserts aco_kwargs["use_local_search"] (`deepaco/policy.py:92-93`)
            object.__setattr__(self, "use_local_search", True)
        if self.encoder is None:
            object.__setattr__(
                self,
                "encoder",
                GFACSEncoder(
                    env_name=self.env.name,
                    z_out_dim=2 if self.train_with_local_search else 1,
                ),
            )

    def beta_at_epoch(self, epoch: int) -> float:
        denom = math.log(max(self.total_epochs - self.beta_flat_epochs, 2))
        return self.beta_min + (self.beta_max - self.beta_min) * min(
            math.log(epoch + 1) / denom, 1.0
        )

    def alpha_at_epoch(self, epoch: int) -> float:
        denom = max(self.total_epochs - self.alpha_flat_epochs, 1)
        return self.alpha_min + (self.alpha_max - self.alpha_min) * min(
            epoch / denom, 1.0
        )

    def loss(self, params, _baseline_state, instances, key):
        kstart, kroll = jax.random.split(key)
        heat, logZ = self.encoder.apply(params, instances)
        s = self.n_ants_train
        spec = DecodeSpec(
            kind="sampling", multistart=True, num_starts=s,
            temperature=self.temperature, top_k=self.top_k,
        )
        first = random_feasible_starts(self.env, instances, s, kstart)
        out = nar_rollout(self.env, instances, heat, kroll, spec, first_actions=first)
        reward = unbatchify(out.reward, s)          # [B, ants]
        ll = unbatchify(out.log_likelihood, s)
        advantage = reward - reward.mean(axis=-1, keepdims=True)
        log_pb = unbatchify(log_pb_uniform(self.env.name, out.actions), s)

        metrics = {}
        weighted_advantage = advantage
        ls_tb_loss = 0.0
        if self.train_with_local_search:
            ls_fn = self._local_search_fn()
            if ls_fn is None:
                raise ValueError(
                    "train_with_local_search in-jit path unavailable: env "
                    f"{self.env.name!r} has no native local search or the "
                    "backend rejects in-jit callbacks (use make_train_step, "
                    "which auto-selects the host-segmented path)")
            inst_tiled = batchify(instances, s)
            ls_actions, ls_reward_flat = ls_fn(
                inst_tiled, jax.lax.stop_gradient(out.actions), out.reward
            )
            ls_term = self._ls_tb_terms(
                heat, logZ, instances, kroll, advantage,
                jax.lax.stop_gradient(ls_actions),
                jax.lax.stop_gradient(ls_reward_flat),
            )
            weighted_advantage, ls_tb_loss = ls_term[0], ls_term[1]
            metrics["ls_reward"] = ls_term[2]

        forward_flow = ll + logZ[:, 0:1]
        backward_flow = log_pb + jax.lax.stop_gradient(weighted_advantage) * self.beta
        tb_loss = jnp.square(forward_flow - backward_flow).mean() + ls_tb_loss
        metrics.update({
            "loss": tb_loss,
            "reward": reward.mean(),
            "best_ant_reward": reward.max(axis=-1).mean(),
            "logZ": logZ.mean(),
            "entropy": out.entropy.mean(),
        })
        return tb_loss, metrics

    def _ls_tb_terms(self, heat, logZ, instances, kroll, advantage,
                     ls_actions, ls_reward_flat):
        """Off-policy trajectory-balance terms for LS-improved trajectories
        (reference `gfacs/model.py:110-138`): replay them differentiably
        (Evaluate decoding, `gfacs/policy.py:139-146`), blend advantages by
        the annealed α. Shared by the in-jit and host-segmented paths."""
        s = self.n_ants_train
        ls_reward = unbatchify(ls_reward_flat, s)
        ls_advantage = ls_reward - ls_reward.mean(axis=-1, keepdims=True)
        weighted_advantage = (
            advantage * (1.0 - self.alpha) + ls_advantage * self.alpha
        )
        ls_spec = DecodeSpec(
            kind="evaluate", multistart=True, num_starts=s,
            temperature=self.temperature,
        )
        ls_out = nar_rollout(
            self.env, instances, heat, kroll, ls_spec,
            first_actions=ls_actions[:, 0], replay_actions=ls_actions,
        )
        ls_ll = unbatchify(ls_out.log_likelihood, s)
        ls_log_pb = unbatchify(log_pb_uniform(self.env.name, ls_actions), s)
        ls_forward = ls_ll + logZ[:, 1:2]
        ls_backward = ls_log_pb + jax.lax.stop_gradient(ls_advantage) * self.beta
        ls_tb_loss = jnp.square(ls_forward - ls_backward).mean()
        return weighted_advantage, ls_tb_loss, ls_reward.mean()

    def _segmented_loss(self, params, instances, kroll,
                        actions, reward_flat, ls_actions, ls_reward_flat):
        """TB loss with trajectories provided from outside the graph (the
        host-segmented path): the on-policy trajectories are replayed with
        Evaluate decoding — same log-likelihood gradient as the sampling
        rollout that produced them."""
        s = self.n_ants_train
        heat, logZ = self.encoder.apply(params, instances)
        replay_spec = DecodeSpec(
            kind="evaluate", multistart=True, num_starts=s,
            temperature=self.temperature,
        )
        out = nar_rollout(
            self.env, instances, heat, kroll, replay_spec,
            first_actions=actions[:, 0], replay_actions=actions,
        )
        reward = unbatchify(reward_flat, s)
        ll = unbatchify(out.log_likelihood, s)
        advantage = reward - reward.mean(axis=-1, keepdims=True)
        log_pb = unbatchify(log_pb_uniform(self.env.name, actions), s)

        weighted_advantage, ls_tb_loss, ls_reward_mean = self._ls_tb_terms(
            heat, logZ, instances, kroll, advantage, ls_actions, ls_reward_flat
        )
        forward_flow = ll + logZ[:, 0:1]
        backward_flow = (log_pb
                         + jax.lax.stop_gradient(weighted_advantage) * self.beta)
        tb_loss = jnp.square(forward_flow - backward_flow).mean() + ls_tb_loss
        metrics = {
            "loss": tb_loss,
            "reward": reward.mean(),
            "best_ant_reward": reward.max(axis=-1).mean(),
            "ls_reward": ls_reward_mean,
            "logZ": logZ.mean(),
            "entropy": out.entropy.mean(),
        }
        return tb_loss, metrics

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = True):
        """LS-training works on every backend: in-jit callbacks where the
        platform supports them, else host-segmented (sample on device → C++
        LS on host → differentiable replay + update on device) — the
        reference's own CPU-LS-between-rounds structure (VERDICT r2 §4)."""
        if not (self.train_with_local_search
                and self._resolved_ls_mode() == "host_segments"):
            return super().make_train_step(batch_size, mesh=mesh, donate=donate)

        import numpy as np

        tx = self.make_optimizer()
        s = self.n_ants_train
        host_ls = self._host_ls_fn()

        @jax.jit
        def sample(params, step, key):
            kdata, kstart, kroll = jax.random.split(
                jax.random.fold_in(key, step), 3)
            instances = self.env.generate_batch(kdata, batch_size)
            heat, _ = self.encoder.apply(params, instances)
            spec = DecodeSpec(
                kind="sampling", multistart=True, num_starts=s,
                temperature=self.temperature, top_k=self.top_k,
            )
            first = random_feasible_starts(self.env, instances, s, kstart)
            out = nar_rollout(self.env, instances, heat, kroll, spec,
                              first_actions=first)
            return instances, out.actions, out.reward, kroll

        @jax.jit
        def update(state, instances, kroll, actions, reward,
                   ls_actions, ls_reward):
            grads, metrics = jax.grad(self._segmented_loss, has_aux=True)(
                state.params, instances, kroll, actions, reward,
                ls_actions, ls_reward,
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           baseline_state=None, step=state.step + 1),
                metrics,
            )

        def step(state, key):
            instances, actions, reward, kroll = sample(
                state.params, state.step, key)
            inst_tiled = jax.device_get(batchify(instances, s))
            a_h, r_h = host_ls(inst_tiled, np.asarray(actions),
                               np.asarray(reward))
            return update(state, instances, kroll, actions, reward,
                          jnp.asarray(a_h, dtype=jnp.int32),
                          jnp.asarray(r_h, dtype=jnp.float32))

        return step

    def _apply_heatmap(self, params, instances):  # noqa: D102
        return self.encoder.apply(params, instances)[0]

    def greedy_reward_fn(self):
        def fn(params, instances):
            heat, _ = self.encoder.apply(params, instances)
            return nar_rollout(
                self.env, instances, heat, jax.random.PRNGKey(0),
                DecodeSpec(kind="greedy"),
            ).reward

        return fn
