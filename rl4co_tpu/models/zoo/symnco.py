"""SymNCO (Kim et al. 2022) — symmetricity-exploiting REINFORCE.

Reference `rl4co/models/zoo/symnco/{model,policy,losses}.py`:
- policy = AM + projection head over the initial embeddings
  (`symnco/policy.py:53-58,86-89`);
- loss = problem-symmetricity (baseline over augmentations) + β ×
  solution-symmetricity (baseline over starts) + α × invariance
  (`symnco/losses.py:5-37`, combined `symnco/model.py:96-118`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.data.transforms import augment_instances
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models.policies.constructive import rollout
from rl4co_tpu.models.zoo.am import AttentionModelPolicy
from rl4co_tpu.rl.baselines import NoBaseline
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.utils.ops import unbatchify


class SymNCOPolicy(AttentionModelPolicy):
    """AM policy + projection head (reference `symnco/policy.py:13-89`)."""

    use_projection_head: bool = True

    def setup(self):
        super().setup()
        if self.use_projection_head:
            self.projection_head = nn.Sequential(
                [nn.Dense(self.embed_dim), jax.nn.relu, nn.Dense(self.embed_dim)]
            )

    def project(self, init_embeds: jax.Array) -> jax.Array:
        return self.projection_head(init_embeds)

    def __call__(self, instances, state, mask):
        # touch the projection head so policy.init creates its params
        out = super().__call__(instances, state, mask)
        if self.use_projection_head:
            self.project(self.init_embed(instances))
        return out


def problem_symmetricity_loss(reward, ll):
    """Baseline over the augmentation axis (`losses.py:5-15`); inputs [B, A, S]."""
    advantage = reward - reward.mean(axis=1, keepdims=True)
    return -(advantage * ll).mean()


def solution_symmetricity_loss(reward, ll):
    """Baseline over the start axis (`losses.py:18-28`); inputs [B, A, S]."""
    advantage = reward - reward.mean(axis=-1, keepdims=True)
    return -(advantage * ll).mean()


def invariance_loss(proj, num_augment):
    """Cosine similarity of augmented projections to copy 0 (`losses.py:31-37`).

    proj: [A*B, N, D] repeat-major.
    """
    pe = unbatchify(proj, num_augment)  # [B, A, N, D]
    ref = pe[:, 0]
    sims = []
    for i in range(1, num_augment):
        num = (ref * pe[:, i]).sum(-1)
        den = jnp.linalg.norm(ref, axis=-1) * jnp.linalg.norm(pe[:, i], axis=-1) + 1e-8
        sims.append(num / den)
    return sum(sims).mean()


@dataclasses.dataclass(frozen=True)
class SymNCO(REINFORCE):
    """SymNCO algorithm (reference `symnco/model.py:21-130`)."""

    num_augment: int = 4
    augment_fn: str = "symmetric"
    alpha: float = 0.2   # invariance weight
    beta: float = 1.0    # solution-symmetricity weight
    num_starts: int = 0  # 0 = no multistart (reference default)

    def __post_init__(self):
        object.__setattr__(self, "baseline", NoBaseline())
        if self.num_starts > 1:
            object.__setattr__(
                self,
                "train_spec",
                dataclasses.replace(
                    self.train_spec,
                    kind="sampling",
                    multistart=True,
                    num_starts=self.num_starts,
                ),
            )

    def loss(self, params, baseline_state, instances, key):
        a = self.num_augment
        s = max(self.num_starts, 1)
        kaug, kroll = jax.random.split(key)
        if a > 1:
            instances = augment_instances(instances, a, self.augment_fn, key=kaug)
        out = rollout(self.policy, params, self.env, instances, kroll, self.train_spec)
        reward = unbatchify(unbatchify(out.reward, s), a)          # [B, A, S]
        ll = unbatchify(unbatchify(out.log_likelihood, s), a)      # [B, A, S]

        loss_ps = problem_symmetricity_loss(reward, ll) if s > 1 else 0.0
        loss_ss = solution_symmetricity_loss(reward, ll) if a > 1 else 0.0
        if a > 1 and self.policy.use_projection_head:
            h0 = self.policy.apply(params, instances, method="init_embed")
            proj = self.policy.apply(params, h0, method="project")
            loss_inv = invariance_loss(proj, a)
        else:
            loss_inv = 0.0
        loss = loss_ps + self.beta * loss_ss + self.alpha * loss_inv
        metrics = {
            "loss": loss,
            "loss_ps": jnp.asarray(loss_ps),
            "loss_ss": jnp.asarray(loss_ss),
            "loss_inv": jnp.asarray(loss_inv),
            "reward": reward.mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, (metrics, out)
