"""POMO (Kwon et al. 2020) — multistart REINFORCE with shared baseline.

Reference `rl4co/models/zoo/pomo/model.py:16-143`:
- policy deviations from AM: 6 encoder layers, instance norm, no graph
  context (`model.py:58-66`);
- train: forced diverse start nodes, advantage against the mean reward over
  starts (`SharedBaseline`), loss meaned over (batch, starts);
- eval: ×8 dihedral augmentation + multistart greedy, reporting
  max-over-starts and max-over-starts-and-augs (`model.py:103-141`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rl4co_tpu.data.transforms import augment_instances
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import ConstructivePolicy, rollout
from rl4co_tpu.models.zoo.am import AttentionModelPolicy
from rl4co_tpu.rl.baselines import SharedBaseline
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.utils.ops import unbatchify


def make_pomo_policy(env_name: str, **overrides) -> AttentionModelPolicy:
    """AM policy with POMO's architectural deviations (`pomo/model.py:58-66`)."""
    cfg = dict(
        env_name=env_name,
        num_encoder_layers=6,
        normalization="instance",
        use_graph_context=False,
    )
    cfg.update(overrides)
    return AttentionModelPolicy(**cfg)


@dataclasses.dataclass(frozen=True)
class POMO(REINFORCE):
    """POMO algorithm. ``num_starts`` defaults to ``env.get_num_starts()``."""

    num_starts: int = 0
    num_augment: int = 8
    augment_fn: str = "dihedral8"

    def __post_init__(self):
        s = self.num_starts or self.env.get_num_starts()
        object.__setattr__(self, "num_starts", s)
        object.__setattr__(
            self,
            "train_spec",
            dataclasses.replace(
                self.train_spec, kind="sampling", multistart=True, num_starts=s
            ),
        )
        object.__setattr__(self, "baseline", SharedBaseline(num_repeats=s))

    def loss(self, params, baseline_state, instances, key):
        out = rollout(self.policy, params, self.env, instances, key, self.train_spec)
        reward = unbatchify(out.reward, self.num_starts)      # [B, S]
        ll = unbatchify(out.log_likelihood, self.num_starts)  # [B, S]
        advantage = reward - reward.mean(axis=-1, keepdims=True)
        loss = -(advantage * ll).mean()
        metrics = {
            "loss": loss,
            "reinforce_loss": loss,
            "bl_loss": jnp.float32(0.0),
            "reward": reward.mean(),
            "bl_val": reward.mean(),
            "max_reward": reward.max(axis=-1).mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, (metrics, out)

    def make_eval_step(self, spec=None):
        a = self.num_augment
        s = self.num_starts
        spec = spec or DecodeSpec(
            kind="greedy",
            multistart=True,
            num_starts=s,
            tanh_clipping=self.train_spec.tanh_clipping,
        )

        def eval_step(params, instances, key):
            if a > 1:
                instances_aug = augment_instances(
                    instances, a, self.augment_fn, key=key
                )
            else:
                instances_aug = instances
            out = rollout(self.policy, params, self.env, instances_aug, key, spec)
            # flat layout: starts-major over (augment-major over batch)
            r = unbatchify(unbatchify(out.reward, s), a)  # [B, A, S]
            max_start = r.max(axis=-1)  # [B, A]
            return {
                "reward": r[:, 0, :].mean(),
                "max_reward": max_start[:, 0].mean(),
                "max_aug_reward": max_start.max(axis=-1).mean(),
            }

        return jax.jit(eval_step)
