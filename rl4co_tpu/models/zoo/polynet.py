"""PolyNet (Hottung et al. 2024) — k diverse solution strategies.

Reference `rl4co/models/zoo/polynet/{model,decoder}.py` and
`rl4co/models/nn/attention.py:460-534` (`PolyNetAttention`): the pointer
glimpse is conditioned on one of k binary vectors (one per sampled solution),
and training uses the Poppy loss — only the best of the k rollouts per
instance receives the REINFORCE gradient (`polynet/model.py:188-222`).

The k-solutions axis maps directly onto this framework's grouped decode
(query axis L = k), so the binary vectors index the L axis.
"""

from __future__ import annotations

import dataclasses
import itertools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models.nn.attention import pointer_logits
from rl4co_tpu.models.policies.constructive import rollout
from rl4co_tpu.models.zoo.am import AttentionModelPolicy
from rl4co_tpu.rl.baselines import SharedBaseline
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.utils.ops import unbatchify


class PolyNetAttention(nn.Module):
    """Pointer attention + binary-vector-conditioned PolyNet layers."""

    k: int
    embed_dim: int
    poly_layer_dim: int = 256
    num_heads: int = 8
    mask_inner: bool = True

    @nn.compact
    def __call__(self, query, glimpse_k, glimpse_v, logit_k, mask):
        single = query.ndim == 2
        if single:
            query = query[:, None, :]
            mask = mask[:, None, :]
        b, num_solutions, d = query.shape

        bv_dim = max(1, math.ceil(math.log2(self.k)))
        bit_table = jnp.asarray(
            list(itertools.product([0, 1], repeat=bv_dim))[: self.k],
            dtype=query.dtype,
        )  # [k, bv_dim]
        reps = math.ceil(num_solutions / self.k)
        z = jnp.tile(bit_table, (reps, 1))[:num_solutions]  # [L, bv_dim]
        z = jnp.broadcast_to(z[None], (b, num_solutions, bv_dim))

        poly_1 = nn.Dense(self.poly_layer_dim, name="poly_layer_1")
        poly_2 = nn.Dense(self.embed_dim, name="poly_layer_2")
        project_out = nn.Dense(self.embed_dim, use_bias=False, name="project_out")

        def project_with_poly(heads):
            glimpse = project_out(heads)
            poly = poly_2(jax.nn.relu(poly_1(jnp.concatenate([glimpse, z], axis=-1))))
            return glimpse + poly

        logits = pointer_logits(
            query, glimpse_k, glimpse_v, logit_k, mask,
            num_heads=self.num_heads,
            project_out=project_with_poly,
            mask_inner=self.mask_inner,
        )
        return logits[:, 0, :] if single else logits


class PolyNetPolicy(AttentionModelPolicy):
    """AM policy with the PolyNet pointer (reference `polynet/policy.py`)."""

    k: int = 64
    poly_layer_dim: int = 256

    def _make_pointer(self):
        return PolyNetAttention(
            k=self.k,
            embed_dim=self.embed_dim,
            poly_layer_dim=self.poly_layer_dim,
            num_heads=self.num_heads,
            mask_inner=self.mask_inner,
        )


@dataclasses.dataclass(frozen=True)
class PolyNet(REINFORCE):
    """PolyNet algorithm: k-sample training with Poppy best-only loss."""

    k: int = 64
    val_num_solutions: int = 64

    def __post_init__(self):
        object.__setattr__(self, "baseline", SharedBaseline(num_repeats=self.k))
        object.__setattr__(
            self,
            "train_spec",
            dataclasses.replace(
                self.train_spec, kind="sampling", num_samples=self.k, multistart=False
            ),
        )

    def loss(self, params, baseline_state, instances, key):
        out = rollout(self.policy, params, self.env, instances, key, self.train_spec)
        reward = unbatchify(out.reward, self.k)          # [B, k]
        ll = unbatchify(out.log_likelihood, self.k)
        advantage = reward - reward.mean(axis=-1, keepdims=True)
        # Poppy: gradient only through the best rollout per instance
        best = reward.max(axis=-1, keepdims=True)
        best_mask = reward >= best
        loss = -(advantage * ll * best_mask).mean()
        metrics = {
            "loss": loss,
            "reward": reward.mean(),
            "max_reward": reward.max(axis=-1).mean(),
            "entropy": out.entropy.mean(),
        }
        return loss, (metrics, out)

    def make_eval_step(self, spec=None):
        s = self.val_num_solutions
        spec = spec or DecodeSpec(
            kind="sampling", num_samples=s, tanh_clipping=self.train_spec.tanh_clipping
        )

        def eval_step(params, instances, key):
            out = rollout(self.policy, params, self.env, instances, key, spec)
            r = unbatchify(out.reward, s)
            return {"reward": r.mean(), "max_reward": r.max(axis=-1).mean()}

        return jax.jit(eval_step)
