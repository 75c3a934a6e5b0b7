"""MDAM — Multi-Decoder Attention Model (Xin et al. 2021).

Reference `rl4co/models/zoo/mdam/{model,policy,encoder,decoder}.py`:
``num_paths`` (default 5) parallel decoder parameter sets share one encoder
(`mdam/decoder.py:52-84`); the first decode step adds a pairwise-KL
diversity regularizer between the path policies (`decoder.py:132-142`);
the REINFORCE loss is broadcast over paths with per-path baselines
(`mdam/model.py:73-110`). Evaluation takes the best path.

Embedding-Glimpse (EG): every ``eg_step_gap`` decode steps the last encoder
layer is re-run with the current feasibility mask as an attention key mask
and the per-path cache recomputed (reference `mdam/decoder.py:165-174`,
`encoder.change`). Note the reference's non-VRP branch (`mask ^ mask_first`)
crashes if ever reached (``mask_first`` is never assigned —
`decoder.py:163-168`); with the default ``eg_step_gap=200`` it is dead code
for n<200. We use the current action mask for all envs (the working VRP
branch's semantics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl4co_tpu.decoding import DecodeSpec, process_logits_spec
from rl4co_tpu.models.nn.attention import PointerAttention
from rl4co_tpu.models.nn.env_embeddings import (
    env_context_embedding,
    env_init_embedding,
)
from rl4co_tpu.models.nn.graph.attnnet import GraphAttentionNetwork
from rl4co_tpu.models.policies.constructive import (
    ConstructivePolicy,
    PrecomputedCache,
    RolloutOutput,
    rollout_from_cache,
)
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.utils.ops import unbatchify


class MDAMPolicy(ConstructivePolicy):
    env_name: str = "tsp"
    embed_dim: int = 128
    num_encoder_layers: int = 3
    num_heads: int = 8
    feedforward_hidden: int = 512
    normalization: str = "batch"
    num_paths: int = 5
    mask_inner: bool = True
    eg_step_gap: int = 200  # Embedding-Glimpse re-encode period

    def setup(self):
        self.init_embedding = env_init_embedding(self.env_name, self.embed_dim)
        self.encoder_net = GraphAttentionNetwork(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            num_layers=self.num_encoder_layers,
            normalization=self.normalization,
            feedforward_hidden=self.feedforward_hidden,
        )
        self.context_embeddings = [
            env_context_embedding(self.env_name, self.embed_dim)
            for _ in range(self.num_paths)
        ]
        self.project_node_embeddings = [
            nn.Dense(3 * self.embed_dim, use_bias=False) for _ in range(self.num_paths)
        ]
        self.project_fixed_contexts = [
            nn.Dense(self.embed_dim, use_bias=False) for _ in range(self.num_paths)
        ]
        self.pointers = [
            PointerAttention(self.embed_dim, self.num_heads, mask_inner=self.mask_inner)
            for _ in range(self.num_paths)
        ]

    def encode(self, instances) -> jax.Array:
        return self.encoder_net(self.init_embedding(instances))

    def encode_with_hidden(self, instances):
        """(embeddings, pre-last-layer hidden) for Embedding-Glimpse."""
        return self.encoder_net(self.init_embedding(instances), return_hidden=True)

    def change_embeddings(self, h_old: jax.Array, attn_mask: jax.Array) -> jax.Array:
        """Re-run the last encoder layer with a key mask (EG; reference
        `encoder.change`, `mdam/decoder.py:172-174`)."""
        return self.encoder_net(h_old, mask=attn_mask, h_old=h_old)

    def precompute_path(self, embeddings: jax.Array, path: int) -> PrecomputedCache:
        proj = self.project_node_embeddings[path](embeddings)
        gk, gv, lk = jnp.split(proj, 3, axis=-1)
        graph_context = self.project_fixed_contexts[path](embeddings.mean(axis=-2))
        return PrecomputedCache(
            node_embeddings=embeddings,
            graph_context=graph_context,
            glimpse_key=gk,
            glimpse_val=gv,
            logit_key=lk,
        )

    def decode_step(self, cache, state, mask, num_repeats: int = 1, path: int = 0):
        query = self.context_embeddings[path](cache.node_embeddings, state)
        query = query + cache.graph_context
        return self.pointers[path](
            query, cache.glimpse_key, cache.glimpse_val, cache.logit_key, mask
        )

    def __call__(self, instances, state, mask):
        emb = self.encode(instances)
        logits = []
        for p in range(self.num_paths):
            cache = self.precompute_path(emb, p)
            logits.append(self.decode_step(cache, state, mask, 1, p))
        return jnp.stack(logits)


def rollout_eg(
    policy: "MDAMPolicy",
    params,
    env,
    instances,
    cache: PrecomputedCache,
    h_old: jax.Array,
    key: jax.Array,
    spec: DecodeSpec,
    path: int,
):
    """Decode with Embedding-Glimpse: segment the rollout every
    ``eg_step_gap`` steps; between segments, re-run the last encoder layer
    keyed on the current action mask and rebuild the path cache (reference
    `mdam/decoder.py:160-197`). Single-trajectory (no multistart), which
    matches the reference decoder's usage."""
    from rl4co_tpu.decoding import decode_action

    t_steps = env.max_steps
    gap = max(1, min(policy.eg_step_gap, t_steps))
    state = env.reset_batch(instances)
    keys = jax.random.split(key, t_steps)

    def step_fn(carry, xs):
        state, cache = carry
        t, k = xs
        mask = env.action_mask_batch(state)
        logits = policy.apply(params, cache, state, mask, 1, path, method="decode_step")
        logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        action, logprob = decode_action(k, logprobs, mask, spec, None)
        logprob = jnp.where(state.done, 0.0, logprob)
        return (env.step_batch(state, action), cache), (action, logprob)

    all_actions, all_logprobs = [], []
    t0 = 0
    while t0 < t_steps:
        seg = min(gap, t_steps - t0)
        if t0 > 0:
            attn_mask = env.action_mask_batch(state)
            emb = policy.apply(params, h_old, attn_mask, method="change_embeddings")
            cache = policy.apply(params, emb, path, method="precompute_path")
        (state, cache), (a, lp) = jax.lax.scan(
            step_fn, (state, cache), (jnp.arange(t0, t0 + seg), keys[t0 : t0 + seg])
        )
        all_actions.append(a)
        all_logprobs.append(lp)
        t0 += seg

    actions = jnp.moveaxis(jnp.concatenate(all_actions, axis=0), 0, 1)  # [B, T]
    logprobs = jnp.moveaxis(jnp.concatenate(all_logprobs, axis=0), 0, 1)
    reward = env.reward_batch(state, actions)
    return RolloutOutput(
        reward=reward,
        log_likelihood=logprobs.sum(axis=-1),
        actions=actions,
        logprobs=logprobs,
        entropy=jnp.zeros_like(reward),
    )


@dataclasses.dataclass(frozen=True)
class MDAM(REINFORCE):
    """MDAM algorithm: per-path REINFORCE + first-step KL diversity
    (reference `mdam/model.py:73-110`)."""

    kl_coef: float = 0.01

    def __post_init__(self):
        from rl4co_tpu.rl.baselines import NoBaseline

        object.__setattr__(self, "baseline", NoBaseline())  # per-path means built in

    def loss(self, params, baseline_state, instances, key):
        policy: MDAMPolicy = self.policy
        emb = policy.apply(params, instances, method="encode")
        keys = jax.random.split(key, policy.num_paths)

        rewards, lls, first_logprobs = [], [], []
        state0 = self.env.reset_batch(instances)
        mask0 = self.env.action_mask_batch(state0)
        for p in range(policy.num_paths):
            cache = policy.apply(params, emb, p, method="precompute_path")
            out = rollout_from_cache(
                policy, params, self.env, instances, cache, keys[p],
                self.train_spec, decode_extra_args=(p,),
            )
            rewards.append(out.reward)
            lls.append(out.log_likelihood)
            logits0 = policy.apply(
                params, cache, state0, mask0, 1, p, method="decode_step"
            )
            first_logprobs.append(
                process_logits_spec(logits0.astype(jnp.float32), mask0, self.train_spec)
            )

        reward = jnp.stack(rewards, axis=1)  # [B, P]
        ll = jnp.stack(lls, axis=1)
        advantage = reward - reward.mean(axis=0, keepdims=True)  # per-path baseline
        reinforce_loss = -(advantage * ll).mean()

        # pairwise KL between first-step path policies (`decoder.py:132-142`)
        kl = 0.0
        for i in range(policy.num_paths):
            for j in range(policy.num_paths):
                if i == j:
                    continue
                pi = jnp.exp(first_logprobs[i])
                kl = kl + (pi * (first_logprobs[i] - first_logprobs[j])).sum(-1).mean()
        loss = reinforce_loss - self.kl_coef * kl  # maximize diversity
        metrics = {
            "loss": loss,
            "reinforce_loss": reinforce_loss,
            "kl_divergence": jnp.asarray(kl),
            "reward": reward.mean(),
            "max_reward": reward.max(axis=1).mean(),
        }

        out_aux = type("Aux", (), {"reward": reward.mean(axis=1)})()
        return loss, (metrics, out_aux)

    def make_eval_step(self, spec=None):
        spec = spec or self.val_spec
        policy: MDAMPolicy = self.policy

        use_eg = policy.eg_step_gap < self.env.max_steps

        def eval_step(params, instances, key):
            if use_eg:
                emb, h_old = policy.apply(params, instances, method="encode_with_hidden")
            else:
                emb, h_old = policy.apply(params, instances, method="encode"), None
            rewards = []
            for p in range(policy.num_paths):
                cache = policy.apply(params, emb, p, method="precompute_path")
                if use_eg:
                    out = rollout_eg(
                        policy, params, self.env, instances, cache, h_old,
                        key, spec, p,
                    )
                else:
                    out = rollout_from_cache(
                        policy, params, self.env, instances, cache, key, spec,
                        decode_extra_args=(p,),
                    )
                rewards.append(out.reward)
            r = jnp.stack(rewards, axis=1)
            return {"reward": r.mean(), "max_reward": r.max(axis=1).mean()}

        return jax.jit(eval_step)