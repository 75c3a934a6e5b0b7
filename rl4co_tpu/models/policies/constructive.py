"""Constructive (autoregressive) policy engine.

TPU-native re-design of the reference hot loop
`rl4co/models/common/constructive/base.py:154-263`:

    encode once → precompute decoder cache → `lax.scan` over decode steps
    (logits → process → sample → env.step) → reward + log-likelihood.

The reference's Python `while not done` re-launches kernels per token; here
the whole rollout is one XLA program with a static trip count
(``env.max_steps``) and done-masking, so it fuses, pipelines, and runs with
zero host round-trips. Multistart (POMO) and multi-sample expansion replace
the reference's `batchify` pre-hook (`rl4co/utils/decoding.py:282-330`):
encode runs on the *base* batch, the cache is tiled afterwards — the
expensive encoder is never duplicated per start.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from rl4co_tpu.decoding import (
    DecodeSpec,
    decode_action,
    get_log_likelihood,
    process_logits_spec,
)
from rl4co_tpu.envs.base import Env
from rl4co_tpu.utils.ops import batchify, unbatchify


@struct.dataclass
class PrecomputedCache:
    """Decoder cache (reference `rl4co/models/zoo/am/decoder.py:21-40`)."""

    node_embeddings: jax.Array  # [B, N, D]
    graph_context: Any          # [B, D] or scalar 0.0
    glimpse_key: jax.Array      # [B, N, D]
    glimpse_val: jax.Array      # [B, N, D]
    logit_key: jax.Array        # [B, N, D]


@struct.dataclass
class RolloutOutput:
    reward: jax.Array          # [B'] (B' = B * num_repeats when expanded)
    log_likelihood: jax.Array  # [B']
    actions: jax.Array         # [B', T]
    logprobs: jax.Array        # [B', T] chosen-action logprobs (0 after done)
    entropy: jax.Array         # [B'] summed per-step policy entropy


class ConstructivePolicy(nn.Module):
    """Protocol for constructive policies: subclasses implement
    ``encode`` / ``precompute`` / ``decode_step``."""

    def encode(self, instances) -> jax.Array:
        raise NotImplementedError

    def precompute(self, embeddings) -> PrecomputedCache:
        raise NotImplementedError

    def decode_step(self, cache: PrecomputedCache, state, mask, num_repeats: int = 1) -> jax.Array:
        raise NotImplementedError

    def __call__(self, instances, state, mask):
        """Single decode step from scratch — used only for param init."""
        emb = self.encode(instances)
        cache = self.precompute(emb)
        return self.decode_step(cache, state, mask)


def init_policy_params(policy: ConstructivePolicy, env: Env, key: jax.Array):
    """Initialize parameters with a dummy batch."""
    kgen, kinit = jax.random.split(key)
    instances = env.generate_batch(kgen, 2)
    state = env.reset_batch(instances)
    mask = env.action_mask_batch(state)
    return policy.init(kinit, instances, state, mask)


def policy_tp_roles(policy: ConstructivePolicy, env: Env,
                    key: Optional[jax.Array] = None):
    """Extract the structural tensor-parallel markers (TPDense ``tp_role``).

    Runs a 2-instance init with the ``intermediates`` collection mutable and
    returns that collection — feed it to
    `parallel.mesh.shard_params_model_axis(roles=...)` so megatron pairing
    keys on module structure instead of parameter-path strings
    (VERDICT r4 #8). Parameter pytrees are unaffected (markers live outside
    the ``params`` collection).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    kgen, kinit = jax.random.split(key)
    instances = env.generate_batch(kgen, 2)
    state = env.reset_batch(instances)
    mask = env.action_mask_batch(state)
    variables = policy.init(kinit, instances, state, mask,
                            mutable=["params", "intermediates"])
    return variables.get("intermediates", {})


def rollout(
    policy: ConstructivePolicy,
    params,
    env: Env,
    instances,
    key: jax.Array,
    spec: DecodeSpec,
    replay_actions: Optional[jax.Array] = None,
    temperature_override: Optional[jax.Array] = None,
) -> RolloutOutput:
    """Full autoregressive rollout as a single scan.

    Args:
        instances: batched instance dict ``[B, ...]``.
        spec: static decode configuration. With ``spec.multistart`` the
            output batch is ``B * num_starts`` in repeat-major layout
            (``unbatchify(x, num_starts) -> [B, num_starts]``).
        replay_actions: ``[B', T]`` actions for ``kind='evaluate'``.
        temperature_override: optional TRACED temperature replacing the
            spec's static one — lets `vmap` run members with different
            temperatures in one program (the fused rollout-baseline trick:
            member 1 at τ→0 is exact greedy under sharpened categorical).
    """
    if spec.compute_dtype is not None:
        from rl4co_tpu.utils.dtype import cast_floating

        params = cast_floating(params, jnp.dtype(spec.compute_dtype))
    if spec.kind == "beam_search":
        from rl4co_tpu.models.policies.beam_search import beam_search_rollout

        width = spec.beam_width or env.get_num_starts()
        return beam_search_rollout(
            policy, params, env, instances, key, width, spec,
            select_best=spec.select_best,
        )
    embeddings = policy.apply(params, instances, method="encode")
    cache = policy.apply(params, embeddings, method="precompute")
    return rollout_from_cache(
        policy, params, env, instances, cache, key, spec, replay_actions,
        temperature_override=temperature_override,
    )


def rollout_from_cache(
    policy: ConstructivePolicy,
    params,
    env: Env,
    instances,
    cache: PrecomputedCache,
    key: jax.Array,
    spec: DecodeSpec,
    replay_actions: Optional[jax.Array] = None,
    decode_extra_args: tuple = (),
    temperature_override: Optional[jax.Array] = None,
) -> RolloutOutput:
    """Decode loop from a precomputed cache (used by EAS, which fine-tunes
    embeddings/cache directly; reference `rl4co/models/zoo/eas/decoder.py`)."""
    # Untiled-cache grouped decode: keep the cache at [B, ...] and give the
    # decoder the repeat count as a query axis — unless the env updates K/V
    # per state (dynamic embeddings), where we fall back to tiling.
    from rl4co_tpu.models.nn.env_embeddings.dynamic import DYNAMIC_EMBEDDING_REGISTRY

    grouped_ok = env.name not in DYNAMIC_EMBEDDING_REGISTRY

    first_actions = None
    num_repeats = 1
    decode_repeats = 1
    if spec.multistart and spec.num_starts > 1:
        s = spec.num_starts
        starts = jax.vmap(lambda i: env.select_start_nodes(i, s))(instances)  # [B, S]
        first_actions = starts.T.reshape(-1)  # repeat-major [S*B]
        instances = batchify(instances, s)
        num_repeats = s
    elif spec.num_samples > 1:
        instances = batchify(instances, spec.num_samples)
        num_repeats = spec.num_samples
    if num_repeats > 1:
        if grouped_ok:
            decode_repeats = num_repeats
        else:
            cache = batchify(cache, num_repeats)

    state0 = env.reset_batch(instances)
    t_steps = env.max_steps
    keys = jax.random.split(key, t_steps)
    ts = jnp.arange(t_steps)
    replay = (
        jnp.moveaxis(replay_actions, 1, 0)
        if replay_actions is not None
        else jnp.zeros((t_steps, state0.done.shape[0]), dtype=jnp.int32)
    )

    def step_fn(state, xs):
        t, k, replay_t = xs
        mask = env.action_mask_batch(state)
        logits = policy.apply(
            params, cache, state, mask, decode_repeats, *decode_extra_args,
            method="decode_step",
        )
        # softmax/sampling numerics always in f32 (policy may compute in bf16)
        if temperature_override is None:
            logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        else:
            from rl4co_tpu.decoding import process_logits

            logprobs = process_logits(
                logits.astype(jnp.float32), mask,
                temperature=temperature_override, top_p=spec.top_p,
                top_k=spec.top_k, tanh_clipping=spec.tanh_clipping,
                mask_logits=spec.mask_logits,
            )
        action, logprob = decode_action(k, logprobs, mask, spec, replay_t)
        if first_actions is not None:
            action = jnp.where(t == 0, first_actions, action)
            from rl4co_tpu.decoding import take_along_last

            logprob = jnp.where(t == 0, 0.0, take_along_last(logprobs, action))
        # steps after done contribute nothing
        probs = jnp.exp(logprobs)
        step_entropy = -jnp.sum(
            jnp.where(probs > 0, probs * logprobs, 0.0), axis=-1
        )
        logprob = jnp.where(state.done, 0.0, logprob)
        step_entropy = jnp.where(state.done, 0.0, step_entropy)
        next_state = env.step_batch(state, action)
        return next_state, (action, logprob, step_entropy)

    scan_body = jax.checkpoint(step_fn) if spec.remat else step_fn
    final_state, (actions, logprobs, entropies) = jax.lax.scan(
        scan_body, state0, (ts, keys, replay)
    )
    actions = jnp.moveaxis(actions, 0, 1)      # [B', T]
    logprobs = jnp.moveaxis(logprobs, 0, 1)    # [B', T]
    entropy = entropies.sum(axis=0)            # [B']

    reward = env.reward_batch(final_state, actions)
    ll = get_log_likelihood(logprobs)

    out = RolloutOutput(
        reward=reward, log_likelihood=ll, actions=actions,
        logprobs=logprobs, entropy=entropy,
    )
    if num_repeats > 1 and spec.select_best:
        out = select_best(out, num_repeats)
    return out


def select_best(out: RolloutOutput, num_repeats: int) -> RolloutOutput:
    """Reduce the starts/samples axis by max reward
    (reference `rl4co/utils/decoding.py:415-423`)."""
    grouped = unbatchify(out, num_repeats)  # fields become [B, R, ...]
    best = jnp.argmax(grouped.reward, axis=-1)  # [B]
    take = lambda x: jnp.take_along_axis(
        x, best.reshape(best.shape + (1,) * (x.ndim - 1)), axis=1
    )[:, 0]
    return jax.tree_util.tree_map(take, grouped)
