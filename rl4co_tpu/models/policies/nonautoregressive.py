"""Non-autoregressive decode engine: heatmap → scan rollout.

Reference `rl4co/models/common/constructive/nonautoregressive/decoder.py:21-43`
(`heatmap_to_logits`: index the heatmap row of the current node) driven by
the same done-loop as AR policies. Here the whole rollout is one `lax.scan`
over a dense ``[B, N, N]`` heatmap-logits matrix; multistart/multisample use
the untiled heatmap with a grouped row gather (no K/V analog to tile).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rl4co_tpu.decoding import (
    DecodeSpec,
    decode_action,
    get_log_likelihood,
    process_logits_spec,
)
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import RolloutOutput, select_best
from rl4co_tpu.utils.ops import batchify, gather_by_index


def heatmap_row_logits(heatmap_logits: jax.Array, current_node: jax.Array, num_repeats: int):
    """heatmap [B, N, N], current_node flat [R*B] (repeat-major) -> [R*B, N].

    Routed through `gather_by_index` for its dense-matmul backward: the
    heatmap is the *trained* tensor (DeepACO/GFACS differentiate through
    this gather every decode token), and the naive vmapped-gather VJP is a
    serialized scatter-add on TPU (round-3 finding, 7x on the AR step)."""
    b = heatmap_logits.shape[0]
    if num_repeats == 1:
        return gather_by_index(heatmap_logits, current_node)       # [B, N]
    cur = current_node.reshape(num_repeats, b)
    rows_bk = gather_by_index(heatmap_logits, cur.T)               # [B, R, N]
    return jnp.moveaxis(rows_bk, 0, 1).reshape(num_repeats * b, -1)


def nar_rollout(
    env: Env,
    instances,
    heatmap_logits: jax.Array,  # [B, N_actions, N_actions] log-heatmap
    key: jax.Array,
    spec: DecodeSpec,
    first_actions: Optional[jax.Array] = None,
    replay_actions: Optional[jax.Array] = None,
) -> RolloutOutput:
    """Rollout sampling transitions from heatmap rows (current node → next)."""
    num_repeats = 1
    if spec.multistart and spec.num_starts > 1:
        s = spec.num_starts
        if first_actions is None:
            starts = jax.vmap(lambda i: env.select_start_nodes(i, s))(instances)
            first_actions = starts.T.reshape(-1)
        instances = batchify(instances, s)
        num_repeats = s
    elif spec.num_samples > 1:
        instances = batchify(instances, spec.num_samples)
        num_repeats = spec.num_samples
        first_actions = None

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
        logits = heatmap_row_logits(heatmap_logits, state.current_node, num_repeats)
        logprobs = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        action, logprob = decode_action(k, logprobs, mask, spec, replay_t)
        if first_actions is not None:
            action = jnp.where(t == 0, first_actions, action)
            from rl4co_tpu.decoding import take_along_last

            logprob = jnp.where(t == 0, 0.0, take_along_last(logprobs, action))
        probs = jnp.exp(logprobs)
        step_entropy = -jnp.sum(jnp.where(probs > 0, probs * logprobs, 0.0), axis=-1)
        logprob = jnp.where(state.done, 0.0, logprob)
        step_entropy = jnp.where(state.done, 0.0, step_entropy)
        next_state = env.step_batch(state, action)
        return next_state, (action, logprob, step_entropy)

    final_state, (actions, logprobs, entropies) = jax.lax.scan(
        step_fn, state0, (ts, keys, replay)
    )
    actions = jnp.moveaxis(actions, 0, 1)
    logprobs = jnp.moveaxis(logprobs, 0, 1)
    reward = env.reward_batch(final_state, actions)
    out = RolloutOutput(
        reward=reward,
        log_likelihood=get_log_likelihood(logprobs),
        actions=actions,
        logprobs=logprobs,
        entropy=entropies.sum(axis=0),
    )
    if num_repeats > 1 and spec.select_best:
        out = select_best(out, num_repeats)
    return out


def random_feasible_starts(
    env: Env, instances, num_starts: int, key: jax.Array
) -> jax.Array:
    """Sample feasible first actions with replacement (reference DeepACO
    `select_start_node_fn`, `zoo/deepaco/policy.py:98-107`). Returns
    repeat-major flat [S*B]."""
    state = env.reset_batch(instances)
    mask = env.action_mask_batch(state)  # [B, A]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    draws = jax.random.categorical(
        key, logits[:, None, :], axis=-1, shape=(mask.shape[0], num_starts)
    )  # [B, S]
    return draws.T.reshape(-1).astype(jnp.int32)
