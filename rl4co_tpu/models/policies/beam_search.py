"""Beam search decoding.

Reference `rl4co/utils/decoding.py:464-600` (`BeamSearch`): maintain the W
highest-log-probability partial solutions per instance; the reference keeps
Python lists of parent pointers and backtracks at the end
(`decoding.py:527-557`). Here the beam state (env states, action histories,
per-step logprobs) is gathered by parent index *inside the scan carry*, so
no backtracking pass is needed — the whole search is one XLA program.

Layout: flat beams are repeat-major ``[W*B]`` like multistart, so the
untiled-cache grouped decode path applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rl4co_tpu.decoding import DecodeSpec, process_logits_spec
from rl4co_tpu.envs.base import Env
from rl4co_tpu.models.policies.constructive import RolloutOutput
from rl4co_tpu.utils.ops import batchify, unbatchify


def beam_search_rollout(
    policy,
    params,
    env: Env,
    instances,
    key: jax.Array,  # unused (beam search is deterministic); kept for API parity
    beam_width: int,
    spec: DecodeSpec = DecodeSpec(kind="greedy"),
    select_best: bool = True,
) -> RolloutOutput:
    w = beam_width
    b = jax.tree_util.tree_leaves(instances)[0].shape[0]
    t_steps = env.max_steps
    a = env.num_actions

    embeddings = policy.apply(params, instances, method="encode")
    cache = policy.apply(params, embeddings, method="precompute")

    from rl4co_tpu.models.nn.env_embeddings.dynamic import DYNAMIC_EMBEDDING_REGISTRY

    grouped_ok = env.name not in DYNAMIC_EMBEDDING_REGISTRY
    decode_repeats = w if grouped_ok else 1
    if not grouped_ok:
        cache = batchify(cache, w)

    instances_w = batchify(instances, w)
    state0 = env.reset_batch(instances_w)  # [W*B]

    def flat_to_grouped(x):  # [W*B, ...] -> [B, W, ...]
        return jnp.moveaxis(x.reshape((w, b) + x.shape[1:]), 0, 1)

    def grouped_to_flat(x):  # [B, W, ...] -> [W*B, ...]
        return jnp.moveaxis(x, 0, 1).reshape((w * b,) + x.shape[2:])

    def gather_beam(tree, parent):  # parent [B, W] indices into beam axis
        def g(x):
            xg = flat_to_grouped(x)
            idx = parent.reshape(parent.shape + (1,) * (xg.ndim - 2))
            return grouped_to_flat(jnp.take_along_axis(xg, idx, axis=1))

        return jax.tree_util.tree_map(g, tree)

    # beam log-probs: only beam 0 is live initially so duplicate-action beams
    # don't fill the beam at step 0 (reference `decoding.py:504-516`)
    init_beam_lp = jnp.full((b, w), -jnp.inf).at[:, 0].set(0.0)

    actions0 = jnp.zeros((w * b, t_steps), dtype=jnp.int32)
    logprobs0 = jnp.zeros((w * b, t_steps))

    def step_fn(carry, t):
        state, beam_lp, actions_hist, logprobs_hist = carry
        mask = env.action_mask_batch(state)
        logits = policy.apply(
            params, cache, state, mask, decode_repeats, method="decode_step"
        )
        step_lp = process_logits_spec(logits.astype(jnp.float32), mask, spec)
        # done beams: only the padding action, with 0 logprob, stays viable
        step_lp = jnp.where(state.done[:, None], jnp.where(mask, 0.0, -jnp.inf), step_lp)
        total = flat_to_grouped(step_lp) + beam_lp[..., None]  # [B, W, A]
        flat_total = total.reshape(b, w * a)
        top_lp, top_idx = jax.lax.top_k(flat_total, w)  # [B, W]
        parent = top_idx // a
        action_g = (top_idx % a).astype(jnp.int32)  # [B, W]

        state = gather_beam(state, parent)
        actions_hist = gather_beam(actions_hist, parent)
        logprobs_hist = gather_beam(logprobs_hist, parent)

        action = grouped_to_flat(action_g)
        # step logprob of the chosen action under its parent beam
        step_lp_g = flat_to_grouped(step_lp)  # [B, W, A]
        parent_lp = jnp.take_along_axis(
            step_lp_g, parent[..., None].repeat(a, axis=-1), axis=1
        )  # [B, W, A] rows reordered by parent
        chosen_lp = jnp.take_along_axis(parent_lp, action_g[..., None], axis=-1)[..., 0]
        step_logprob = grouped_to_flat(chosen_lp)
        step_logprob = jnp.where(state.done, 0.0, step_logprob)

        # column-select write (scatter-free: the TPU backend miscompiles
        # batched dynamic-index scatters in scan at large batch)
        col = jnp.arange(t_steps)[None, :] == t
        actions_hist = jnp.where(col, action[:, None], actions_hist)
        logprobs_hist = jnp.where(col, step_logprob[:, None], logprobs_hist)
        state = env.step_batch(state, action)
        return (state, top_lp, actions_hist, logprobs_hist), None

    (state, beam_lp, actions, logprobs), _ = jax.lax.scan(
        step_fn,
        (state0, init_beam_lp, actions0, logprobs0),
        jnp.arange(t_steps),
    )

    reward = env.reward_batch(state, actions)
    out = RolloutOutput(
        reward=reward,
        log_likelihood=logprobs.sum(axis=-1),
        actions=actions,
        logprobs=logprobs,
        entropy=jnp.zeros_like(reward),
    )
    if select_best:
        grouped = unbatchify(out, w)
        best = jnp.argmax(grouped.reward, axis=-1)
        take = lambda x: jnp.take_along_axis(
            x, best.reshape(best.shape + (1,) * (x.ndim - 1)), axis=1
        )[:, 0]
        out = jax.tree_util.tree_map(take, grouped)
    return out
