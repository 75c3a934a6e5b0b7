"""Instance augmentation (reference `rl4co/data/transforms.py:16-152`).

Symmetric rotations/reflections of the unit square leave routing rewards
invariant; POMO evaluates under the 8 dihedral transforms and takes the max
(`rl4co/models/zoo/pomo/model.py:103-141`).

Here augmentation acts on *instance dicts* before `env.reset`, expanding the
batch repeat-major (augment index is the outer axis), matching
`rl4co_tpu.utils.ops.batchify` layout so `unbatchify(x, num_augment)`
recovers ``[B, A]``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from rl4co_tpu.utils.ops import batchify


def dihedral_8_transform(xy: jax.Array, idx: jax.Array) -> jax.Array:
    """Apply the idx-th (0..7) dihedral-group transform to points in [0,1]^2.

    idx 0 is the identity (reference `data/transforms.py:16-47`).
    """
    x, y = xy[..., 0], xy[..., 1]
    variants = jnp.stack(
        [
            jnp.stack([x, y], axis=-1),
            jnp.stack([1 - x, y], axis=-1),
            jnp.stack([x, 1 - y], axis=-1),
            jnp.stack([1 - x, 1 - y], axis=-1),
            jnp.stack([y, x], axis=-1),
            jnp.stack([1 - y, x], axis=-1),
            jnp.stack([y, 1 - x], axis=-1),
            jnp.stack([1 - y, 1 - x], axis=-1),
        ],
        axis=0,
    )
    return variants[idx]


def symmetric_transform(xy: jax.Array, key: jax.Array) -> jax.Array:
    """Random rotation (about (0.5, 0.5)) + reflection, vectorized
    (reference `data/transforms.py:49-90`)."""
    ktheta, kflip = jax.random.split(key)
    theta = jax.random.uniform(ktheta, ()) * 2 * jnp.pi
    flip = jax.random.bernoulli(kflip, 0.5)
    c, s = jnp.cos(theta), jnp.sin(theta)
    centered = xy - 0.5
    rot = jnp.stack(
        [
            centered[..., 0] * c - centered[..., 1] * s,
            centered[..., 0] * s + centered[..., 1] * c,
        ],
        axis=-1,
    )
    rot = jnp.where(flip, rot.at[..., 0].multiply(-1.0), rot)
    return rot + 0.5


def augment_instances(
    instances: dict,
    num_augment: int = 8,
    augment_fn: str = "dihedral8",
    key: Optional[jax.Array] = None,
    feats: Sequence[str] = ("locs", "depot"),
) -> dict:
    """Expand a batched instance dict to ``[A * B]`` (repeat-major) with the
    a-th copy transformed by the a-th augmentation.

    `dihedral8` requires ``num_augment == 8`` and keeps copy 0 untransformed;
    `symmetric` draws a random transform per copy (copy 0 also untransformed
    for clean max_reward bookkeeping).
    """
    expanded = batchify(instances, num_augment)  # [A*B, ...]
    b = jax.tree_util.tree_leaves(instances)[0].shape[0]

    if augment_fn == "dihedral8":
        assert num_augment == 8, "dihedral8 augmentation requires num_augment=8"
        aug_idx = jnp.repeat(jnp.arange(8), b)  # repeat-major: [A*B]

        def apply(name, arr):
            if name not in feats:
                return arr
            return jax.vmap(dihedral_8_transform)(arr, aug_idx)

    elif augment_fn == "symmetric":
        assert key is not None
        keys = jax.random.split(key, num_augment)

        def apply(name, arr):
            if name not in feats:
                return arr
            grouped = arr.reshape((num_augment, b) + arr.shape[1:])

            def one(xy, k, a):
                out = symmetric_transform(xy, k)
                return jnp.where(a == 0, xy, out)

            out = jax.vmap(one)(grouped, keys, jnp.arange(num_augment))
            return out.reshape(arr.shape)

    else:
        raise ValueError(f"Unknown augment_fn {augment_fn}")

    return {k: apply(k, v) for k, v in expanded.items()}
