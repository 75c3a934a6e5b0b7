"""Mixed-precision helpers.

TPU equivalent of the reference's Lightning ``precision="16-mixed"``
(`rl4co/utils/trainer.py:57`): master params stay float32; casting them to
bfloat16 before `policy.apply` makes every Dense promote to bf16 compute
(MXU-native), while normalization statistics and the softmax/sampling path
stay float32 (`Normalization` upcasts internally; `rollout` casts logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast floating-point leaves of a pytree to ``dtype``; others untouched."""

    def _cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
