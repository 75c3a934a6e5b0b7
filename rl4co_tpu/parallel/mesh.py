"""Device mesh and sharding utilities.

The TPU-native replacement for the reference's Lightning-DDP data
parallelism (`rl4co/utils/trainer.py:73-86`; SURVEY.md §2.10): a
`jax.sharding.Mesh` with a ``dp`` axis over all chips (hosts × devices),
instances sharded over ``dp``, params replicated; `jax.jit` + GSPMD insert
the psum gradient reduction over ICI automatically — there is no NCCL-style
explicit collective code to write.

A second (size-1 by default) ``model`` axis is kept for AM-XL style tensor
sharding headroom (SURVEY.md §2.10 closing note).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ``(dp, model)`` mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // model
    assert dp * model == n, f"dp({dp}) * model({model}) != #devices({n})"
    arr = np.array(devices).reshape(dp, model)
    return Mesh(arr, axis_names=("dp", "model"))


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with its leading axis sharded over ``dp``."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def constrain_dp(tree, mesh: Optional[Mesh]):
    """Inside jit: constrain a batched pytree's leading axis onto ``dp``."""
    if mesh is None:
        return tree
    return jax.lax.with_sharding_constraint(tree, NamedSharding(mesh, P("dp")))


# Fallback path fragments of the *second* matmul of a megatron pair: its
# input features are already model-sharded by the first matmul, so
# row-sharding it lets GSPMD keep the intermediate sharded and emit ONE
# reduce per block instead of an all-gather between every pair of matmuls
# (ADVICE r3). Used only when no structural `roles` tree is supplied —
# the robust path is the TPDense tp_role markers (VERDICT r4 #8).
_ROW_SHARDED = ("ffn']['Dense_1", "mha']['out_proj")
# (The first matmul of each pair — FFN up-projection, fused QKV — falls
# under the generic column-shard rule below, splitting the wide
# intermediate across `model`.)


def tp_role_lookup(roles) -> dict:
    """Flatten a TPDense marker tree into ``{module-path: role}``.

    ``roles`` is the ``intermediates`` collection from
    ``policy.init(..., mutable=["params", "intermediates"])`` — string
    leaves named ``tp_role`` under each marked module's scope (see
    `models/nn/ops.py` TPDense). Keys are "/"-joined scope names, e.g.
    ``encoder_net/layer_0/mha/out_proj``.
    """
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(
        roles, is_leaf=lambda x: isinstance(x, str))[0]
    for path, leaf in flat:
        if not isinstance(leaf, str):
            continue
        keys = []
        for p in path:
            name = getattr(p, "key", getattr(p, "idx", None))
            if name == "tp_role":
                break
            keys.append(str(name))
        out["/".join(keys)] = leaf
    return out


def _param_module_path(path) -> str:
    """Module scope of a param leaf: drop the leaf name (kernel/bias) and a
    leading 'params' collection key."""
    keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path[:-1]]
    if keys and keys[0] == "params":
        keys = keys[1:]
    return "/".join(keys)


def shard_params_model_axis(params, mesh: Mesh, min_dim: int = 128,
                            roles=None):
    """Tensor-parallel parameter placement over the ``model`` axis (GSPMD).

    Megatron-style paired sharding of the encoder blocks: the first matmul
    of each pair (FFN up-projection, fused QKV) is column-sharded
    ``P(None, 'model')`` and the second (FFN down-projection, attention
    out-projection) row-sharded ``P('model', None)``, so the intermediate
    activations stay sharded and each block needs a single reduction
    rather than an all-gather per matmul. Remaining 2-D kernels with
    ≥ ``min_dim`` output features divisible by ``model`` are column-sharded;
    everything else replicated. XLA/GSPMD propagates the shardings and
    inserts the collectives — no hand-written psum. With ``model=1`` this
    is exactly :func:`replicate`.

    ``roles``: structural TP markers — either the raw ``intermediates``
    collection from a marker-extracting init (see
    `constructive.policy_tp_roles`) or a pre-flattened
    :func:`tp_role_lookup` dict. When given, megatron pairing keys on the
    markers (robust to module renames); otherwise the historical
    path-fragment match is used.
    """
    m = mesh.shape["model"]
    lookup = None
    if roles is not None:
        lookup = roles if isinstance(roles, dict) and roles and all(
            isinstance(v, str) for v in roles.values()) else tp_role_lookup(roles)
        if not lookup:
            # an empty marker tree (policy without TPDense modules) must not
            # silently disable row-sharding — fall back to the fragment
            # match, exactly as if no roles were supplied (r5 review #4)
            lookup = None

    def place(path, x):
        nd = getattr(x, "ndim", 0)
        if m > 1 and nd >= 1:
            name = jax.tree_util.keystr(path)
            # Expert parallelism: MoE expert params carry a leading expert
            # axis (nn.vmap variable_axes, `models/nn/moe.py`); sharding it
            # over `model` runs each device's expert slice on all tokens and
            # GSPMD psums the gate-weighted mix — EP without dispatch code
            # (the reference's in-process MoE has no expert sharding at all,
            # SURVEY §2.10).
            if ("experts']" in name and x.shape[0] % m == 0):
                return jax.device_put(
                    x, NamedSharding(mesh, P(*(("model",) + (None,) * (nd - 1))))
                )
            if nd == 2:
                if lookup is not None:
                    role = lookup.get(_param_module_path(path), "none")
                    row = role == "row"
                else:
                    row = any(f in name for f in _ROW_SHARDED)
                if row and x.shape[0] % m == 0 and x.shape[0] >= min_dim:
                    return jax.device_put(x, NamedSharding(mesh, P("model", None)))
                if x.shape[1] % m == 0 and x.shape[1] >= min_dim:
                    return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
