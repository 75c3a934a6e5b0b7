"""Basic neural ops (reference `rl4co/models/nn/ops.py:30-131`, `nn/mlp.py`).

Normalization semantics follow the reference `Normalization` module
(`nn/ops.py:30-54`):

- ``batch``: normalize each channel over (batch, nodes) with affine params.
  The reference uses torch BatchNorm1d with running stats; here we always use
  current-batch statistics (pure-functional, no mutable state — large RL
  batches make the difference negligible, and eval batches are large too).
- ``instance``: normalize each channel over nodes, per instance, with affine.
- ``layer``: normalize over (nodes, channels) per instance, no affine
  (faithful to the reference's custom "layer" branch).
- ``rms``: RMSNorm (TPU-friendly extra, not in reference).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class TPDense(nn.Dense):
    """`nn.Dense` carrying a structural tensor-parallel role marker.

    ``tp_role`` declares the kernel's place in a megatron pair — ``"col"``
    (first matmul: output features split over the ``model`` mesh axis) or
    ``"row"`` (second matmul: input features already split, one reduction
    per block). The role is sown into the ``intermediates`` collection,
    which `Module.init` denies by default, so parameter pytrees (and
    checkpoints) are byte-identical to plain `nn.Dense`; extract the
    markers with ``init(..., mutable=["params", "intermediates"])``
    (`rl4co_tpu.models.policies.constructive.policy_tp_roles`). The TP
    placement (`parallel/mesh.py`) reads these markers instead of
    name-matching parameter paths, so renaming modules cannot silently
    degrade sharding to replication (VERDICT r4 #8).
    """

    tp_role: str = "none"  # 'col' | 'row' | 'none'

    def __call__(self, x: jax.Array) -> jax.Array:
        self.sow("intermediates", "tp_role", self.tp_role,
                 init_fn=lambda: "none", reduce_fn=lambda _, b: b)
        return super().__call__(x)


class Normalization(nn.Module):
    normalization: str = "batch"
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.normalization in (None, "none"):
            return x
        d = x.shape[-1]
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # statistics in f32 for bf16 activations
        if self.normalization == "batch":
            mean = x.mean(axis=tuple(range(x.ndim - 1)), keepdims=True)
            var = x.var(axis=tuple(range(x.ndim - 1)), keepdims=True)
            scale = self.param("scale", nn.initializers.ones, (d,))
            bias = self.param("bias", nn.initializers.zeros, (d,))
            return ((x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias).astype(in_dtype)
        if self.normalization == "instance":
            mean = x.mean(axis=-2, keepdims=True)
            var = x.var(axis=-2, keepdims=True)
            scale = self.param("scale", nn.initializers.ones, (d,))
            bias = self.param("bias", nn.initializers.zeros, (d,))
            return ((x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias).astype(in_dtype)
        if self.normalization == "layer":
            mean = x.mean(axis=(-2, -1), keepdims=True)
            var = x.var(axis=(-2, -1), keepdims=True)
            return ((x - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(in_dtype)
        if self.normalization == "rms":
            ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            scale = self.param("scale", nn.initializers.ones, (d,))
            return (x * jax.lax.rsqrt(ms + self.epsilon) * scale).astype(in_dtype)
        raise ValueError(f"Unknown normalization {self.normalization}")


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


class MLP(nn.Module):
    """Generic MLP (reference `rl4co/models/nn/mlp.py:8-76`)."""

    output_dim: int
    num_neurons: Sequence[int] = ()
    hidden_act: str = "relu"
    out_act: str = "identity"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.hidden_act.lower()]
        for h in self.num_neurons:
            x = nn.Dense(h, use_bias=self.use_bias)(x)
            x = act(x)
        x = nn.Dense(self.output_dim, use_bias=self.use_bias)(x)
        return ACTIVATIONS[self.out_act.lower()](x)


class TransformerFFN(nn.Module):
    """Feed-forward block used inside encoder layers (reference `nn/ops.py:86-104`)."""

    embed_dim: int
    feedforward_hidden: int = 512
    hidden_act: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # explicit names keep parameter paths identical to the historical
        # auto-generated nn.Dense names (checkpoint compatibility)
        if self.feedforward_hidden <= 0:
            return TPDense(self.embed_dim, dtype=self.dtype, name="Dense_0")(x)
        h = TPDense(self.feedforward_hidden, dtype=self.dtype,
                    tp_role="col", name="Dense_0")(x)
        h = ACTIVATIONS[self.hidden_act.lower()](h)
        return TPDense(self.embed_dim, dtype=self.dtype,
                       tp_role="row", name="Dense_1")(h)


class PositionalEncoding(nn.Module):
    """Sinusoidal positional encoding (reference `nn/ops.py:57-83`)."""

    embed_dim: int
    max_len: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array, positions: jax.Array | None = None) -> jax.Array:
        d = self.embed_dim
        pos = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
        div = jnp.exp(jnp.arange(0, d, 2).astype(jnp.float32) * (-jnp.log(10000.0) / d))
        pe = jnp.zeros((self.max_len, d))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        if positions is None:
            return x + pe[: x.shape[-2]]
        return x + pe[positions]


class RandomEncoding(nn.Module):
    """Random node encoding used by MatNet (reference `nn/ops.py:107-131`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        shape = x.shape[:-1] + (self.embed_dim,)
        return jax.random.uniform(key, shape, dtype=x.dtype)
