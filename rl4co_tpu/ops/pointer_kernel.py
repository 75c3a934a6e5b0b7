"""Fused Pallas TPU kernel for the AM pointer decode step.

The autoregressive decode step is the framework's hot kernel (SURVEY.md §7
step 4): per step, each instance computes a single-query masked multi-head
glimpse over cached K/V, an output projection, and logit-key scores. In XLA
this is ~a dozen small ops per step (layout changes, masked softmax, two
batched GEMVs, one GEMM); the Pallas kernel fuses the whole step into one
pass over the K/V/logit-K cache — one HBM read of each cache tensor and a
single kernel launch per decode step.

Forward = Pallas; backward = `jax.vjp` of the identical jnp reference
implementation (recompute — the decode step is cheap relative to its
memory traffic, classic rematerialization trade).

Status: numerics + gradients validated against the XLA reference (interpret
mode, `tests/test_pointer_kernel.py`). On this image's tunneled TPU backend
the Mosaic compile stalls, so `AttentionModelPolicy(pointer_impl="pallas")`
remains opt-in; the default decode path is XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


def _reference_impl(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping):
    """Pure-jnp reference (matches `rl4co_tpu.models.nn.attention.pointer_logits`
    + tanh clipping + masking, single query)."""
    b, n, d = k.shape
    hd = d // num_heads

    def split(x):
        return x.reshape(b, -1, num_heads, hd).swapaxes(1, 2)

    qh = split(q[:, None, :])  # [B, H, 1, hd]
    kh, vh = split(k), split(v)
    scores = jnp.einsum("bhld,bhnd->bhln", qh, kh) / jnp.sqrt(jnp.asarray(hd, q.dtype))
    scores = scores + neg_bias[:, None, None, :].astype(scores.dtype)
    attn = jax.nn.softmax(scores, axis=-1)
    heads = jnp.einsum("bhln,bhnd->bhld", attn, vh)
    glimpse = heads.swapaxes(1, 2).reshape(b, d) @ w_out
    logits = jnp.einsum("bd,bnd->bn", glimpse, lk) / jnp.sqrt(jnp.asarray(d, q.dtype))
    return logits  # masking/clipping applied downstream by process_logits


def _kernel(q_ref, k_ref, v_ref, lk_ref, bias_ref, wout_ref, out_ref,
            *, num_heads: int, tanh_clipping: float):
    q = q_ref[:].astype(jnp.float32)          # [BB, D]
    bias = bias_ref[:].astype(jnp.float32)    # [BB, N]
    bb, d = q.shape
    n = bias.shape[-1]
    hd = d // num_heads

    # per-head masked softmax glimpse (VPU: elementwise + lane reductions)
    glimpse_parts = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        kh = k_ref[:, :, sl].astype(jnp.float32)      # [BB, N, hd]
        qh = q[:, sl]                                  # [BB, hd]
        s = (kh * qh[:, None, :]).sum(axis=-1)         # [BB, N]
        s = s * (1.0 / (hd ** 0.5)) + bias
        s = s - s.max(axis=-1, keepdims=True)
        e = jnp.exp(s)
        attn = e / e.sum(axis=-1, keepdims=True)       # [BB, N]
        vh = v_ref[:, :, sl].astype(jnp.float32)
        glimpse_parts.append((attn[:, :, None] * vh).sum(axis=1))  # [BB, hd]
    glimpse = jnp.concatenate(glimpse_parts, axis=-1)  # [BB, D]

    # output projection (MXU)
    w = wout_ref[:].astype(jnp.float32)
    proj = jnp.dot(glimpse, w, preferred_element_type=jnp.float32)  # [BB, D]

    # logit-key scores
    lk = lk_ref[:].astype(jnp.float32)                 # [BB, N, D]
    logits = (lk * proj[:, None, :]).sum(axis=-1) * (1.0 / (d ** 0.5))
    out_ref[:] = logits


def _pallas_forward(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping,
                    block_b: int = 256):
    b, n, d = k.shape
    block_b = min(block_b, b)
    grid = (pl.cdiv(b, block_b),)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, tanh_clipping=tanh_clipping
    )
    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 2 + 2 * b * d * d,
            bytes_accessed=3 * b * n * d * k.dtype.itemsize,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(q, k, v, lk, neg_bias, w_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_pointer_logits(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping):
    """Fused decode-step logits.

    Args:
        q: [B, D] context query (already projected + graph context added).
        k, v, lk: [B, N, D] glimpse key/value and logit key caches.
        neg_bias: [B, N] additive mask bias (0 feasible / -1e9 infeasible).
        w_out: [D, D] pointer output projection (no bias, as reference).
    Returns: [B, N] float32 raw logits (the inner glimpse is masked via
    ``neg_bias``; output masking + tanh clipping stay in `process_logits`).
    """
    return _pallas_forward(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping)


def _fwd(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping):
    out = _pallas_forward(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping)
    return out, (q, k, v, lk, neg_bias, w_out)


def _bwd(num_heads, tanh_clipping, res, g):
    q, k, v, lk, neg_bias, w_out = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, lk_, w_: _reference_impl(
            q_, k_, v_, lk_, neg_bias, w_, num_heads, tanh_clipping
        ),
        q, k, v, lk, w_out,
    )
    dq, dk, dv, dlk, dw = vjp(g)
    return dq, dk, dv, dlk, None, dw


fused_pointer_logits.defvjp(_fwd, _bwd)


def mask_to_neg_bias(mask: jax.Array) -> jax.Array:
    return jnp.where(mask, 0.0, MASK_VALUE).astype(jnp.float32)
