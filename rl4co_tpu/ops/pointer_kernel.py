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


def _full_n_forward(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping,
                    block_b: int = 256):
    """Variant A: whole-N caches in VMEM, grid over batch blocks only.
    VMEM per step ~= 3 * block_b * N * D * 4B — small-N decode (N ≲ 200)."""
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


def _glimpse_kernel(q_ref, k_ref, v_ref, bias_ref, wout_ref, out_ref,
                    m_scr, l_scr, acc_scr, *, num_heads: int):
    """Variant B inner: online-softmax glimpse accumulation over N blocks.

    Grid is (B_blocks, N_blocks) with N innermost; VMEM scratch (running
    per-head max `m`, denominator `l`, weighted-V accumulator `acc`) carries
    across the N sweep — K/V stream through VMEM in O(block_n) pieces, so
    memory is O(N) in HBM and O(1) in VMEM (SURVEY.md §7: masked pointer
    attention at N≥500 without materializing O(N²))."""
    j = pl.program_id(1)
    q = q_ref[:].astype(jnp.float32)            # [bb, D]
    bias = bias_ref[:].astype(jnp.float32)      # [bb, bn]
    bb, d = q.shape
    hd = d // num_heads

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr[:], -1e30)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        kh = k_ref[:, :, sl].astype(jnp.float32)        # [bb, bn, hd]
        qh = q[:, sl]
        s = (kh * qh[:, None, :]).sum(axis=-1) * (1.0 / (hd ** 0.5)) + bias
        m_old = m_scr[:, h]                              # [bb]
        m_new = jnp.maximum(m_old, s.max(axis=-1))
        scale = jnp.exp(m_old - m_new)                   # [bb]
        e = jnp.exp(s - m_new[:, None])                  # [bb, bn]
        vh = v_ref[:, :, sl].astype(jnp.float32)
        acc_scr[:, sl] = acc_scr[:, sl] * scale[:, None] + (
            e[:, :, None] * vh
        ).sum(axis=1)
        l_scr[:, h] = l_scr[:, h] * scale + e.sum(axis=-1)
        m_scr[:, h] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        glimpse = acc_scr[:] / jnp.repeat(l_scr[:], hd, axis=1)  # [bb, D]
        w = wout_ref[:].astype(jnp.float32)
        out_ref[:] = jnp.dot(glimpse, w, preferred_element_type=jnp.float32)


def _blocked_glimpse(q, k, v, neg_bias, w_out, num_heads,
                     block_b: int = 128, block_n: int = 128):
    """Variant B wrapper: returns the projected glimpse [B, D] (f32)."""
    b, n, d = k.shape
    block_b = min(block_b, b)
    # pad N to a block multiple; padded columns get MASK_VALUE bias -> their
    # exp() underflows against any real max, contributing nothing
    n_pad = (-n) % block_n
    if n_pad:
        pad3 = ((0, 0), (0, n_pad), (0, 0))
        k = jnp.pad(k, pad3)
        v = jnp.pad(v, pad3)
        neg_bias = jnp.pad(neg_bias, ((0, 0), (0, n_pad)),
                           constant_values=MASK_VALUE)
    n_full = n + n_pad
    grid = (pl.cdiv(b, block_b), n_full // block_n)
    kernel = functools.partial(_glimpse_kernel, num_heads=num_heads)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, num_heads), jnp.float32),  # running max
            pltpu.VMEM((block_b, num_heads), jnp.float32),  # denominator
            pltpu.VMEM((block_b, d), jnp.float32),          # weighted V acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_full * d * 2 + 2 * b * d * d,
            bytes_accessed=2 * b * n_full * d * k.dtype.itemsize,
            transcendentals=b * n_full * 2,
        ),
        interpret=interpret,
    )(q, k, v, neg_bias, w_out)


# VMEM budget for picking the variant: variant A holds 3 f32 copies of the
# [block_b, N, D] caches (+ in/out pipelining headroom).
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024
_MIN_BLOCK_B = 8


def _pallas_forward(q, k, v, lk, neg_bias, w_out, num_heads, tanh_clipping):
    b, n, d = k.shape
    bytes_per_row = 3 * n * d * 4  # K/V/logit-K f32 rows in VMEM
    fit = _VMEM_BUDGET_BYTES // max(1, bytes_per_row)
    block_b = max(_MIN_BLOCK_B, min(256, (fit // 8) * 8))
    # variant A needs enough batch rows per step to stay efficient; below
    # that, stream K/V in N blocks instead (variant B)
    if fit >= 32 or b <= _MIN_BLOCK_B:
        return _full_n_forward(q, k, v, lk, neg_bias, w_out, num_heads,
                               tanh_clipping, block_b=block_b)
    # large N: stream K/V through VMEM; the lk·proj scores stay in XLA
    # (one read of lk either way — same HBM traffic as full fusion)
    proj = _blocked_glimpse(q, k, v, neg_bias, w_out, num_heads)
    logits = jnp.einsum(
        "bd,bnd->bn", proj, lk.astype(jnp.float32)
    ) * (1.0 / (d ** 0.5))
    return logits


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
