"""Fused pointer kernel correctness (interpret mode on CPU) vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.ops.pointer_kernel import (
    _reference_impl,
    fused_pointer_logits,
    mask_to_neg_bias,
)


def test_kernel_matches_reference():
    key = jax.random.PRNGKey(0)
    b, n, d, h = 4, 10, 32, 4
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    lk = jax.random.normal(ks[3], (b, n, d))
    w = jax.random.normal(ks[4], (d, d)) / d**0.5
    mask = jax.random.bernoulli(ks[5], 0.7, (b, n))
    mask = mask.at[:, 0].set(True)  # at least one feasible
    bias = mask_to_neg_bias(mask)
    out_kernel = fused_pointer_logits(q, k, v, lk, bias, w, h, 10.0)
    out_ref = _reference_impl(q, k, v, lk, bias, w, h, 10.0)
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_kernel_gradients_flow():
    b, n, d, h = 3, 8, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (b, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    lk = jax.random.normal(ks[3], (b, n, d))
    w = jax.random.normal(ks[4], (d, d)) / d**0.5
    bias = jnp.zeros((b, n))

    def f(q, k, v, lk, w):
        return fused_pointer_logits(q, k, v, lk, bias, w, h, 0.0).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, lk, w)

    def f_ref(q, k, v, lk, w):
        return _reference_impl(q, k, v, lk, bias, w, h, 0.0).sum()

    grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, lk, w)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=2e-4, atol=2e-5)


def test_policy_pallas_impl_matches_xla():
    env = get_env("tsp", num_loc=8)
    policy_x = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                    num_encoder_layers=1, feedforward_hidden=64,
                                    pointer_impl="xla")
    policy_p = AttentionModelPolicy(env_name="tsp", embed_dim=32,
                                    num_encoder_layers=1, feedforward_hidden=64,
                                    pointer_impl="pallas")
    params = init_policy_params(policy_x, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    spec = DecodeSpec(kind="greedy", tanh_clipping=10.0)
    out_x = rollout(policy_x, params, env, instances, jax.random.PRNGKey(2), spec)
    out_p = rollout(policy_p, params, env, instances, jax.random.PRNGKey(2), spec)
    np.testing.assert_array_equal(np.asarray(out_x.actions), np.asarray(out_p.actions))
    np.testing.assert_allclose(
        np.asarray(out_x.reward), np.asarray(out_p.reward), rtol=1e-5
    )


def test_kernel_large_n_ragged_padding():
    """N=500 (pads to 512): padded columns must contribute nothing and the
    kernel must match the reference (VERDICT r1 #2 / SURVEY §7 large-N
    decode; K/V stream per-instance through VMEM)."""
    b, n, d, h = 4, 500, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    q = jax.random.normal(ks[0], (b, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    lk = jax.random.normal(ks[3], (b, n, d))
    w = jax.random.normal(ks[4], (d, d)) / d**0.5
    mask = jax.random.bernoulli(ks[5], 0.6, (b, n)).at[:, 0].set(True)
    bias = mask_to_neg_bias(mask)
    out = fused_pointer_logits(q, k, v, lk, bias, w, h, 0.0)
    ref = _reference_impl(q, k, v, lk, bias, w, h, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-5)


def test_kernel_grouped_multistart_queries():
    """Grouped queries [B, L, D] sharing one instance's K/V (the POMO
    multistart product path) with per-start masks and ragged L (pads to the
    L block)."""
    b, l, n, d, h = 3, 5, 20, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    q = jax.random.normal(ks[0], (b, l, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    lk = jax.random.normal(ks[3], (b, n, d))
    w = jax.random.normal(ks[4], (d, d)) / d**0.5
    mask = jax.random.bernoulli(ks[5], 0.6, (b, l, n))
    mask = mask.at[:, :, 0].set(True)
    bias = mask_to_neg_bias(mask)
    out = fused_pointer_logits(q, k, v, lk, bias, w, h, 0.0)
    assert out.shape == (b, l, n)
    ref = _reference_impl(q, k, v, lk, bias, w, h, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-5)

    # gradients through the grouped path
    def f(q, k, v, lk, w):
        return fused_pointer_logits(q, k, v, lk, bias, w, h, 0.0).sum()

    def f_ref(q, k, v, lk, w):
        return _reference_impl(q, k, v, lk, bias, w, h, 0.0).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, lk, w)
    grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, lk, w)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_kernel_on_tpu_parity():
    """On-chip parity (VERDICT r1 #2 'TPU-mode parity test'): compiled Mosaic
    kernel vs the XLA reference at the product shape. Skipped on CPU CI —
    the interpret-mode tests above cover numerics there; this one exists so
    `pytest tests/test_pointer_kernel.py` on a TPU host validates the real
    compile."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("real-TPU-only test")
    b, l, n, d, h = 32, 16, 100, 128, 8
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    q = jax.random.normal(ks[0], (b, l, d))
    k = jax.random.normal(ks[1], (b, n, d))
    v = jax.random.normal(ks[2], (b, n, d))
    lk = jax.random.normal(ks[3], (b, n, d))
    w = jax.random.normal(ks[4], (d, d)) / d**0.5
    mask = jax.random.bernoulli(ks[5], 0.7, (b, l, n)).at[:, :, 0].set(True)
    bias = mask_to_neg_bias(mask)
    out = jax.jit(lambda *a: fused_pointer_logits(*a, h, 0.0))(q, k, v, lk, bias, w)
    ref = _reference_impl(q, k, v, lk, bias, w, h, 0.0)
    # MXU rounds inputs to bf16; compare at bf16-level tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
