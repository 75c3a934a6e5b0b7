"""Tensor-utility tests (reference `tests/test_utils.py`): batchify
round-trips, decoding filters, and the dense-backward index ops that
replaced TPU-hostile scatters (round-3 speedup: 7x train throughput)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.decoding import take_along_last
from rl4co_tpu.utils.ops import (
    batchify,
    gather_by_index,
    inverse_permutation,
    set_at,
    set_at2,
    unbatchify,
)


def test_batchify_unbatchify_roundtrip():
    x = {"a": jnp.arange(12.0).reshape(3, 4), "b": jnp.arange(3)}
    y = batchify(x, 5)
    assert y["a"].shape == (15, 4)
    z = unbatchify(y, 5)
    # unbatchify returns [B, repeats, ...]; every repeat slice equals the original
    for r in range(5):
        np.testing.assert_array_equal(z["a"][:, r], x["a"])


def test_gather_by_index_matches_naive_and_grads():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (6, 9, 4))
    idx1 = jnp.array([0, 8, 3, 5, 2, 7])
    idx2 = jnp.array([[1, 1], [0, 8], [4, 2], [3, 3], [7, 0], [5, 6]])

    naive = jax.vmap(lambda s, i: s[i])
    np.testing.assert_array_equal(gather_by_index(src, idx1), naive(src, idx1))
    np.testing.assert_array_equal(gather_by_index(src, idx2), naive(src, idx2))

    for idx in (idx1, idx2):
        f = lambda s: (gather_by_index(s, idx) ** 3).sum()
        f_ref = lambda s: (naive(s, idx) ** 3).sum()
        np.testing.assert_allclose(jax.grad(f)(src), jax.grad(f_ref)(src),
                                   rtol=1e-5)


def test_take_along_last_matches_take_along_axis():
    key = jax.random.PRNGKey(1)
    vals = jax.random.normal(key, (5, 7))
    idx = jnp.array([3, 0, 6, 6, 1])
    ref = jnp.take_along_axis(vals, idx[:, None], axis=-1)[:, 0]
    np.testing.assert_allclose(take_along_last(vals, idx), ref, rtol=1e-6)
    # gradient parity with the scatter-backward reference
    g = jax.grad(lambda v: (take_along_last(v, idx) ** 2).sum())(vals)
    g_ref = jax.grad(
        lambda v: (jnp.take_along_axis(v, idx[:, None], axis=-1) ** 2).sum()
    )(vals)
    np.testing.assert_allclose(g, g_ref, rtol=1e-6)


def test_scatter_free_updates():
    x = jnp.zeros((5, 3))
    y = set_at(x, jnp.int32(2), 7.0)
    assert float(y[2, 0]) == 7.0 and float(y.sum()) == 21.0
    z = set_at2(jnp.zeros((4, 4)), jnp.int32(1), jnp.int32(3), 5.0)
    assert float(z[1, 3]) == 5.0 and float(z.sum()) == 5.0
    perm = jnp.array([2, 0, 3, 1])
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv], jnp.arange(4))
