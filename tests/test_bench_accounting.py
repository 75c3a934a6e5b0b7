"""bench.py achieved-compute accounting (VERDICT r4 #2).

The analytic FLOP model is the MFU denominator-of-record; these tests pin
its structure against independent arithmetic and check the XLA
cost-analysis probe degrades to None instead of raising.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_am_flops_model_matches_hand_arithmetic():
    b = _load_bench()
    n, d, ff, L = 100, 128, 512, 3
    enc = L * (4 * n * d * d * 2 + 2 * n * n * d * 2 + 2 * n * d * ff * 2)
    enc += 2 * n * 2 * d
    dec = 7 * d * d * 2 + 3 * n * d * 2
    assert b.am_flops_per_env_step("train", n=n) == 4.0 * (enc / n + dec)
    assert b.am_flops_per_env_step("rollout", n=n) == enc / (b.NUM_STARTS * n) + dec
    # train counts 4 forwards of work per counted env-step; at N=100 the
    # encoder amortizes to ~1.33 MFLOP and the decode token is ~0.31 MFLOP
    assert 6.0e6 < b.am_flops_per_env_step("train", n=100) < 7.0e6


def test_xla_cost_analysis_probe():
    b = _load_bench()
    f = jax.jit(lambda a: (a @ a).sum())
    x = jnp.ones((64, 64))
    out = b.xla_cost_analysis(f, x)
    assert out is None or out.get("flops", 0) >= 2 * 64 * 64 * 64 * 0.5
    # a function that cannot lower (bad args) must degrade, not raise
    assert b.xla_cost_analysis(f, object()) is None
