"""Statistical tests for the location-sampler library (SURVEY §2.1;
reference `envs/common/utils.py:34-98` + `distribution_utils.py`).

BASELINE.md determinism note: torch and jax RNG streams cannot match
bit-for-bit, so the reference distributions are validated *statistically*
(moments / support / clustering structure) plus exact determinism of the
jax streams themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl4co_tpu.envs.distributions import (
    Cluster,
    GaussianMixture,
    MixDistribution,
    Mixed,
    get_sampler,
)

KEY = jax.random.PRNGKey(0)
SHAPE = (64, 100, 2)


def test_get_sampler_registry_and_errors():
    assert type(get_sampler("uniform")).__name__ == "Uniform"
    assert type(get_sampler("gaussian")).__name__ == "Normal"
    # scalar -> constant sampler (reference get_sampler float semantics)
    const = get_sampler(0.3)
    assert np.allclose(np.asarray(const.sample(KEY, (4,))), 0.3)
    with pytest.raises(ValueError, match="Invalid distribution"):
        get_sampler("nope")


def test_uniform_moments_and_support():
    x = np.asarray(get_sampler("uniform").sample(KEY, SHAPE))
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert abs(x.mean() - 0.5) < 0.01
    assert abs(x.var() - 1 / 12) < 0.005


def test_normal_exponential_poisson_moments():
    x = np.asarray(get_sampler("normal", mean=0.5, std=0.2).sample(KEY, SHAPE))
    assert abs(x.mean() - 0.5) < 0.01 and abs(x.std() - 0.2) < 0.01
    e = np.asarray(get_sampler("exponential", rate=2.0).sample(KEY, SHAPE))
    assert (e >= 0).all() and abs(e.mean() - 0.5) < 0.02
    p = np.asarray(get_sampler("poisson", rate=3.0).sample(KEY, SHAPE))
    assert abs(p.mean() - 3.0) < 0.05 and np.allclose(p, np.round(p))


def _nn_dist_mean(x):
    """Mean nearest-neighbor distance per instance (clustering statistic)."""
    d = np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
    d += np.eye(x.shape[1])[None] * 1e9
    return d.min(-1).mean()


def test_cluster_is_clustered():
    """Clustered points have a markedly smaller nearest-neighbor distance
    than uniform at the same density, and stay in [0, 1]^2."""
    xc = np.asarray(Cluster(n_cluster=3, std=0.07).sample(KEY, SHAPE))
    xu = np.asarray(get_sampler("uniform").sample(KEY, SHAPE))
    assert 0.0 <= xc.min() and xc.max() <= 1.0
    assert _nn_dist_mean(xc) < 0.7 * _nn_dist_mean(xu)


def test_mixed_is_between_uniform_and_cluster():
    xm = np.asarray(Mixed(n_cluster_mix=1, std=0.07).sample(KEY, SHAPE))
    xc = np.asarray(Cluster(1, 0.07).sample(KEY, SHAPE))
    xu = np.asarray(get_sampler("uniform").sample(KEY, SHAPE))
    assert _nn_dist_mean(xc) < _nn_dist_mean(xm) < _nn_dist_mean(xu)


def test_gaussian_mixture_normalized_and_modes():
    x = np.asarray(GaussianMixture(num_modes=3, cdist=10.0).sample(KEY, SHAPE))
    # min-max normalized per instance
    assert np.allclose(x.min(axis=-2), 0.0, atol=1e-5)
    assert np.allclose(x.max(axis=-2), 1.0, atol=1e-5)
    # degenerate num_modes=0 -> uniform
    x0 = np.asarray(GaussianMixture(num_modes=0).sample(KEY, SHAPE))
    assert abs(x0.mean() - 0.5) < 0.01


def test_mix_distribution_switches_variants():
    """Batch-level mixture picks different variants across keys."""
    s = MixDistribution()
    stats = {
        round(_nn_dist_mean(np.asarray(s.sample(jax.random.PRNGKey(i),
                                                (8, 100, 2)))), 4)
        for i in range(8)
    }
    assert len(stats) >= 2  # not all draws from one variant


def test_samplers_deterministic_and_jittable():
    for name in ("uniform", "normal", "cluster", "mixed",
                 "gaussian_mixture", "mix_distribution"):
        s = get_sampler(name)
        a = np.asarray(s.sample(KEY, (4, 10, 2)))
        b = np.asarray(s.sample(KEY, (4, 10, 2)))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(jax.jit(lambda k: s.sample(k, (4, 10, 2)))(KEY))
        np.testing.assert_allclose(a, c, rtol=1e-6)


def test_cvrp_demand_distribution_matches_reference():
    """CVRP demands must be integers 1..9 (÷capacity): the reference's
    Uniform[min-1, max-1) → floor → +1 pipeline with defaults (1, 10)
    (`cvrp/generator.py:96-98,126-127`, Kool et al. 2019). Rounds 1-3
    sampled 1..10 — ~10% extra total demand that biased every gap measured
    against the Kool/LKH anchors."""
    from rl4co_tpu.envs import get_env

    env = get_env("cvrp", num_loc=50)
    inst = env.generate_batch(jax.random.PRNGKey(0), 512)
    d = np.asarray(inst["demand"]) * 40.0  # n=50 -> capacity 40
    vals = np.unique(np.round(d).astype(int))
    assert vals.min() >= 1 and vals.max() <= 9, vals
    assert abs(d.mean() - 5.0) < 0.1
    np.testing.assert_allclose(d, np.round(d), atol=1e-4)  # integers
