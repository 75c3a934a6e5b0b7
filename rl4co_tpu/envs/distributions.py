"""Location samplers / distribution library.

TPU-native re-design of `rl4co/envs/common/utils.py:34-98` (`get_sampler`)
and `rl4co/envs/common/distribution_utils.py` (Cluster / Mixed /
Gaussian_Mixture / batch-level mixtures, used for cross-distribution
generalization studies). All samplers are stateless functions
``sample(key, shape) -> points in [0, 1]^d`` built on `jax.random`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Uniform:
    low: float = 0.0
    high: float = 1.0

    def sample(self, key, shape):
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)


@dataclasses.dataclass(frozen=True)
class Normal:
    mean: float = 0.5
    std: float = 0.2

    def sample(self, key, shape):
        return self.mean + self.std * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class Exponential:
    rate: float = 1.0

    def sample(self, key, shape):
        return jax.random.exponential(key, shape) / self.rate


@dataclasses.dataclass(frozen=True)
class Poisson:
    rate: float = 1.0

    def sample(self, key, shape):
        return jax.random.poisson(key, self.rate, shape).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class Cluster:
    """Gaussian clusters (Bi et al. 2022; reference `distribution_utils.py:6-50`).

    Cluster centers ~ U(0.2, 0.8); points ~ N(center, 0.07); clipped to [0,1].
    """

    n_cluster: int = 3
    std: float = 0.07

    def sample(self, key, shape):
        *lead, n, d = shape
        kc, kp, ka = jax.random.split(key, 3)
        centers = jax.random.uniform(
            kc, (*lead, self.n_cluster, d), minval=0.2, maxval=0.8
        )
        assign = jax.random.randint(ka, (*lead, n), 0, self.n_cluster)
        base = jnp.take_along_axis(
            centers, assign[..., None].repeat(d, -1), axis=-2
        )
        pts = base + self.std * jax.random.normal(kp, (*lead, n, d))
        return jnp.clip(pts, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class Mixed:
    """50% uniform + 50% clustered (reference `distribution_utils.py:53-107`)."""

    n_cluster_mix: int = 1
    std: float = 0.07

    def sample(self, key, shape):
        *lead, n, d = shape
        ku, kc, km = jax.random.split(key, 3)
        uniform_pts = jax.random.uniform(ku, shape)
        cluster_pts = Cluster(self.n_cluster_mix, self.std).sample(kc, shape)
        take_cluster = jax.random.bernoulli(km, 0.5, (*lead, n, 1))
        return jnp.where(take_cluster, cluster_pts, uniform_pts)


@dataclasses.dataclass(frozen=True)
class GaussianMixture:
    """Zhou et al. 2023 (reference `distribution_utils.py:110-205`):
    ``num_modes`` centers ~ U(0, cdist), points ~ N(center, 1), min-max
    normalized to [0, 1]. ``num_modes=0`` degenerates to uniform."""

    num_modes: int = 3
    cdist: float = 10.0

    def sample(self, key, shape):
        if self.num_modes == 0:
            return jax.random.uniform(key, shape)
        *lead, n, d = shape
        kc, kp, ka = jax.random.split(key, 3)
        centers = jax.random.uniform(
            kc, (*lead, self.num_modes, d), minval=0.0, maxval=self.cdist
        )
        assign = jax.random.randint(ka, (*lead, n), 0, self.num_modes)
        base = jnp.take_along_axis(centers, assign[..., None].repeat(d, -1), axis=-2)
        pts = base + jax.random.normal(kp, (*lead, n, d))
        lo = pts.min(axis=-2, keepdims=True)
        hi = pts.max(axis=-2, keepdims=True)
        return (pts - lo) / (hi - lo + 1e-9)


@dataclasses.dataclass(frozen=True)
class MixDistribution:
    """Batch-level mixture of Uniform / Cluster / Mixed (reference
    `distribution_utils.py:208-247`). The variant is chosen per call."""

    n_cluster: int = 3
    n_cluster_mix: int = 1

    def sample(self, key, shape):
        kv, ks = jax.random.split(key)
        variant = jax.random.randint(kv, (), 0, 3)
        return jax.lax.switch(
            variant,
            [
                lambda k: Uniform().sample(k, shape),
                lambda k: Cluster(self.n_cluster).sample(k, shape),
                lambda k: Mixed(self.n_cluster_mix).sample(k, shape),
            ],
            ks,
        )


SAMPLERS = {
    "uniform": Uniform,
    "normal": Normal,
    "gaussian": Normal,
    "exponential": Exponential,
    "poisson": Poisson,
    "cluster": Cluster,
    "mixed": Mixed,
    "gaussian_mixture": GaussianMixture,
    "mix_distribution": MixDistribution,
}


def get_sampler(distribution: str | float | Callable = "uniform", **kwargs):
    """Name-based factory (reference `envs/common/utils.py:34-98`)."""
    if isinstance(distribution, (int, float)):
        return Uniform(low=float(distribution), high=float(distribution))
    if callable(distribution) and not isinstance(distribution, str):
        return distribution
    cls = SAMPLERS.get(distribution)
    if cls is None:
        raise ValueError(
            f"Invalid distribution {distribution}. Available: {sorted(SAMPLERS)}"
        )
    return cls(**kwargs)
