"""RL utilities (reference `rl4co/models/rl/common/utils.py:4-48`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RewardScalerState:
    """Welford running statistics."""

    count: jax.Array  # f32
    mean: jax.Array
    m2: jax.Array

    @classmethod
    def init(cls):
        return cls(count=jnp.float32(1e-4), mean=jnp.float32(0.0), m2=jnp.float32(0.0))


def reward_scaler_update(state: RewardScalerState, x: jax.Array) -> RewardScalerState:
    """Batched Welford update (reference `utils.py:23-41`)."""
    batch_count = jnp.float32(x.size)
    batch_mean = x.mean()
    batch_var = x.var()
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m2 = (
        state.m2
        + batch_var * batch_count
        + jnp.square(delta) * state.count * batch_count / tot
    )
    return RewardScalerState(count=tot, mean=new_mean, m2=m2)


def reward_scaler_transform(
    state: RewardScalerState, x: jax.Array, scale_type: str = "scale"
) -> jax.Array:
    """'scale': divide by running std; 'norm': standardize
    (reference `utils.py:10-21`)."""
    var = state.m2 / state.count
    std = jnp.sqrt(var + 1e-8)
    if scale_type == "scale":
        return x / std
    if scale_type == "norm":
        return (x - state.mean) / std
    raise ValueError(scale_type)
