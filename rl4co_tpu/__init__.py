"""rl4co-tpu: a TPU-native reinforcement-learning-for-combinatorial-optimization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of `ai4co/rl4co`
(reference layout documented in SURVEY.md):

- Environments are *pure per-instance functions* over `flax.struct` pytree states
  (reference: TensorDict-state TorchRL envs, `rl4co/envs/common/base.py:19-333`).
  The framework vmaps them; multistart and augmentation are extra vmap axes.
- Autoregressive decoding is a fixed-trip-count `lax.scan` with done-masking
  (reference: Python `while not done` loop, `rl4co/models/common/constructive/base.py:226-238`).
- Policies are Flax linen modules with a precomputed decoder cache
  (reference: `rl4co/models/zoo/am/decoder.py:201-228`).
- Training is a single jitted actor-learner step — on-device data generation,
  rollout, loss, and optimizer update fused under one `jax.jit`, sharded over a
  data-parallel mesh axis with psum gradient reduction
  (reference: Lightning DDP, `rl4co/utils/trainer.py:73-86`).
"""

__version__ = "0.1.0"

from rl4co_tpu.envs import get_env, ENV_REGISTRY  # noqa: F401
