"""Data-parallel training over a device mesh (TPU-native).

The reference gets multi-GPU through Lightning DDP implicitly
(`rl4co/utils/trainer.py:73-86`); here the full jitted REINFORCE train step
is GSPMD-sharded over a `jax.sharding.Mesh` — the batch splits across the
`dp` axis, gradients psum over ICI automatically.

Run on CPU with simulated devices:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/12_multichip_dp.py

On a real pod slice, start one process per host with
`python -m rl4co_tpu.train --distributed --dp <n>` instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.parallel.mesh import make_mesh, replicate
from rl4co_tpu.rl.reinforce import REINFORCE


def main():
    n = jax.device_count()
    mesh = make_mesh(dp=n)
    print(f"mesh: dp={n} over {[str(d) for d in jax.devices()][:4]}...")

    env = get_env("tsp", num_loc=10)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=64,
                                  num_encoder_layers=2)
    algo = REINFORCE(env=env, policy=policy, baseline="rollout",
                     train_spec=DecodeSpec(kind="sampling",
                                           tanh_clipping=10.0))
    state = algo.init(jax.random.PRNGKey(0))
    state = replicate(state, mesh)                      # params replicated
    step = algo.make_train_step(batch_size=16 * n, mesh=mesh)
    for it in range(3):
        state, metrics = step(state, jax.random.fold_in(jax.random.PRNGKey(1), it))
        print(f"step {it}: loss {float(metrics['loss']):+.4f} "
              f"reward {float(metrics['reward']):+.4f}")
    # the same Trainer(algo, cfg, mesh=mesh) runs whole epochs this way


if __name__ == "__main__":
    main()
