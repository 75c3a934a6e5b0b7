#!/usr/bin/env python
"""A/B: fused vs unfused rollout-baseline train step at the bench config
(TSP-100, AM, batch 512, bf16, rollout baseline). Prints one JSON line per
arm; writes runs/ab_fused_train.json."""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, "runs", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.rl.reinforce import REINFORCE

BATCH, NUM_LOC, CHUNK, DISPATCHES = 512, 100, 20, 3


def arm(fused: bool) -> float:
    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    algo = REINFORCE(
        env=env, policy=policy, baseline="rollout",
        train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0,
                              compute_dtype="bfloat16"),
        fused_rollout_baseline=fused,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = algo.init(jax.random.PRNGKey(0))
    state = jax.device_put(state, jax.devices()[0])
    step = algo.make_train_step(BATCH, chunk=CHUNK)
    key = jax.random.PRNGKey(3)
    t_c = time.perf_counter()
    state, m = step(state, key)
    np.asarray(m["loss"])
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(DISPATCHES):
        state, m = step(state, key)
        np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    rate = BATCH * NUM_LOC * CHUNK * DISPATCHES / dt
    print(json.dumps({"fused": fused, "env_steps_per_s": round(rate, 1),
                      "ms_per_step": round(1e3 * dt / (CHUNK * DISPATCHES), 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return rate


def main():
    r_unfused = arm(False)
    r_fused = arm(True)
    out = {"unfused": r_unfused, "fused": r_fused,
           "speedup": round(r_fused / r_unfused, 3),
           "config": {"batch": BATCH, "num_loc": NUM_LOC, "chunk": CHUNK},
           "argv": sys.argv, "cmd": "python " + " ".join(sys.argv)}
    with open(os.path.join(ROOT, "runs", "ab_fused_train.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
