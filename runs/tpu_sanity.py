#!/usr/bin/env python
"""TPU large-batch validity sanity (regression guard for the batched-scatter
miscompile).

This image's TPU backend miscompiles vmapped dynamic-index scatters inside
`lax.scan` for batch >= ~1024: every tour contained repeated nodes while
batch <= 768 was correct (minimal repro: `x.at[i].set(True)` vs the one-hot
formulation). All env/model hot paths are now scatter-free; this script
re-verifies the actual decode paths on the real chip at the batch shapes
production uses. Run manually after touching env step/mask code:

    python runs/tpu_sanity.py
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params, rollout

FAILURES = []


def check(name, env, instances, actions):
    actions = np.asarray(actions)
    inst = jax.device_get(instances)
    bad = 0
    for i in range(actions.shape[0]):
        one = jax.tree_util.tree_map(lambda x: x[i], inst)
        try:
            env.check_solution_validity(one, actions[i])
        except AssertionError:
            bad += 1
    status = "OK" if bad == 0 else f"FAIL ({bad}/{actions.shape[0]} invalid)"
    print(f"{name}: {status}", flush=True)
    if bad:
        FAILURES.append(name)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)

    # TSP-50 greedy at the eval batch shapes that exposed the bug
    env = get_env("tsp", num_loc=50)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, key)
    for bs in (1024, 4096):
        inst = env.generate_batch(jax.random.fold_in(key, bs), bs)
        out = rollout(policy, params, env, inst, key,
                      DecodeSpec(kind="greedy", tanh_clipping=10.0))
        check(f"tsp50 greedy bs={bs}", env, inst, out.actions)

    # sampling (training decode) at train batch x2
    inst = env.generate_batch(jax.random.fold_in(key, 7), 1024)
    out = rollout(policy, params, env, inst, key,
                  DecodeSpec(kind="sampling", tanh_clipping=10.0))
    check("tsp50 sampling bs=1024", env, inst, out.actions)

    # POMO-style multistart: flat rows = B x S = 64*50 = 3200 > 1024
    inst = env.generate_batch(jax.random.fold_in(key, 9), 64)
    out = rollout(policy, params, env, inst, key,
                  DecodeSpec(kind="greedy", multistart=True, num_starts=50,
                             tanh_clipping=10.0))
    acts = np.asarray(out.actions).reshape(50 * 64, -1)
    check("tsp50 multistart 64x50", env,
          jax.tree_util.tree_map(
              lambda x: np.tile(np.asarray(x), (50,) + (1,) * (x.ndim - 1)),
              jax.device_get(inst)),
          acts)

    # CVRP-50 greedy at 1024 (capacity replay validity)
    env = get_env("cvrp", num_loc=50)
    policy = AttentionModelPolicy(env_name="cvrp")
    params = init_policy_params(policy, env, key)
    inst = env.generate_batch(jax.random.fold_in(key, 11), 1024)
    out = rollout(policy, params, env, inst, key,
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    check("cvrp50 greedy bs=1024", env, inst, out.actions)

    # env-only random rollout (pure env step path) at 2048
    env = get_env("tsp", num_loc=50)
    inst, st, acts, r = env.rollout_random(jax.random.fold_in(key, 13), 2048)
    check("tsp50 env-only random bs=2048", env, inst, acts)

    if FAILURES:
        print("FAILED:", FAILURES, flush=True)
        sys.exit(1)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
