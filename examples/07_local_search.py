"""Native C++ local search: polish model tours with 2-opt / CVRP search.

Reference counterpart: `examples/advanced/3-local-search.ipynb`
(numba 2-opt `tsp/local_search.py:46-81`, HGS-CVRP via ctypes
`cvrp/local_search.py:22-25`). Here both kernels are in-tree C++
(`rl4co_tpu/native/local_search.cpp`), built on first use with g++.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.envs.routing.local_search import (
    cvrp_local_search,
    tsp_local_search,
)
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.constructive import init_policy_params


def main(num_loc=20, batch=32):
    # ---- TSP: greedy tours -> batched 2-opt ----
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    test = env.generate_batch(jax.random.PRNGKey(1), batch)
    out = rollout(policy, params, env, test, jax.random.PRNGKey(2),
                  DecodeSpec(kind="greedy", tanh_clipping=10.0))
    locs = np.asarray(test["locs"])
    tours = np.asarray(out.actions, dtype=np.int32)
    improved = tsp_local_search(locs, tours, max_iterations=1000)

    def length(t):
        seq = np.take_along_axis(locs, t[..., None], axis=-2)
        return np.linalg.norm(seq - np.roll(seq, -1, axis=-2), axis=-1).sum(-1)

    print(f"TSP-{num_loc}: model {length(tours).mean():.4f} -> "
          f"2-opt {length(improved).mean():.4f}")

    # ---- CVRP: sampled solutions -> native neighborhood search ----
    venv = get_env("cvrp", num_loc=num_loc)
    vpolicy = AttentionModelPolicy(env_name="cvrp")
    vparams = init_policy_params(vpolicy, venv, jax.random.PRNGKey(0))
    vtest = venv.generate_batch(jax.random.PRNGKey(3), batch)
    vout = rollout(vpolicy, vparams, venv, vtest, jax.random.PRNGKey(4),
                   DecodeSpec(kind="sampling", tanh_clipping=10.0))
    locs_wd = np.concatenate(
        [np.asarray(vtest["depot"])[:, None, :], np.asarray(vtest["locs"])],
        axis=1)
    demand_wd = np.concatenate(
        [np.zeros((batch, 1), np.float32), np.asarray(vtest["demand"])],
        axis=1)
    acts = np.asarray(vout.actions, dtype=np.int32)
    polished = cvrp_local_search(locs_wd, demand_wd, acts, capacity=1.0)

    def vrp_cost(a):
        seq = np.take_along_axis(
            locs_wd, a[..., None].astype(np.int64), axis=-2)
        # route cost incl. start/end at depot (action sequences contain 0s)
        first = np.linalg.norm(seq[:, 0] - locs_wd[:, 0], axis=-1)
        last = np.linalg.norm(seq[:, -1] - locs_wd[:, 0], axis=-1)
        mid = np.linalg.norm(seq[:, 1:] - seq[:, :-1], axis=-1).sum(-1)
        return first + mid + last

    print(f"CVRP-{num_loc}: model {vrp_cost(acts).mean():.4f} -> "
          f"native LS {vrp_cost(polished).mean():.4f}")


if __name__ == "__main__":
    main()
