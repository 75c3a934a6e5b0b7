"""Evaluate a policy on TSPLIB / CVRPLIB benchmark files.

Reference counterpart: `examples/datasets/1-test-on-tsplib.ipynb` and
`2-test-on-cvrplib.ipynb` (which require the external tsplib95/vrplib
packages; the parsers here are in-tree — `rl4co_tpu/data/tsplib.py`).

Point --tsp-dir / --vrp-dir at directories of real benchmark files; without
them the script writes two tiny instances so it runs self-contained.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import tempfile

import jax
import numpy as np

from rl4co_tpu.data.tsplib import (
    read_cvrplib_solution,
    read_tsplib,
    read_tsplib_tour,
    tour_cost,
    tsplib_to_tsp_batch,
    vrplib_to_cvrp_batch,
)
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models import AttentionModelPolicy, rollout
from rl4co_tpu.models.policies.constructive import init_policy_params

DEMO_TSP = """NAME: demo16\nTYPE: TSP\nDIMENSION: 16\nEDGE_WEIGHT_TYPE: EUC_2D\nNODE_COORD_SECTION\n""" + "\n".join(
    f"{i + 1} {100 * (i % 4)} {100 * (i // 4)}" for i in range(16)
) + "\nEOF\n"

DEMO_VRP = """NAME: demo-vrp\nTYPE: CVRP\nDIMENSION: 9\nEDGE_WEIGHT_TYPE: EUC_2D\nCAPACITY: 30\nNODE_COORD_SECTION\n""" + "\n".join(
    f"{i + 1} {50 * (i % 3)} {50 * (i // 3)}" for i in range(9)
) + "\nDEMAND_SECTION\n1 0\n" + "\n".join(
    f"{i + 1} {4 + i}" for i in range(1, 9)
) + "\nDEPOT_SECTION\n1\n-1\nEOF\n"


def eval_tsp_file(path, policy, num_samples=16):
    problem = read_tsplib(path)
    env, batch = tsplib_to_tsp_batch(problem)   # normalized to [0,1]^2
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    out = rollout(policy, params, env, batch, jax.random.PRNGKey(1),
                  DecodeSpec(kind="sampling", num_samples=num_samples,
                             select_best=True, tanh_clipping=10.0))
    tour = np.asarray(out.actions[0])[: problem["dimension"]]
    cost = tour_cost(problem, tour)             # canonical TSPLIB arithmetic
    line = f"{problem['name']:<14} N={problem['dimension']:<5} cost={cost:<10.0f}"
    opt_file = path.replace(".tsp", ".opt.tour")
    if os.path.exists(opt_file):
        bks = tour_cost(problem, read_tsplib_tour(opt_file))
        line += f" BKS={bks:<10.0f} gap={(cost - bks) / bks:.2%}"
    print(line)


def eval_vrp_file(path, policy, num_samples=16):
    problem = read_tsplib(path)
    env, batch = vrplib_to_cvrp_batch(problem)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    out = rollout(policy, params, env, batch, jax.random.PRNGKey(1),
                  DecodeSpec(kind="sampling", num_samples=num_samples,
                             select_best=True, tanh_clipping=10.0))
    inst0 = jax.tree_util.tree_map(lambda x: x[0], batch)
    env.check_solution_validity(inst0, np.asarray(out.actions)[0])
    line = (f"{problem['name']:<14} N={problem['dimension']:<5} "
            f"normalized cost={-float(out.reward[0]):.4f}")
    sol_file = path.replace(".vrp", ".sol")
    if os.path.exists(sol_file):
        line += f" BKS cost={read_cvrplib_solution(sol_file)['cost']}"
    print(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsp-dir", default=None)
    ap.add_argument("--vrp-dir", default=None)
    args = ap.parse_args()

    tsp_files = sorted(glob.glob(os.path.join(args.tsp_dir, "*.tsp"))) if args.tsp_dir else []
    vrp_files = sorted(glob.glob(os.path.join(args.vrp_dir, "*.vrp"))) if args.vrp_dir else []
    if not tsp_files and not vrp_files:
        d = tempfile.mkdtemp()
        with open(os.path.join(d, "demo16.tsp"), "w") as f:
            f.write(DEMO_TSP)
        with open(os.path.join(d, "demo-vrp.vrp"), "w") as f:
            f.write(DEMO_VRP)
        tsp_files = [os.path.join(d, "demo16.tsp")]
        vrp_files = [os.path.join(d, "demo-vrp.vrp")]

    tsp_policy = AttentionModelPolicy(env_name="tsp")
    for p in tsp_files:
        eval_tsp_file(p, tsp_policy)
    vrp_policy = AttentionModelPolicy(env_name="cvrp")
    for p in vrp_files:
        eval_vrp_file(p, vrp_policy)


if __name__ == "__main__":
    main()
