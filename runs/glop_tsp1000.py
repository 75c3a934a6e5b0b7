#!/usr/bin/env python
"""GLOP at TSP-1000 (VERDICT r3 #6): partition + SHPP re-solve on-chip.

Turns the long-context story from "compiles at N=1000" into "solves at
N=1000" through the repo's own hierarchical mechanism
(`rl4co_tpu/models/zoo/glop.py`; reference `rl4co/models/zoo/glop/policy.py:31-67`):

1. (optional) train a small AM *reviser* on SHPP-`seg_len` on-chip
   (`--reviser-epochs > 0`), the learned local policy of Ye et al. 2024;
2. construct tours by batched cheapest insertion (jittable, replaces the
   reference's external C++ `random_insertion` pybind pkg);
3. revise: `--rounds` passes of rotate→partition into `seg_len` segments→
   re-solve all B×H segments in one vmapped sub-solver call→accept
   improvements (all under one jit);
4. (optional) polish with the in-tree C++ 2-opt on the host
   (`--polish-iters`), reported as a separate row.

Every tour is validity-checked (permutation of N) host-side; gaps vs the
Fu et al. 2021 Table 2 Concorde anchor (TSP-1000 mean optimum 23.12).
Timing excludes compile (warmup reported separately — round-4 hygiene).

Usage (TPU):  python runs/glop_tsp1000.py --reviser-epochs 3
Writes runs/glop_tsp1000_eval.json (+ runs/glop_reviser.jsonl curve).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(ROOT, "runs")
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, "runs", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np

# Concorde mean optimal tour length, uniform [0,1]^2 (Fu et al. 2021
# Table 2 for 500/1000; Kool et al. 2019 Table 1 below that).
OPT_ANCHORS = {100: 7.76, 500: 16.55, 1000: 23.12}


def check_perm(tours: np.ndarray, n: int) -> None:
    """Every row must be a permutation of 0..n-1."""
    srt = np.sort(tours, axis=1)
    assert (srt == np.arange(n)[None, :]).all(), "tour is not a permutation"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-loc", type=int, default=1000)
    ap.add_argument("--eval-size", type=int, default=128)
    ap.add_argument("--eval-batch", type=int, default=32)
    ap.add_argument("--seg-len", type=int, default=25)
    ap.add_argument("--rounds", type=int, default=24)
    ap.add_argument("--reviser-epochs", type=int, default=0,
                    help="SHPP reviser training epochs (0 = cheapest-"
                         "insertion sub-solver only)")
    ap.add_argument("--reviser-train-size", type=int, default=64_000)
    ap.add_argument("--polish-iters", type=int, default=200,
                    help="host C++ 2-opt iterations (0 = skip)")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    n = args.num_loc
    assert n % args.seg_len == 0, "seg_len must divide num_loc"
    from rl4co_tpu.models.zoo.glop import GLOP

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # ---- optional on-chip SHPP reviser training ----
    reviser_policy = reviser_params = None
    reviser_hours = 0.0
    if args.reviser_epochs > 0:
        from rl4co_tpu.decoding import DecodeSpec
        from rl4co_tpu.envs import get_env
        from rl4co_tpu.loggers import JSONLLogger
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.reinforce import REINFORCE
        from rl4co_tpu.trainer import Trainer, TrainerConfig

        shpp = get_env("shpp", num_loc=args.seg_len)
        reviser_policy = AttentionModelPolicy(env_name="shpp")
        algo = REINFORCE(
            env=shpp, policy=reviser_policy, baseline="rollout",
            train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0,
                                  compute_dtype="bfloat16"),
        )
        cfg = TrainerConfig(epochs=args.reviser_epochs, batch_size=512,
                            train_data_size=args.reviser_train_size,
                            val_data_size=512, val_batch_size=512,
                            seed=1234, log_every=50)
        t0 = time.time()
        trainer = Trainer(algo, cfg,
                          logger=JSONLLogger(os.path.join(RUNS, "glop_reviser.jsonl")))
        state = trainer.fit()
        reviser_params = state.params
        reviser_hours = (time.time() - t0) / 3600
        print(f"reviser trained: {reviser_hours:.3f} h", flush=True)

    # ---- eval instances (CPU gen, ship once) ----
    from rl4co_tpu.envs import get_env

    env = get_env("tsp", num_loc=n)
    with jax.default_device(cpu):
        instances = env.generate_batch(jax.random.PRNGKey(1234), args.eval_size)
    locs_np = np.asarray(instances["locs"], dtype=np.float32)

    glop = GLOP(seg_len=args.seg_len, n_rounds=args.rounds,
                subsolver_policy=reviser_policy, subsolver_params=reviser_params)
    construct = GLOP(seg_len=args.seg_len, n_rounds=0)

    @jax.jit
    def solve_full(locs, key):
        return glop.solve(locs, key)

    @jax.jit
    def solve_construct(locs, key):
        return construct.solve(locs, key)

    bs = args.eval_batch
    rows = {}
    anchor = OPT_ANCHORS.get(n)
    all_tours = {}

    for name, fn in (("insertion", solve_construct), ("glop_revise", solve_full)):
        # warmup on the first batch, excluded from the timed region
        batch0 = jax.device_put(locs_np[:bs], dev)
        print(json.dumps({"warmup": name}), flush=True)
        t_w = time.perf_counter()
        np.asarray(fn(batch0, jax.random.PRNGKey(0))[0])
        warmup_s = time.perf_counter() - t_w
        print(json.dumps({"warmup_done": name, "s": round(warmup_s, 1)}),
              flush=True)

        tours, lengths = [], []
        t0 = time.perf_counter()
        for s in range(0, args.eval_size, bs):
            chunk = locs_np[s:s + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, chunk[:pad]], axis=0)
            t, ln = fn(jax.device_put(chunk, dev),
                       jax.random.fold_in(jax.random.PRNGKey(2), s))
            keep = bs - pad
            tours.append(np.asarray(t)[:keep])
            lengths.append(np.asarray(ln)[:keep])
            print(json.dumps({"progress": f"{name} {s + keep}/{args.eval_size}"}),
                  flush=True)
        dt = time.perf_counter() - t0
        tours = np.concatenate(tours)
        lengths = np.concatenate(lengths).astype(np.float64)
        check_perm(tours, n)
        # recompute lengths host-side from the checked tours (trust nothing)
        ordered = np.take_along_axis(locs_np, tours[..., None].repeat(2, -1), 1)
        closed = np.concatenate([ordered, ordered[:, :1]], axis=1)
        host_len = np.linalg.norm(np.diff(closed, axis=1), axis=-1).sum(1)
        assert np.allclose(host_len, lengths, atol=2e-2), "length mismatch"
        row = {
            "mean_cost": float(host_len.mean()),
            "n_instances": int(args.eval_size),
            "instances_per_s": args.eval_size / dt,
            "warmup_s": warmup_s,
            "validity_checked": True,
        }
        if anchor:
            row["gap_pct"] = 100.0 * (row["mean_cost"] - anchor) / anchor
            row["optimum_anchor"] = anchor
        rows[name] = row
        all_tours[name] = tours
        print(json.dumps({"eval": name, **{k: round(v, 4) if isinstance(v, float)
                                           else v for k, v in row.items()}}),
              flush=True)

    # ---- host C++ 2-opt polish of the revised tours ----
    if args.polish_iters > 0:
        from rl4co_tpu.native import batched_two_opt_nl

        t0 = time.perf_counter()
        polished = batched_two_opt_nl(locs_np, all_tours["glop_revise"],
                                      max_passes=args.polish_iters)
        dt = time.perf_counter() - t0
        check_perm(polished, n)
        ordered = np.take_along_axis(locs_np, polished[..., None].repeat(2, -1), 1)
        closed = np.concatenate([ordered, ordered[:, :1]], axis=1)
        host_len = np.linalg.norm(np.diff(closed, axis=1), axis=-1).sum(1)
        row = {
            "mean_cost": float(host_len.mean()),
            "n_instances": int(args.eval_size),
            "instances_per_s": args.eval_size / dt,
            "validity_checked": True,
        }
        if anchor:
            row["gap_pct"] = 100.0 * (row["mean_cost"] - anchor) / anchor
            row["optimum_anchor"] = anchor
        rows["glop_revise_2opt"] = row
        print(json.dumps({"eval": "glop_revise_2opt",
                          **{k: round(v, 4) if isinstance(v, float) else v
                             for k, v in row.items()}}), flush=True)

    glop_improves = rows["glop_revise"]["mean_cost"] < rows["insertion"]["mean_cost"]
    out = {
        "preset": "glop_tsp1000",
        "recipe": {"env": "tsp", "num_loc": n, "seg_len": args.seg_len,
                   "rounds": args.rounds, "eval_size": args.eval_size,
                   "reviser_epochs": args.reviser_epochs,
                   "polish_iters": args.polish_iters,
                   "subsolver": ("learned_shpp_reviser"
                                 if reviser_policy is not None
                                 else "cheapest_insertion")},
        "reviser_train_hours": round(reviser_hours, 3),
        "glop_revision_improves_construction": bool(glop_improves),
        "device": str(jax.devices()[0]),
        "eval": rows,
        "cmd": "python " + " ".join(sys.argv),
        "argv": sys.argv,
    }
    name = "glop_tsp1000" + (f"_{args.tag}" if args.tag else "")
    path = os.path.join(RUNS, f"{name}_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
