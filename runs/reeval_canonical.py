#!/usr/bin/env python
"""Re-evaluate committed checkpoints on the canonical stored test sets.

VERDICT r4 #4: every prior quality artifact evaluated on self-generated
instances; the reference convention is fixed stored npz test sets (test
seed 1234, 10k — `configs/env/tsp.yaml:8-10`). This re-runs the cheap
evals from the round-4 checkpoints on the canonical files (committed under
`data/`, bit-identical to the reference's numpy streams) and records
dataset provenance, letting gaps be compared instance-for-instance.

Usage (TPU):
    python runs/reeval_canonical.py --preset am_tsp50
    python runs/reeval_canonical.py --preset pomo_cvrp50
Writes runs/<preset>_canonical_reeval.json.
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
os.environ.setdefault("RL4CO_EVAL_BATCH_CEIL", "32768")

import jax  # noqa: E402

from train_quality import (  # noqa: E402  (runs/ is the script dir)
    PRESETS, build_preset, final_eval_table,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True, choices=sorted(PRESETS))
    ap.add_argument("--eval-size", type=int, default=10_000)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default runs/ckpt_<preset>/best, "
                         "falling back to /last)")
    ap.add_argument("--which", default="best", choices=["best", "last"])
    args = ap.parse_args(argv)

    p = dict(PRESETS[args.preset])
    env, algo = build_preset(p)

    ckpt = args.ckpt
    if ckpt is None:
        ckpt = os.path.join(RUNS, f"ckpt_{args.preset}", args.which)
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(RUNS, f"ckpt_{args.preset}", "last")
    assert os.path.isdir(ckpt), f"no checkpoint at {ckpt}"

    # template-free raw restore (eval only needs params; the host-state
    # shapes — e.g. the rollout baseline's eval_rewards length — belong to
    # the training run), then ship the params over once
    from rl4co_tpu.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(ckpt)
    params = jax.device_put(restored["state"]["params"], jax.devices()[0])
    epoch = int(restored["epoch"])
    print(json.dumps({"restored": ckpt, "epoch": epoch}), flush=True)

    t0 = time.time()
    table, provenance = final_eval_table(p, algo, env, params, args.eval_size)
    out = {
        "preset": args.preset,
        "recipe": {k: v for k, v in p.items()
                   if isinstance(v, (int, float, str, tuple))
                   and not isinstance(v, bool)},
        "checkpoint": os.path.relpath(ckpt, ROOT),
        "checkpoint_epoch": epoch,
        "eval": table,
        "eval_datasets": provenance,
        "eval_hours": round((time.time() - t0) / 3600, 4),
        "device": str(jax.devices()[0]),
        "compare_to": f"runs/{args.preset}_eval.json (self-generated "
                      "instances, same protocol)",
        "cmd": "python " + " ".join(sys.argv),
    }
    path = os.path.join(RUNS, f"{args.preset}_canonical_reeval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
