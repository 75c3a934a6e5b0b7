#!/usr/bin/env python
"""Quality-parity training runs (the BASELINE.md north-star quality axis).

Reproduces the reference training recipes on TPU and records
validity-checked optimality gaps against known optima:

- ``am_tsp50``   — AM + REINFORCE(rollout baseline) on TSP-50
  (reference `configs/experiment/base.yaml:34-48`: batch 512,
  1,280,000 samples/epoch, 100 epochs, Adam lr 1e-4, seed 1234).
- ``pomo_cvrp50`` — POMO on CVRP-50
  (reference `configs/experiment/routing/pomo.yaml`: batch 64,
  160,000 samples/epoch, 100 epochs, AdamW lr 1e-4 wd 1e-6,
  MultiStepLR milestones [80, 95] gamma 0.1).
- ``am_tsp20``   — same recipe as am_tsp50 at N=20 (fast sanity run).
- ``amxl_tsp100`` — AM-XL on TSP-100 (BASELINE.json config; reference
  `configs/experiment/routing/am-xl.yaml:22-27`: 6 encoder layers,
  instance norm, batch 2048, AdamW wd 1e-6).

Usage (TPU):
    python runs/train_quality.py --preset am_tsp50 --epochs 100
Outputs:
    runs/<preset>.jsonl        per-epoch training/val curve
    runs/<preset>_eval.json    final eval-protocol table with optimality
                               gaps; every eval batch's best actions are
                               asserted valid via env.check_solution_validity
    runs/ckpt_<preset>/        best + last checkpoints (not committed)

Optimality anchors (average optimal tour cost on uniform [0,1]^2 instances,
Kool et al. 2019 "Attention, Learn to Solve Routing Problems!" Table 1 —
Concorde for TSP, LKH3 for CVRP):
    TSP-20 3.84, TSP-50 5.70, TSP-100 7.76, CVRP-50 10.38
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

# Persistent compilation cache: TSP-50-scale train steps take minutes to
# compile on the TPU; cache hits make reruns/resumes start instantly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(ROOT, "runs", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
# Bigger eval dispatches on the tunnel: 32k trajectories/batch cuts the
# 10k-instance multistart+aug eval from ~500 round trips to ~125.
os.environ.setdefault("RL4CO_EVAL_BATCH_CEIL", "32768")

import jax  # noqa: E402

OPTIMA = {
    "tsp": {20: 3.84, 50: 5.70, 100: 7.76},
    "cvrp": {50: 10.38},
    # Kool et al. 2019 appendix (Gurobi) — OP-20 optimal prize, PCTSP-20
    # optimal cost; anchors for the mixed-vs-single-env table (VERDICT r2 §7)
    "op": {20: 5.27},
    "pctsp": {20: 3.13},
}
# envs whose reward is a maximized prize (gap = how far below the optimum)
MAXIMIZE = {"op"}

PRESETS = {
    "am_tsp50": dict(env="tsp", num_loc=50, model="am", batch_size=512,
                     train_data_size=1_280_000, epochs=100, lr=1e-4,
                     val_batch_size=1024,
                     eval_methods=("greedy", "augment_dihedral_8")),
    "am_tsp20": dict(env="tsp", num_loc=20, model="am", batch_size=512,
                     train_data_size=1_280_000, epochs=100, lr=1e-4,
                     val_batch_size=1024,
                     eval_methods=("greedy", "augment_dihedral_8")),
    "pomo_cvrp50": dict(env="cvrp", num_loc=50, model="pomo", batch_size=64,
                        train_data_size=160_000, epochs=100, lr=1e-4,
                        weight_decay=1e-6, milestones=(80, 95),
                        val_batch_size=128,
                        eval_methods=("multistart_greedy",
                                      "multistart_greedy_augment_dihedral_8")),
    "pomo_tsp50": dict(env="tsp", num_loc=50, model="pomo", batch_size=64,
                       train_data_size=160_000, epochs=100, lr=1e-4,
                       weight_decay=1e-6, milestones=(80, 95),
                       val_batch_size=128,
                       eval_methods=("multistart_greedy",
                                     "multistart_greedy_augment_dihedral_8")),
    # The BASELINE.json north-star config: plain AM + REINFORCE(rollout) on
    # TSP-100, exact reference recipe (`configs/experiment/base.yaml:34-48`
    # with env.num_loc=100: batch 512, 1.28M samples/epoch, Adam lr 1e-4).
    "am_tsp100": dict(env="tsp", num_loc=100, model="am", batch_size=512,
                      train_data_size=1_280_000, epochs=100, lr=1e-4,
                      val_batch_size=1024,
                      eval_methods=("greedy", "augment_dihedral_8")),
    "amxl_tsp100": dict(env="tsp", num_loc=100, model="am-xl", batch_size=2048,
                        train_data_size=1_280_000, epochs=100, lr=1e-4,
                        weight_decay=1e-6, milestones=(480, 495),
                        val_batch_size=1024,
                        eval_methods=("greedy", "augment_dihedral_8")),
    # BASELINE.json mixed-env config: one policy across OP + PCTSP with
    # swapped embeddings, interleaved batches
    "mixed_op_pctsp": dict(env="op,pctsp", num_loc=20, model="am-multienv",
                           batch_size=512, train_data_size=640_000, epochs=100,
                           lr=1e-4, val_batch_size=512,
                           eval_methods=("greedy",)),
    # Remedy experiment for the r4 multi-task-interference finding
    # (VERDICT r4 #5): same mixed config, MVMoE-style MoE trunk + pointer
    # (reference `zoo/mvmoe/model.py:14-74`) so capacity routes per-task.
    "mixed_op_pctsp_moe": dict(env="op,pctsp", num_loc=20,
                               model="am-multienv-moe", batch_size=512,
                               train_data_size=640_000, epochs=100, lr=1e-4,
                               val_batch_size=512, eval_methods=("greedy",)),
    # Single-env controls for the mixed run (VERDICT r2 §7): same per-env
    # sample budget — the mixed preset splits 640k samples/epoch across two
    # envs, so each control trains on 320k/epoch of its one env.
    "op20_single": dict(env="op", num_loc=20, model="am", batch_size=512,
                        train_data_size=320_000, epochs=100, lr=1e-4,
                        val_batch_size=512, eval_methods=("greedy",)),
    "pctsp20_single": dict(env="pctsp", num_loc=20, model="am",
                           batch_size=512, train_data_size=320_000, epochs=100,
                           lr=1e-4, val_batch_size=512,
                           eval_methods=("greedy",)),
}


def build_preset(p: dict, precision: str = "bf16-mixed"):
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.utils.optim import get_lr_schedule

    env = (get_env(p["env"], num_loc=p["num_loc"])
           if "," not in p["env"] else None)
    compute_dtype = "bfloat16" if precision == "bf16-mixed" else None
    train_spec = DecodeSpec(kind="sampling", tanh_clipping=10.0,
                            compute_dtype=compute_dtype)
    steps_per_epoch = max(1, p["train_data_size"] // p["batch_size"])
    schedule = None
    if p.get("milestones"):
        schedule = get_lr_schedule("multistep", p["lr"],
                                   milestones=p["milestones"], gamma=0.1,
                                   steps_per_epoch=steps_per_epoch)
    opt_name = "adamw" if p.get("weight_decay") else "adam"

    if p["model"] in ("am", "am-xl"):
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.reinforce import REINFORCE

        pkw = {}
        if p["model"] == "am-xl":
            pkw = dict(num_encoder_layers=6, normalization="instance")
        policy = AttentionModelPolicy(env_name=env.name, **pkw)
        algo = REINFORCE(env=env, policy=policy, baseline="rollout",
                         train_spec=train_spec, lr=p["lr"],
                         optimizer=opt_name, lr_schedule=schedule)
    elif p["model"] == "pomo":
        from rl4co_tpu.models.zoo.pomo import POMO, make_pomo_policy

        policy = make_pomo_policy(env.name)
        algo = POMO(env=env, policy=policy, train_spec=train_spec, lr=p["lr"],
                    optimizer=opt_name, lr_schedule=schedule)
    elif p["model"] in ("am-multienv", "am-multienv-moe"):
        from rl4co_tpu.rl.multi_env import MultiEnvREINFORCE

        envs = {n: get_env(n, num_loc=p["num_loc"])
                for n in p["env"].split(",")}
        policy = None
        if p["model"] == "am-multienv-moe":
            from rl4co_tpu.models.policies.multi_env import MultiEnvMoEPolicy

            policy = MultiEnvMoEPolicy(
                env_name=next(iter(envs)), env_names=tuple(envs),
                num_experts=4, moe_topk=2,
            )
        algo = MultiEnvREINFORCE(envs=envs, policy=policy,
                                 train_spec=train_spec, lr=p["lr"])
        env = algo.env
    else:
        raise ValueError(p["model"])
    return env, algo


def final_eval_table(p: dict, algo, env, params, eval_size: int):
    """Reference-protocol final eval, validity-checked, canonical-dataset
    aware (VERDICT r4 #4). Returns (table, dataset_provenance).

    Test convention: seed 1234, 10k instances (reference
    `configs/env/tsp.yaml:8-10`, `data/generate_data.py:214+`); mixed-env
    presets evaluate every env through its own embedding view
    (policy.for_env); single-env presets evaluate the one env.
    """
    import jax

    from rl4co_tpu.tasks.eval import evaluate_policy

    eval_envs = (
        {n: e for n, e in algo.envs.items()} if hasattr(algo, "envs")
        else {p["env"]: env}
    )
    table = {}
    dataset_provenance = {}
    for env_name, e in eval_envs.items():
        # Prefer the canonical stored test set (reference convention: test
        # seed 1234, 10k npz); fall back to on-device generation when no
        # canonical file exists.
        canonical = os.path.join(
            ROOT, "data", env_name, f"test{p['num_loc']}_seed1234.npz")
        if os.path.exists(canonical) and eval_size <= 10_000:
            from rl4co_tpu.data.io import load_reference_npz
            raw = load_reference_npz(canonical, env_name)
            test = {k: v[:eval_size] for k, v in raw.items()}
            dataset_provenance[env_name] = {
                "path": os.path.relpath(canonical, ROOT),
                "convention": "reference numpy stream, test seed 1234",
                "n_used": eval_size,
            }
        else:
            test = e.generate_batch(jax.random.PRNGKey(1234), eval_size)
            dataset_provenance[env_name] = {
                "path": None,
                "convention": "on-device jax.random, PRNGKey(1234)",
                "n_used": eval_size,
            }
        opt = OPTIMA.get(env_name, {}).get(p["num_loc"])
        pol = (algo.policy.for_env(env_name)
               if hasattr(algo.policy, "for_env") else algo.policy)
        for method in p["eval_methods"]:
            last = [0.0]

            def _progress(done, total):
                # heartbeat for the stall watchdog: long evals are silent
                # otherwise and a 420 s quiet window reads as a hang
                now = time.time()
                if now - last[0] > 60 or done == total:
                    last[0] = now
                    print(json.dumps({"eval_progress": f"{done}/{total}",
                                      "method": method}), flush=True)

            res = evaluate_policy(e, pol, params, test,
                                  method=method, check_solutions=True,
                                  progress=_progress)
            maximize = env_name in MAXIMIZE
            if maximize:
                prize = res["mean_reward"]
                row = {"mean_prize": prize,
                       "instances_per_s": res["instances_per_s"],
                       "n_instances": int(res["rewards"].shape[0]),
                       "validity_checked": True}
                if opt:
                    row["gap_pct"] = 100.0 * (opt - prize) / opt
                    row["optimum_anchor"] = opt
            else:
                cost = -res["mean_reward"]
                row = {"mean_cost": cost,
                       "instances_per_s": res["instances_per_s"],
                       "n_instances": int(res["rewards"].shape[0]),
                       "validity_checked": True}
                if opt:
                    row["gap_pct"] = 100.0 * (cost - opt) / opt
                    row["optimum_anchor"] = opt
            key_name = (f"{env_name}/{method}" if len(eval_envs) > 1 else method)
            table[key_name] = row
            print(json.dumps({"eval": key_name,
                              **{k: round(v, 4) if _isnum(v) else v
                                 for k, v in row.items()}}), flush=True)
    return table, dataset_provenance


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True, choices=sorted(PRESETS))
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--train-size", type=int, default=None)
    ap.add_argument("--eval-size", type=int, default=10_000)
    ap.add_argument("--val-size", type=int, default=10_000)
    ap.add_argument("--precision", default="bf16-mixed",
                    choices=["bf16-mixed", "f32"])
    ap.add_argument("--resume", action="store_true",
                    help="resume from runs/ckpt_<preset>/last")
    ap.add_argument("--max-hours", type=float, default=None,
                    help="wall-time budget: stop after the first epoch that "
                         "ends past this, checkpoint, and run the final eval")
    ap.add_argument("--tag", default="", help="suffix for output files")
    ap.add_argument("--dispatch-chunk", type=int, default=None,
                    help="override steps fused per dispatch (smaller = "
                         "smaller XLA program; the batch-2048 AM-XL "
                         "program at chunk 125 crashed the TPU worker)")
    args = ap.parse_args(argv)

    p = dict(PRESETS[args.preset])
    if args.epochs is not None:
        p["epochs"] = args.epochs
    if args.train_size is not None:
        p["train_data_size"] = args.train_size

    from rl4co_tpu.loggers import JSONLLogger, MultiLogger
    from rl4co_tpu.tasks.eval import evaluate_policy
    from rl4co_tpu.trainer import Trainer, TrainerConfig

    name = args.preset + (f"_{args.tag}" if args.tag else "")
    env, algo = build_preset(p, args.precision)
    ckpt_dir = os.path.join(RUNS, f"ckpt_{name}")
    cfg = TrainerConfig(
        epochs=p["epochs"],
        batch_size=p["batch_size"],
        train_data_size=p["train_data_size"],
        val_data_size=args.val_size,
        val_batch_size=p["val_batch_size"],
        seed=1234,                      # reference seed (base.yaml:48)
        log_every=200,
        ckpt_dir=ckpt_dir,
        max_hours=args.max_hours,
        steps_per_dispatch=args.dispatch_chunk,
    )
    log_path = os.path.join(RUNS, f"{name}.jsonl")
    logger = MultiLogger(
        JSONLLogger(log_path),
        lambda m: print(json.dumps(
            {k: (round(float(v), 5) if _isnum(v) else str(v))
             for k, v in m.items()}), flush=True),
    )
    trainer = Trainer(algo, cfg, logger=logger)
    t0 = time.time()
    resume_from = os.path.join(ckpt_dir, "last")
    if not (args.resume and os.path.isdir(resume_from)):
        resume_from = None  # --resume on a fresh preset = start from scratch
    state = trainer.fit(resume_from=resume_from)
    train_h = (time.time() - t0) / 3600

    # ---- final eval: reference protocol, validity-checked ----
    table, dataset_provenance = final_eval_table(
        p, algo, env, state.params, args.eval_size)
    epochs_done = 1 + max(
        (int(r["epoch"]) for r in trainer.history if "epoch" in r), default=-1
    )
    out = {
        "preset": args.preset,
        "recipe": {k: v for k, v in p.items() if _isnum(v) or isinstance(v, (str, tuple))},
        "precision": args.precision,
        "epochs_trained": epochs_done,
        "train_hours": round(train_h, 3),
        "device": str(jax.devices()[0]),
        "eval": table,
        "eval_datasets": dataset_provenance,
        "cmd": "python " + " ".join(sys.argv),
        "argv": sys.argv,
    }
    with open(os.path.join(RUNS, f"{name}_eval.json"), "w") as f:
        json.dump(out, f, indent=2, default=str)
    print("WROTE", os.path.join(RUNS, f"{name}_eval.json"), flush=True)


def _isnum(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


if __name__ == "__main__":
    main()
