#!/usr/bin/env python
"""Train-step throughput vs batch size (ROOFLINE.md consequence 1).

The batch-512 TSP-100 train step is latency-bound on serialized small
decode kernels (runs/ROOFLINE.md): per-kernel working sets are far below
chip capacity, so batch should be nearly free throughput. This measures
the SAME jitted REINFORCE step program (bench.py train phase, chunk=125)
at batch 512 / 1024 / 2048 and records env-steps/s + MFU for each.

Run (TPU): python runs/train_batch_scaling.py
Writes runs/train_batch_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BATCHES = [int(b) for b in
           os.environ.get("RL4CO_SCALING_BATCHES", "512,1024,2048").split(",")]


def main():
    rows = []
    for b in BATCHES:
        env = os.environ.copy()
        env["RL4CO_BENCH_TRAIN_BATCH"] = str(b)
        row = {"train_batch": b}
        stdout = ""
        # keep dispatches small: 2 x 125 fused steps is plenty of signal;
        # one slow compile must not abort the whole sweep (r5 review #3)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py"),
                 "--phase", "train"],
                capture_output=True, text=True, timeout=560, env=env,
            )
            stdout = proc.stdout or ""
            if proc.returncode != 0:
                row["error"] = (proc.stderr or "").strip().splitlines()[-1:]
        except subprocess.TimeoutExpired as e:
            raw = e.stdout or b""
            stdout = (raw.decode(errors="replace")
                      if isinstance(raw, bytes) else raw)
            row["error"] = "timeout (560s) — compile window"
        for line in reversed(stdout.strip().splitlines()):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if "rate" in obj:
                row["env_steps_per_s"] = round(obj["rate"], 1)
                row.update(obj.get("extra", {}))
                row.pop("error", None)
                break
        rows.append(row)
        print(json.dumps(row), flush=True)
    base = next((r for r in rows
                 if r["train_batch"] == 512 and "env_steps_per_s" in r), None)
    out = {
        "what": ("TSP-100 AM REINFORCE train step (bench.py train phase, "
                 "chunk=125, bf16) at growing batch — same program, same "
                 "samples-per-epoch accounting (env-steps/s is batch x N x "
                 "steps / wall)"),
        "rows": rows,
        "a100_estimate_env_steps_per_s": 150_000.0,
        "note": ("the reference recipe trains at batch 512 (BASELINE.md); "
                 "rows above 512 measure chip throughput headroom, not the "
                 "recipe point"),
    }
    if base:
        for r in rows:
            if "env_steps_per_s" in r:
                r["vs_baseline_estimate"] = round(
                    r["env_steps_per_s"] / 150_000.0, 2)
                r["vs_batch512"] = round(
                    r["env_steps_per_s"] / base["env_steps_per_s"], 2)
    with open(os.path.join(ROOT, "runs", "train_batch_scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("WROTE runs/train_batch_scaling.json", flush=True)


if __name__ == "__main__":
    main()
