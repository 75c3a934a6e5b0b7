#!/bin/bash
# Round-5 TPU job queue: runs after the AM TSP-100 flagship job frees the
# tunnel (only ONE TPU client at a time — axon rule). Order: verdict
# deliverables first (canonical re-evals, MoE remedy), then diagnostics
# (r1 bench reconciliation, batch scaling), then the final bench prime so
# the driver's capture hits a warm cache + tunnel.
set -u
cd /root/repo

WD_PID=$(sed 's/.*pid=//' runs/am_tsp100_r5.pid)
echo "[queue] waiting for am_tsp100 watchdog pid=$WD_PID ($(date))"
while kill -0 "$WD_PID" 2>/dev/null; do sleep 30; done
echo "[queue] am_tsp100 done at $(date); 75s tunnel cooldown"
sleep 75

now() { date +%s; }
FINAL_END=${FINAL_END:-$(date -d "23:59" +%s)}

run_job() { # name deadline_epoch staleness cmd...
  local name="$1" deadline="$2" stale="$3"; shift 3
  [ "$deadline" -gt "$FINAL_END" ] && deadline=$FINAL_END
  if [ $(( deadline - $(now) )) -lt 300 ]; then
    echo "[queue] SKIP $name — <5 min before its deadline ($(date))"
    return 0
  fi
  echo "[queue] START $name until $(date -d @$deadline +%H:%M) ($(date))"
  bash runs/watchdog.sh "runs/${name}_r5.log" "$stale" "$deadline" -- "$@"
  echo "[queue] DONE $name rc=$? ($(date)); 75s cooldown"
  sleep 75
}

# 1. Canonical-dataset re-evals from the r4 checkpoints (VERDICT #4) —
#    minutes each; the fresh am_tsp100 run already evals canonically.
run_job reeval_am_tsp50 "$(( $(now) + 1500 ))" 420 \
  python runs/reeval_canonical.py --preset am_tsp50

run_job reeval_pomo_cvrp50 "$(( $(now) + 1800 ))" 420 \
  python runs/reeval_canonical.py --preset pomo_cvrp50

# 2. MoE remedy on the mixed OP+PCTSP config (VERDICT #5): same budget as
#    the r4 mixed run (100 epochs, 640k samples/epoch split across envs).
run_job mixed_op_pctsp_moe "$(( $(now) + 3000 ))" 420 \
  python runs/train_quality.py --preset mixed_op_pctsp_moe --epochs 100 \
    --resume --val-size 512 --eval-size 2000 --max-hours 0.6

# 3. r1 bench reconciliation (VERDICT #3): round-1's exact bench.py + its
#    own library checkout, today's tunnel. If it reproduces ~10.6M the
#    delta is code drift; if ~7M it was environment/window variance.
run_job bench_r1_worktree "$(( $(now) + 1200 ))" 420 \
  env PYTHONPATH=/root/repo/.worktrees/r1 \
      JAX_COMPILATION_CACHE_DIR=/root/repo/runs/jax_cache_r1 \
      python /root/repo/.worktrees/r1/bench.py

# 4. Train-phase batch scaling (VERDICT #2 / ROOFLINE.md consequence 1):
#    the same step program at batch 1024 and 2048.
run_job train_batch_scaling "$(( $(now) + 2400 ))" 500 \
  python runs/train_batch_scaling.py

# 5. Final bench prime: default config, new MFU fields; leaves both
#    phases' executables in runs/jax_cache for the driver.
run_job bench_prime "$(( $(now) + 1200 ))" 500 \
  python bench.py

echo "[queue] ALL DONE $(date)"
touch runs/r5_queue.ALLDONE
