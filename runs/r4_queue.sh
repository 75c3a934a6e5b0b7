#!/bin/bash
# Round-4 TPU job queue (v3): small deliverables first, AM-XL takes the
# remainder (it is checkpoint-resumable across rounds; NAR/GLOP/mixed are
# lose-entirely-if-skipped). Each job runs under the stall watchdog with an
# ABSOLUTE deadline; FINAL_END frees the tunnel for the driver's bench.
set -u
cd /root/repo

POMO_PID=$(sed 's/.*pid=//' runs/pomo_cvrp50_r4.pid)
echo "[queue] waiting for POMO watchdog pid=$POMO_PID ($(date))"
while kill -0 "$POMO_PID" 2>/dev/null; do sleep 30; done
echo "[queue] POMO done at $(date); 75s tunnel cooldown"
sleep 75

now() { date +%s; }
FINAL_END=${FINAL_END:-$(date -d "15:00" +%s)}

run_job() { # name deadline_epoch staleness cmd...
  local name="$1" deadline="$2" stale="$3"; shift 3
  [ "$deadline" -gt "$FINAL_END" ] && deadline=$FINAL_END
  if [ $(( deadline - $(now) )) -lt 300 ]; then
    echo "[queue] SKIP $name — <5 min before its deadline ($(date))"
    return 0
  fi
  echo "[queue] START $name until $(date -d @$deadline +%H:%M) ($(date))"
  bash runs/watchdog.sh "runs/${name}_r4.log" "$stale" "$deadline" -- "$@"
  echo "[queue] DONE $name rc=$? ($(date)); 75s cooldown"
  sleep 75
}

# 0. Prime the bench compile cache in the driver's exact environment
#    (VERDICT #2) — FIRST so nothing can squeeze it out.
run_job bench_prime "$(( $(now) + 1200 ))" 600 \
  python bench.py

# 1. NAR TSP-500 re-emit with warm eval timing (VERDICT #7) — small.
run_job nar_tsp500 "$(( $(now) + 1200 ))" 420 \
  python runs/nar_tsp500.py --max-hours 0.12

# 2. GLOP at TSP-1000 with a learned SHPP-25 reviser (VERDICT #6) — small.
run_job glop_tsp1000 "$(( $(now) + 1800 ))" 420 \
  python runs/glop_tsp1000.py --reviser-epochs 3

# 3. Mixed OP+PCTSP re-train + fresh eval (VERDICT #5) — chunked dispatch,
#    full 100 epochs ≈ 30-40 min.
run_job mixed_op_pctsp "$(( $(now) + 2700 ))" 420 \
  python runs/train_quality.py --preset mixed_op_pctsp --epochs 100 --resume \
    --val-size 512 --eval-size 2000 --max-hours 0.45

# matched per-env budgets: controls train the SAME epoch count the mixed
# run achieved (mixed splits 640k samples/epoch across two envs = 320k
# per env per epoch; controls train 320k/epoch of their one env).
E=$(python - <<'EOF'
import json
try:
    print(json.load(open("runs/mixed_op_pctsp_eval.json"))["epochs_trained"])
except Exception:
    print(20)
EOF
)
echo "[queue] mixed epochs_trained=$E -> controls --epochs $E"

run_job op20_single "$(( $(now) + 1500 ))" 420 \
  python runs/train_quality.py --preset op20_single --epochs "$E" --resume \
    --val-size 512 --eval-size 2000 --max-hours 0.3

run_job pctsp20_single "$(( $(now) + 1500 ))" 420 \
  python runs/train_quality.py --preset pctsp20_single --epochs "$E" --resume \
    --val-size 512 --eval-size 2000 --max-hours 0.3

# 4. AM-XL TSP-100 (VERDICT #4): whatever time remains, checkpointed for
#    round-5 resume. max-hours sized from the remaining window (minus eval).
REMAIN=$(( FINAL_END - $(now) - 600 ))
if [ "$REMAIN" -gt 900 ]; then
  MH=$(python -c "print(round($REMAIN/3600, 2))")
  run_job amxl_tsp100 "$FINAL_END" 420 \
    python runs/train_quality.py --preset amxl_tsp100 --epochs 100 --resume \
      --val-size 1024 --eval-size 10000 --max-hours "$MH"
else
  echo "[queue] SKIP amxl_tsp100 — <15 min remain"
fi

# 5. Re-prime the bench late so the driver's first dispatch hits a warm
#    tunnel as well as a warm cache (skipped automatically if <5 min).
run_job bench_reprime "$(( $(now) + 900 ))" 500 \
  python bench.py

echo "[queue] ALL DONE $(date)"
touch runs/r4_queue.ALLDONE
