#!/bin/bash
# Round-3 TPU job queue: runs after the AM TSP-50 quality run completes.
# One TPU job at a time (the axon tunnel wedges under concurrent clients);
# ~60s cooldown between jobs (server drains the previous session).
# Short, high-value jobs first so an end-of-round cutoff costs least.
set -u
cd /root/repo

# hard cutoff: no new TPU job after this time — the round ends ~07:00 and
# the driver's bench.py must find the tunnel free
CUTOFF=$(date -d "06:40" +%s 2>/dev/null || echo 9999999999)
can_start() { [ "$(date +%s)" -lt "$CUTOFF" ]; }

AM_PID=$(cat runs/am_tsp50_r3.pid | sed 's/pid=//')
echo "[queue] waiting for AM run pid=$AM_PID"
while kill -0 "$AM_PID" 2>/dev/null; do sleep 20; done
# a killed run must not trigger the queue: require a completed-run
# artifact NEWER than this run's launch
if [ ! runs/am_tsp50_eval.json -nt runs/am_tsp50_r3.pid ]; then
  echo "[queue] AM pid gone but no fresh eval artifact — aborting queue $(date)"
  exit 1
fi
sleep 60
echo "[queue] AM run done at $(date)"

can_start || { echo "[queue] cutoff reached, skipping remaining"; exit 0; }
echo "[queue] NAR TSP-500 start $(date)"
timeout 2100 python runs/nar_tsp500.py --max-hours 0.2 \
    > runs/nar_tsp500_r3.log 2>&1
echo "[queue] NAR done rc=$? $(date)"; sleep 60

can_start || { echo "[queue] cutoff reached, skipping remaining"; exit 0; }
echo "[queue] pointer kernel bench start $(date)"
timeout 1500 python runs/bench_pointer_kernel.py > runs/kernel_bench_r3.log 2>&1
echo "[queue] kernel bench done rc=$? $(date)"; sleep 60

can_start || { echo "[queue] cutoff reached, skipping remaining"; exit 0; }
echo "[queue] POMO CVRP-50 start $(date)"
timeout 3000 python runs/train_quality.py --preset pomo_cvrp50 --epochs 100 \
    --val-size 512 --max-hours 0.4 > runs/pomo_cvrp50_r3.log 2>&1
echo "[queue] POMO done rc=$? $(date)"; sleep 60

for preset in mixed_op_pctsp op20_single pctsp20_single; do
  can_start || { echo "[queue] cutoff reached"; exit 0; }
  echo "[queue] $preset start $(date)"
  timeout 1200 python runs/train_quality.py --preset "$preset" --epochs 4 \
      --val-size 1000 > "runs/${preset}_r3.log" 2>&1
  echo "[queue] $preset done rc=$? $(date)"; sleep 60
done

can_start || { echo "[queue] cutoff reached, skipping remaining"; exit 0; }
echo "[queue] TSP-1000 eval start $(date)"
timeout 900 python -m rl4co_tpu.tasks.eval_cli --problem tsp --num-loc 1000 \
    --method greedy --size 128 --batch-size 32 \
    > runs/tsp1000_eval_raw.json 2> runs/tsp1000_eval.log
echo "[queue] tsp1000 done rc=$? $(date)"; sleep 60

can_start && {
  echo "[queue] AM-XL probe start $(date)"
  timeout 1200 python runs/train_quality.py --preset amxl_tsp100 --epochs 3 \
      --val-size 512 --max-hours 0.15 > runs/amxl_tsp100_r3.log 2>&1
  echo "[queue] AM-XL done rc=$? $(date)"
}
echo "[queue] ALL DONE $(date)"
