#!/bin/bash
# Round-3 TPU job queue (final form): after the AM quality run,
# NAR TSP-500 then a short POMO CVRP-50, both stall-tolerant.
# Everything must be off the tunnel well before the driver's bench.py.
set -u
cd /root/repo

AM_PID=$(cat runs/am_tsp50_r3.pid | sed 's/pid=//')
echo "[queue] waiting for AM watchdog pid=$AM_PID"
while kill -0 "$AM_PID" 2>/dev/null; do sleep 20; done
if [ ! runs/am_tsp50_eval.json -nt runs/am_tsp50_r3.pid ]; then
  echo "[queue] AM gone but no fresh eval artifact — continuing anyway (recovery is manual)"
fi
sleep 75
echo "[queue] AM done at $(date)"

NAR_DEADLINE=$(date -d "06:37" +%s)
if [ "$(date +%s)" -lt "$NAR_DEADLINE" ]; then
  echo "[queue] NAR TSP-500 start $(date)"
  bash runs/watchdog.sh runs/nar_tsp500_r3.log 420 "$NAR_DEADLINE" -- \
    python runs/nar_tsp500.py --max-hours 0.15
  echo "[queue] NAR done rc=$? $(date)"; sleep 75
fi

POMO_DEADLINE=$(date -d "06:56" +%s)
if [ "$(date +%s)" -lt "$(date -d "06:42" +%s)" ]; then
  echo "[queue] POMO CVRP-50 start $(date)"
  bash runs/watchdog.sh runs/pomo_cvrp50_r3.log 420 "$POMO_DEADLINE" -- \
    python runs/train_quality.py --preset pomo_cvrp50 --epochs 100 \
      --resume --val-size 512 --eval-size 2000 --max-hours 0.18
  echo "[queue] POMO done rc=$? $(date)"
fi
echo "[queue] ALL DONE $(date)"
