#!/bin/bash
# Round-5 flagship: plain AM-128 + REINFORCE(rollout) on TSP-100, exact
# reference recipe (batch 512, 1.28M samples/epoch, Adam 1e-4, seed 1234),
# --max-hours recomputed from the absolute TRAIN_END epoch so watchdog
# relaunches (tunnel stalls) don't restart the time budget. After training
# stops, the same process runs the 10k-instance canonical-dataset eval
# (greedy + dihedral-8 augmentation) and writes runs/am_tsp100_eval.json.
set -u
cd /root/repo
: "${TRAIN_END:?set TRAIN_END to an epoch-seconds deadline}"
REMAIN=$(python3 - <<EOF
import time
print(max(0.02, round(($TRAIN_END - time.time()) / 3600, 3)))
EOF
)
echo "[r5_am_tsp100] attempt starts $(date); max-hours $REMAIN"
# batch-8192 eval dispatches: plain AM-128 at N=100 fits comfortably
# (8 heads x 8192 x 100^2 bf16 scores ~ 1.3 GB); the 32k default was the
# AM-XL OOM lesson (R4_NOTES).
export RL4CO_EVAL_BATCH_CEIL=8192
exec python runs/train_quality.py --preset am_tsp100 --epochs 100 --resume \
    --val-size 1024 --eval-size 10000 --max-hours "$REMAIN"
