#!/bin/bash
# Stall-tolerant runner for TPU jobs on the axon tunnel.
#
#   runs/watchdog.sh <logfile> <staleness_s> <deadline_epoch> -- <cmd...>
#
# Launches <cmd>, watches <logfile> mtime; if it goes stale for
# <staleness_s> seconds the job is killed (the tunnel stalls fetches
# mid-run — round-3 observations), the tunnel gets a 75 s cooldown, and
# the command is relaunched (commands must be resumable — train_quality
# --resume picks up from the last checkpoint). Stops when the command
# exits by itself or the wall-clock deadline passes.
set -u
LOG="$1"; STALE="$2"; DEADLINE="$3"; shift 3
[ "$1" = "--" ] && shift

attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  attempt=$((attempt + 1))
  echo "[watchdog] attempt $attempt: $* (log $LOG)" >> "$LOG.wd"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALE" ]; then
      echo "[watchdog] stale $((now - mt))s at $(date) — killing $PID" >> "$LOG.wd"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      sleep 75   # tunnel cooldown
      break
    fi
    if [ "$now" -ge "$DEADLINE" ]; then
      echo "[watchdog] deadline at $(date) — killing $PID" >> "$LOG.wd"
      kill "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      exit 2
    fi
  done
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null; RC=$?
    # clean exit (not a watchdog kill) -> done
    if [ -f "$LOG.done" ] || [ "$RC" -eq 0 ]; then
      echo "[watchdog] command exited rc=$RC at $(date)" >> "$LOG.wd"
      exit "$RC"
    fi
    echo "[watchdog] command died rc=$RC at $(date) — relaunching" >> "$LOG.wd"
    sleep 75
  fi
done
exit 2
