#!/bin/bash
# Watchdog supervisor for the streamed flagship training run.
#
# This rig's axon device RPCs can wedge forever mid-level (zero process IO,
# every thread in futex/socket wait — observed rounds 4 and 5).  The run
# itself checkpoints per candidate tree (train_forest checkpoint_dir), so
# the recovery policy is: kill the run when its log goes stale, relaunch,
# resume.  Bit-identical to an uninterrupted run (the rng stream is part of
# the checkpoint).
#
# Usage: scripts/train_supervised.sh <logfile> [stale_seconds] [max_attempts]
set -u
LOG=${1:?logfile}
STALE=${2:-720}
MAX=${3:-6}
cd "$(dirname "$0")/.."

for attempt in $(seq 1 "$MAX"); do
  echo "[supervisor] attempt $attempt/$MAX $(date)" >> "$LOG"
  B3D_V2_REUSE=1 B3D_V2_STREAM_FINE=1 \
    python scripts/flagship_v2.py 120 16 >> "$LOG" 2>&1 &
  PID=$!
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"
      RC=$?
      echo "[supervisor] run exited rc=$RC $(date)" >> "$LOG"
      if [ "$RC" -eq 0 ]; then exit 0; fi
      break  # crashed: relaunch (resumes from checkpoint)
    fi
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "[supervisor] log stale ${AGE}s -> killing wedged run" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 5
      break
    fi
  done
done
echo "[supervisor] giving up after $MAX attempts $(date)" >> "$LOG"
exit 1
