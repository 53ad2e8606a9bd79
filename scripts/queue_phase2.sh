#!/bin/bash
# Phase-2 accuracy queue: ONE process for all remaining groups (the tunnel
# charges a first-fetch stall per process), restarted by a staleness
# watchdog if it wedges; --skip_existing resume makes restarts cheap.
set -u
cd /root/repo
STALE="${STALE_SECS:-3000}"
LOG=logs/queue_phase2_runs.log
for ATTEMPT in 1 2 3 4 5 6; do
  echo "=== phase2 attempt $ATTEMPT $(date +%T) ==="
  touch "$LOG"
  timeout 21600 python -u scripts/run_phase2_oneproc.py >> "$LOG" 2>&1 &
  MPID=$!
  while kill -0 "$MPID" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "--- watchdog: phase2 quiet ${AGE}s, restarting (pid $MPID)"
      kill "$MPID" 2>/dev/null; sleep 5; kill -9 "$MPID" 2>/dev/null
      break
    fi
  done
  wait "$MPID"; RC=$?
  echo "--- phase2 attempt $ATTEMPT exit=$RC $(date +%T)"
  [ "$RC" -eq 0 ] && break
done
