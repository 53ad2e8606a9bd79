#!/bin/bash
# Round-3 accuracy queue wrapper: staleness watchdog + periodic commits of
# results/ (round 2 lost a finished group to a session reset because
# results/ was gitignored and never committed).
set -u
cd /root/repo
STALE="${STALE_SECS:-2400}"
LOG=logs/queue_r3_runs.log
mkdir -p results/paper results/scaled

commit_results() {
  git add results logs/queue_r3_runs.log 2>/dev/null
  if ! git diff --cached --quiet -- results; then
    git commit -q -m "results: queue checkpoint $(date +%H:%M)" \
      -- results logs/queue_r3_runs.log 2>/dev/null || true
  fi
}

for ATTEMPT in 1 2 3 4 5 6 7 8; do
  echo "=== r3 queue attempt $ATTEMPT $(date +%T) ==="
  touch "$LOG"
  timeout 21600 python -u scripts/run_r3_queue.py >> "$LOG" 2>&1 &
  MPID=$!
  TICK=0
  while kill -0 "$MPID" 2>/dev/null; do
    sleep 60
    TICK=$((TICK + 1))
    # commit results every 10 min so a session reset loses <=10 min of runs
    [ $((TICK % 10)) -eq 0 ] && commit_results
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "--- watchdog: r3 queue quiet ${AGE}s, restarting (pid $MPID)"
      kill "$MPID" 2>/dev/null; sleep 5; kill -9 "$MPID" 2>/dev/null
      break
    fi
  done
  wait "$MPID"; RC=$?
  commit_results
  echo "--- r3 queue attempt $ATTEMPT exit=$RC $(date +%T)"
  [ "$RC" -eq 0 ] && break
done
