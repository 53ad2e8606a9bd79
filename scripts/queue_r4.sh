#!/bin/bash
# Round-4 accuracy queue wrapper: staleness watchdog + periodic commits of
# the protocol artifacts ONLY (results/paper, results/scaled — round 3's
# wholesale `git add results` polluted history with ~150 smoke-run dirs,
# VERDICT r3 weak #7). The python driver is started in its own process
# group so a watchdog kill also reaps the group subprocess that actually
# holds the chip lock.
set -u
cd /root/repo
STALE="${STALE_SECS:-2400}"
LOG=logs/queue_r4_runs.log
mkdir -p results/paper results/scaled results/guard logs

commit_results() {
  git add results/paper results/scaled results/guard "$LOG" 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "results: queue checkpoint $(date +%H:%M)" \
      2>/dev/null || true
  fi
}

for ATTEMPT in $(seq 1 12); do
  echo "=== r4 queue attempt $ATTEMPT $(date +%T) ==="
  touch "$LOG"
  setsid python -u scripts/run_r4_queue.py >> "$LOG" 2>&1 &
  MPID=$!
  TICK=0
  while kill -0 "$MPID" 2>/dev/null; do
    sleep 60
    TICK=$((TICK + 1))
    [ $((TICK % 10)) -eq 0 ] && commit_results
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "--- watchdog: r4 queue quiet ${AGE}s, killing group (pgid $MPID)"
      kill -- -"$MPID" 2>/dev/null; sleep 5; kill -9 -- -"$MPID" 2>/dev/null
      break
    fi
  done
  wait "$MPID"; RC=$?
  commit_results
  echo "--- r4 queue attempt $ATTEMPT exit=$RC $(date +%T)"
  [ "$RC" -eq 0 ] && grep -q "ALL GROUPS COMPLETE" "$LOG" && break
done
