#!/bin/bash
# Grouped paper-suite accuracy runs on the TPU.
#
# Each GROUP runs in ONE long-lived process (one remote-TPU pool claim, one
# set of XLA compiles, shared persistent cache) via the manager's
# --skip_existing resume: per-experiment aggregates flush to the group JSON
# after every seeded run, so a killed group loses at most one seed and a
# rerun skips completed experiments.
#
# A staleness watchdog restarts a group whose log has gone quiet for
# STALE_SECS: the remote-TPU pool claim RPC can hang forever if it is sent
# while the pool is wedged (observed: a fresh process claims in seconds
# while an old one waits 40+ min on the same RPC).
#
# Usage: CONFIG=configs/paper/auc_s3grl.json scripts/run_baseline_queue.sh \
#          "group_name=Id1,Id2,..." ...
set -u
cd /root/repo
CONFIG="${CONFIG:-configs/paper/auc_s3grl.json}"
STALE_SECS="${STALE_SECS:-1200}"
ATTEMPTS="${ATTEMPTS:-4}"

for SPEC in "$@"; do
  GROUP="${SPEC%%=*}"; IDS="${SPEC#*=}"
  OUT="results/paper/${GROUP}.json"
  LOG="logs/${GROUP}.log"
  for ATTEMPT in $(seq 1 "$ATTEMPTS"); do
    echo "=== group $GROUP attempt $ATTEMPT $(date +%T) ==="
    touch "$LOG"
    timeout "${GROUP_TIMEOUT:-10800}" python -u -m s3grl_tpu.manager \
      --config "$CONFIG" --results_json "$OUT" --only "$IDS" \
      --skip_existing >> "$LOG" 2>&1 &
    MPID=$!
    while kill -0 "$MPID" 2>/dev/null; do
      sleep 60
      AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$AGE" -gt "$STALE_SECS" ]; then
        echo "--- watchdog: $GROUP quiet ${AGE}s, restarting (pid $MPID)"
        kill "$MPID" 2>/dev/null; sleep 5; kill -9 "$MPID" 2>/dev/null
        break
      fi
    done
    wait "$MPID"; RC=$?
    echo "--- $GROUP attempt $ATTEMPT exit=$RC $(date +%T)"
    [ "$RC" -eq 0 ] && break
  done
done
