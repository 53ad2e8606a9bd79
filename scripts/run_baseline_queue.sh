#!/bin/bash
# Grouped paper-suite accuracy runs on the TPU.
#
# Each GROUP runs in ONE long-lived process (one remote-TPU pool claim, one
# set of XLA compiles, shared persistent cache) via the manager's
# --skip_existing resume: per-experiment aggregates flush to the group JSON
# after every seeded run, so a killed group loses at most one seed and a
# rerun skips completed experiments.
#
# Usage: CONFIG=configs/paper/auc_s3grl.json scripts/run_baseline_queue.sh \
#          "group_name=Id1,Id2,..." ...
set -u
cd /root/repo
CONFIG="${CONFIG:-configs/paper/auc_s3grl.json}"
for SPEC in "$@"; do
  GROUP="${SPEC%%=*}"; IDS="${SPEC#*=}"
  OUT="results/paper/${GROUP}.json"
  echo "=== group $GROUP $(date +%T) ==="
  timeout "${GROUP_TIMEOUT:-10800}" python -m s3grl_tpu.manager \
    --config "$CONFIG" --results_json "$OUT" --only "$IDS" --skip_existing \
    >> "logs/${GROUP}.log" 2>&1
  echo "--- $GROUP exit=$? $(date +%T)"
done
