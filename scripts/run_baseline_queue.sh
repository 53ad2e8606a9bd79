#!/bin/bash
# Sequential paper-suite accuracy runs on the TPU, one results JSON per experiment.
# CONFIG selects the suite (default: the paper AUC suite).
set -u
cd /root/repo
CONFIG="${CONFIG:-configs/paper/auc_s3grl.json}"
for SPEC in "$@"; do
  ID="${SPEC%%:*}"; SEEDS="${SPEC##*:}"
  OUT="results/paper/${ID}.json"
  if [ -s "$OUT" ]; then echo "skip $ID (exists)"; continue; fi
  echo "=== $ID (max_seeds=$SEEDS) $(date +%T) ==="
  timeout 1500 python -m s3grl_tpu.manager --config "$CONFIG" \
    --results_json "$OUT" --only "$ID" --max_seeds "$SEEDS" \
    > "logs/${ID}.log" 2>&1
  echo "--- $ID exit=$? $(date +%T)"
done
