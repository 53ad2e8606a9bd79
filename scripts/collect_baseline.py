"""Collate paper-suite results JSONs into the BASELINE.md results table.

Usage: python scripts/collect_baseline.py [results/paper]

Reads every ``*.json`` under the results dir (each in the manager's
results-JSON schema, sgrl_run_manager.py:169-177 parity) and prints a
markdown table row per experiment: AUC mean±std, prep / train / inference
times, seed count — the measurement protocol of
/root/reference/configs/paper/auc_s3grl.json (50 epochs, highest-valid
test selection, utils.py:769-792).
"""
from __future__ import annotations

import glob
import json
import os
import sys


def collect(results_dir: str) -> dict:
    merged: dict = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        with open(path) as f:
            data = json.load(f)
        for identifier, payload in data.items():
            merged[identifier] = payload
    return merged


def main():
    results_dir = sys.argv[1] if len(sys.argv) > 1 else "results/paper"
    merged = collect(results_dir)
    print("| Experiment | Test AUC | Prep (s) | Train/epoch (s) | "
          "Inf/epoch (s) | Runtime (s) |")
    print("|---|---|---|---|---|---|")
    order = sorted(merged)
    for identifier in order:
        r = merged[identifier]["results"]
        print(
            f"| {identifier} | {r['Average Test AUC']} | "
            f"{r['Average Dataset Prep Time']} | "
            f"{r['Average Train time per epoch']} | "
            f"{r['Average Inf time per epoch']} | "
            f"{r['Average Runtime']} |"
        )


if __name__ == "__main__":
    main()
