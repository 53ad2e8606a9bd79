"""Recover per-experiment AUC aggregates from a manager run log.

The manager flushes results JSONs per run, but a session reset before the
results dir was committed can lose them while the log survives. Each seeded
run prints two Logger blocks (dict order of evaluate_auc: AUC then AP,
s3grl_tpu/train/metrics.py:68-75); the first block's 5-decimal
"Highest Test" is that seed's best-valid-selected test AUC — exactly what
the manager aggregates into "Average Test AUC".

Timing columns cannot be recovered from the log; they are emitted as "n/a"
and the experiment is marked recovered_from_log so a later full re-run can
supersede it.

Usage: python scripts/recover_results_from_log.py logs/attr_small.log \
           results/paper/attr_small_recovered.json
"""
from __future__ import annotations

import json
import os
import re
import sys

import numpy as np


def parse(log_path: str) -> dict:
    runs: dict[str, list[float]] = {}
    current = None
    block_in_run = 0
    with open(log_path) as f:
        for line in f:
            m = re.match(r"Run (\d+) of \S+ with id (\S+)", line)
            if m:
                current = m.group(2)
                block_in_run = 0
                continue
            m = re.match(
                r"\(Precision of 5\)Highest Test: ([\d.]+) ±", line
            )
            if m and current is not None:
                block_in_run += 1
                if block_in_run == 1:  # first block per run = AUC
                    runs.setdefault(current, []).append(float(m.group(1)))
    return runs


def main():
    log_path, out_path = sys.argv[1], sys.argv[2]
    runs = parse(log_path)
    na = "n/a"
    results = {}
    for identifier, scores in runs.items():
        arr = np.asarray(scores)
        std = arr.std() if arr.size > 1 else 0.0
        results[identifier] = {
            "results": {
                "Average Runtime": na,
                "Average Test AUC": f"{arr.mean():.2f} ± {std:.2f}",
                "Average Dataset Prep Time": na,
                "Average Dataset Prep Time (warm)": na,
                "Average Train time per epoch": na,
                "Average Inf time per epoch": na,
                "Total Model Parameters": na,
            },
            "n_runs": int(arr.size),
            "recovered_from_log": os.path.basename(log_path),
        }
        print(identifier, results[identifier]["results"]["Average Test AUC"],
              f"(n={arr.size})")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
