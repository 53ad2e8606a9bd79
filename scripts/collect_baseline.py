"""Collate paper-suite results JSONs into the BASELINE.md results table.

Usage: python scripts/collect_baseline.py [results/paper] [--update]

Reads every ``*.json`` under the results dir (each in the manager's
results-JSON schema, sgrl_run_manager.py:169-177 parity) and prints a
markdown table row per experiment: AUC mean±std, prep / train / inference
times, seed count — the measurement protocol of
/root/reference/configs/paper/auc_s3grl.json (50 epochs, highest-valid
test selection, utils.py:769-792).

With ``--update``, rows are merged into BASELINE.md between the
RESULTS_TABLE_START/END markers (existing rows for the same experiment are
replaced; rows for experiments with no results JSON are kept).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

BASELINE_MD = os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")
START = "<!-- RESULTS_TABLE_START -->"
END = "<!-- RESULTS_TABLE_END -->"
HEADER = (
    "| Experiment | Seeds | Test AUC | Prep (s) | Prep warm (s) | "
    "Train/epoch (s) | Inf/epoch (s) | Runtime (s) |"
    "\n|---|---|---|---|---|---|---|---|"
)


# Suites whose identifiers intentionally REUSE auc_s3grl ids (byte-parity
# with the reference corpus): merging them into the main AUC table would
# overwrite 10-seed accuracy rows with 1-run timing rows. They get their
# own BASELINE.md sections (scripts/render_r5_sections.py).
EXCLUDE = ("profiling_attr", "profiling_non", "table2")


def collect(results_dir: str) -> dict:
    merged: dict = {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*.json"))):
        if os.path.basename(path).startswith(EXCLUDE):
            continue
        with open(path) as f:
            data = json.load(f)
        for identifier, payload in data.items():
            merged[identifier] = payload
    return merged


def row_for(identifier: str, payload: dict) -> str:
    r = payload["results"]
    seeds = payload.get("n_runs", "?")
    # warm = marginal per-seed prep, first (compile-paying) run excluded
    warm = r.get("Average Dataset Prep Time (warm)", "—")
    return (
        f"| {identifier} | {seeds} | {r['Average Test AUC']} | "
        f"{r['Average Dataset Prep Time']} | {warm} | "
        f"{r['Average Train time per epoch']} | "
        f"{r['Average Inf time per epoch']} | "
        f"{r['Average Runtime']} |"
    )


def _sort_key(identifier: str):
    # Group by dataset then model flavour, stable for the table reader.
    m = re.match(r"([A-Za-z]+)_(PoS_Plus|PoS|SoP|.*)", identifier)
    order = {"PoS": 0, "PoS_Plus": 1, "SoP": 2}
    if m:
        return (m.group(1), order.get(m.group(2), 9), identifier)
    return (identifier, 9, identifier)


def update_markdown(rows: dict, path: str = BASELINE_MD) -> None:
    with open(path) as f:
        text = f.read()
    pre, rest = text.split(START, 1)
    body, post = rest.split(END, 1)
    # Keep existing rows not superseded by a fresh results JSON.
    for line in body.strip().splitlines():
        m = re.match(r"\|\s*([\w+]+)\s*\|", line)
        if m and m.group(1) not in rows and "Experiment" not in line \
                and not set(line) <= set("|- "):
            rows[m.group(1)] = line.strip()
    table = "\n".join([HEADER] + [rows[k] for k in sorted(rows, key=_sort_key)])
    with open(path, "w") as f:
        f.write(pre + START + "\n" + table + "\n" + END + post)


def main():
    argv = [a for a in sys.argv[1:] if a != "--update"]
    do_update = "--update" in sys.argv[1:]
    results_dir = argv[0] if argv else "results/paper"
    merged = collect(results_dir)
    rows = {k: row_for(k, v) for k, v in merged.items()}
    print(HEADER)
    for k in sorted(rows, key=_sort_key):
        print(rows[k])
    if do_update:
        update_markdown(rows)
        print(f"\nupdated {os.path.normpath(BASELINE_MD)}")


if __name__ == "__main__":
    main()
