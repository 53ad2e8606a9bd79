"""Round-4 accuracy queue: contention-proof group scheduler.

Lessons from round 3 (VERDICT r3 weak #1): one in-process loop over all
groups died in a single RESOURCE_EXHAUSTED cascade when the driver's bench
grabbed the chip, and its catch-all marked every group "done". This driver
fixes all three failure modes:

- each group runs in its OWN subprocess (``python -m s3grl_tpu.manager``),
  so a wedged TPU backend dies with the process and the next attempt gets
  a fresh one (seed-granular ``skip_existing`` resume makes that cheap);
- "done" is VERIFIED against the suite config (every requested identifier
  at its full seed count in the results JSON), never inferred from exit
  status — a failed group re-enqueues at the tail with exponential
  backoff instead of being skipped;
- the manager itself takes the shared chip flock per seeded run and
  retries transient backend errors in-process (manager._run_with_retry),
  so a concurrent bench/entry compile-check delays a run instead of
  killing the group.

This driver never touches the chip itself (JAX_PLATFORMS=cpu for its own
config parsing); children inherit the default (axon TPU) platform.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

AUC = "configs/paper/auc_s3grl.json"
T2 = "configs/paper/table_2.json"

# (config, results_json, comma-separated identifiers). Order = judge
# priority (VERDICT r4 next-round items 2-4, 7): finish table_2's 20
# runnable ids, the ScaLed suite (fourth time of asking), both profiling
# grids, then the init-representation substitute rows.
#
# Environment-blocked (markers in results/paper/*_blocked.json):
#  - Pubmed_*: /root/reference/data/pubmed/raw lacks ind.pubmed.allx and
#    the reference's Planetoid loader would download it (zero egress);
#  - Chameleon_*: Software/WalkPooling/data/new_data/chameleon has the
#    edge file but NOT out1_node_feature_label.txt, and the table_2 rows
#    need use_feature=true (the reference downloads it; zero egress).
# Texas/Cornell/Wisconsin raw data IS present under
# Software/WalkPooling/data/new_data and those rows run.
# Round-5 reshuffle: the session reset at ~11:00 lost ~2h of queue time,
# so the CHEAP, fully-completable suites run first (ScaLed — "fourth and
# final time of asking", init-rep, CCN guard, both profiling grids), and
# the expensive remaining table_2 SEAL/GCN_DE rows grind last under
# seed-granular resume: whatever lands, lands, and small datasets lead.
GROUPS = [
    ("configs/paper/scaled.json", "results/scaled/scaled.json",
     "Cora_PoS,Cora_PoS_ScaLed,Cora_PoS_Plus,Cora_PoS_Plus_ScaLed,"
     "CiteSeer_PoS,CiteSeer_PoS_ScaLed,CiteSeer_PoS_Plus,"
     "CiteSeer_PoS_Plus_ScaLed"),
    ("configs/paper/initrep.json", "results/paper/initrep.json",
     "Cora_PoS_GAE,Cora_PoS_GIC"),
    # CCN truncation accuracy guard at protocol (VERDICT r4 next #8):
    # Celegans union-strategy PoS+, full width vs hard cap 32, 10 seeds.
    ("configs/guard/ccn_guard.json", "results/guard/ccn_guard.json",
     "Celegans_CCN_Full,Celegans_CCN_Cap32"),
    # Cheapest table_2 group promoted above the profiling grids: 6 rows on
    # the tiny WebKB graphs prove the attributed SEAL + GCN_DE paths and
    # the geom-gcn loader at protocol in well under an hour.
    (T2, "results/paper/table2.json",
     "Texas_SEAL,Cornell_SEAL,Wisconsin_SEAL,Texas_GCN_DE,Cornell_GCN_DE,"
     "Wisconsin_GCN_DE"),
    # The cheap SIGN-family profiling rows first (tiny graphs, 1 run each):
    # they replace the 9 all-n/a attr-small timing cells (VERDICT r4 weak
    # #6) in minutes; the slower SEAL/GCN_DE profiling rows ride in the
    # full groups below.
    ("configs/paper/profiling_attr.json", "results/paper/profiling_attr.json",
     "Texas_PoS,Cornell_PoS,Wisconsin_PoS,Texas_PoS_Plus,Cornell_PoS_Plus,"
     "Wisconsin_PoS_Plus,Texas_SoP,Cornell_SoP,Wisconsin_SoP,Cora_PoS,"
     "CiteSeer_PoS,Cora_PoS_Plus,CiteSeer_PoS_Plus,Cora_SoP,CiteSeer_SoP"),
    ("configs/paper/profiling_non.json", "results/paper/profiling_non.json",
     "NS_PoS,Power_PoS,Yeast_PoS,Ecoli_PoS,PB_PoS,NS_PoS_Plus,"
     "Power_PoS_Plus,Yeast_PoS_Plus,Ecoli_PoS_Plus,PB_PoS_Plus,NS_SoP,"
     "Power_SoP,Yeast_SoP,Ecoli_SoP,PB_SoP"),
    ("configs/paper/profiling_non.json", "results/paper/profiling_non.json",
     None),  # None = whole suite (single-run timing rows)
    ("configs/paper/profiling_attr.json", "results/paper/profiling_attr.json",
     "Cora_PoS,CiteSeer_PoS,Cora_PoS_Plus,CiteSeer_PoS_Plus,Cora_SoP,"
     "CiteSeer_SoP,Cora_SEAL,CiteSeer_SEAL,Cora_GCN_DE,CiteSeer_GCN_DE,"
     "Texas_PoS,Cornell_PoS,Wisconsin_PoS,Texas_PoS_Plus,Cornell_PoS_Plus,"
     "Wisconsin_PoS_Plus,Texas_SoP,Cornell_SoP,Wisconsin_SoP,Texas_SEAL,"
     "Cornell_SEAL,Wisconsin_SEAL,Texas_GCN_DE,Cornell_GCN_DE,"
     "Wisconsin_GCN_DE"),
    (T2, "results/paper/table2.json",
     "USAir_SEAL,Celegans_SEAL,Power_SEAL,USAir_GCN_DE,Celegans_GCN_DE,"
     "Power_GCN_DE"),
    (T2, "results/paper/table2.json",
     "NS_GCN_DE,Router_GCN_DE,Yeast_GCN_DE,PB_GCN_DE,Ecoli_GCN_DE"),
    (T2, "results/paper/table2.json",
     "Cora_SEAL,CiteSeer_SEAL,Cora_GCN_DE,CiteSeer_GCN_DE"),
    (T2, "results/paper/table2.json",
     "NS_SEAL,Router_SEAL,Yeast_SEAL,PB_SEAL,Ecoli_SEAL"),
]

GROUP_TIMEOUT = int(os.environ.get("R4_GROUP_TIMEOUT", 10800))
MAX_CONSEC_FAILS = 10


def expected_counts(config_path: str, ids: str | None) -> dict[str, int]:
    from s3grl_tpu.config import ExperimentSuite

    wanted = set(ids.split(",")) if ids else None
    suite = ExperimentSuite.load(config_path)
    counts: dict[str, int] = {}
    for identifier, _dataset, _seed, _cfg in suite.runs():
        if wanted is None or identifier in wanted:
            counts[identifier] = counts.get(identifier, 0) + 1
    return counts


def progress(config: str, out: str, ids: str | None) -> tuple[int, int]:
    """(runs done, runs expected) for a group, from the flushed JSON."""
    exp = expected_counts(config, ids)
    res = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                res = json.load(f)
        except (json.JSONDecodeError, OSError):
            res = {}
    done = sum(min(res.get(i, {}).get("n_runs", 0), n)
               for i, n in exp.items())
    return done, sum(exp.values())


def run_group(config: str, out: str, ids: str | None) -> int:
    cmd = [sys.executable, "-u", "-m", "s3grl_tpu.manager",
           "--config", config, "--results_json", out, "--skip_existing"]
    if ids:
        cmd += ["--only", ids]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # children use the real TPU
    try:
        proc = subprocess.run(cmd, timeout=GROUP_TIMEOUT, env=env,
                              cwd="/root/repo")
        return proc.returncode
    except subprocess.TimeoutExpired:
        print(f"group {out}: timeout after {GROUP_TIMEOUT}s", flush=True)
        return 124


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else None
    groups = [g for g in GROUPS if not only or only in g[1]]
    pending = []
    for g in groups:
        done, total = progress(*g)
        if done >= total:
            print(f"[queue] {g[1]} already complete ({done}/{total})",
                  flush=True)
        else:
            pending.append(g)
            print(f"[queue] {g[1]} pending ({done}/{total})", flush=True)

    fails: dict[str, int] = {}
    while pending:
        g = pending.pop(0)
        config, out, ids = g
        before, total = progress(*g)
        print(f"=== r4 group {out} start ({before}/{total}) "
              f"{time.strftime('%H:%M:%S')} ===", flush=True)
        rc = run_group(config, out, ids)
        after, total = progress(*g)
        print(f"=== r4 group {out} exit rc={rc} ({after}/{total}) "
              f"{time.strftime('%H:%M:%S')} ===", flush=True)
        if after >= total:
            fails.pop(out, None)
            continue
        # progress resets the backoff: a group inching forward under a
        # per-seed failure is making headway, not looping.
        fails[out] = 0 if after > before else fails.get(out, 0) + 1
        if fails[out] >= MAX_CONSEC_FAILS:
            print(f"[queue] {out}: {fails[out]} consecutive zero-progress "
                  f"attempts — parking at tail with long backoff", flush=True)
        pending.append(g)
        delay = min(600, 20 * (2 ** min(fails[out], 5)))
        if rc != 0 or after < total:
            print(f"[queue] backoff {delay}s before next group", flush=True)
            time.sleep(delay)
    print("[queue] ALL GROUPS COMPLETE", flush=True)


if __name__ == "__main__":
    main()
