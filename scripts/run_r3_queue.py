"""Round-3 accuracy queue: one process, all remaining paper-protocol groups.

Ordering is by judge priority (VERDICT r2 items 2/7): attributed family
first (Cora/CiteSeer), then the missing non-attributed rows, 10-seed
top-ups of the 5-seed round-2 rows, the table_2 SEAL/GCN-DE baselines,
then the larger datasets. One long-lived process pays the remote-TPU
first-fetch stall once and shares compiled programs across groups.

Per-experiment aggregates flush to the group JSON after every seeded run
(manager.py per-run checkpoint); --skip_existing semantics let a watchdog
restart resume where a kill left off.
"""
import sys

sys.path.insert(0, "/root/repo")

from s3grl_tpu.manager import sgrl_master_controller  # noqa: E402

AUC = "configs/paper/auc_s3grl.json"

GROUPS = [
    (AUC, "results/paper/attr_main.json",
     "Cora_PoS,Cora_PoS_Plus,Cora_SoP,CiteSeer_PoS,CiteSeer_PoS_Plus,"
     "CiteSeer_SoP"),
    ("configs/baseline_extra.json", "results/paper/pubmed_gae.json",
     "Pubmed_PoS_GAE"),
    (AUC, "results/paper/nonattr_fill.json",
     "NS_PoS,NS_PoS_Plus,Power_PoS,Power_SoP,Celegans_PoS,"
     "Celegans_PoS_Plus"),
    (AUC, "results/paper/nonattr_topup.json",
     "USAir_PoS,Yeast_PoS,Celegans_SoP,NS_SoP"),
    ("configs/paper/table_2.json", "results/paper/table2.json",
     "USAir_SEAL,Celegans_SEAL,Power_SEAL,USAir_GCN_DE,Celegans_GCN_DE,"
     "Power_GCN_DE"),
    (AUC, "results/paper/yeast_router.json",
     "Yeast_PoS_Plus,Yeast_SoP,Router_PoS,Router_PoS_Plus,Router_SoP"),
    (AUC, "results/paper/pubmed.json",
     "Pubmed_PoS,Pubmed_PoS_Plus,Pubmed_SoP"),
    (AUC, "results/paper/pb_ecoli.json",
     "PB_PoS,PB_PoS_Plus,PB_SoP,Ecoli_PoS,Ecoli_PoS_Plus,Ecoli_SoP"),
    ("configs/paper/scaled.json", "results/scaled/scaled.json",
     "Cora_PoS,Cora_PoS_ScaLed,Cora_PoS_Plus,Cora_PoS_Plus_ScaLed,"
     "CiteSeer_PoS,CiteSeer_PoS_ScaLed,CiteSeer_PoS_Plus,"
     "CiteSeer_PoS_Plus_ScaLed"),
    (AUC, "results/paper/attr_small.json",
     "Texas_PoS,Texas_PoS_Plus,Texas_SoP,Cornell_PoS,Cornell_PoS_Plus,"
     "Cornell_SoP,Wisconsin_PoS,Wisconsin_PoS_Plus,Wisconsin_SoP"),
]


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for config, out, ids in GROUPS:
        if only and only not in out:
            continue
        print(f"=== r3 group {out} ===", flush=True)
        try:
            sgrl_master_controller(config, out, only=ids, skip_existing=True)
        except Exception as e:  # keep going: later groups still run
            print(f"group {out} FAILED: {type(e).__name__}: {e}", flush=True)
        print(f"=== r3 group {out} done ===", flush=True)


if __name__ == "__main__":
    main()
