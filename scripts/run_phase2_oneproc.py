"""Phase-2 accuracy queue in ONE process.

The remote-TPU tunnel charges every process a first-fetch stall (minutes,
variable); running all remaining suite groups through one long-lived
process pays it once and shares every compiled program. Per-experiment
aggregates still flush to their group JSON after each seeded run, and
--skip_existing semantics let a rerun pick up where a kill left off.
"""
import sys

sys.path.insert(0, "/root/repo")

from s3grl_tpu.manager import sgrl_master_controller  # noqa: E402

GROUPS = [
    ("configs/paper/auc_s3grl.json", "results/paper/nonattr_3.json",
     "Router_PoS,Router_PoS_Plus,Router_SoP,PB_PoS,PB_PoS_Plus,PB_SoP,"
     "Ecoli_PoS,Ecoli_PoS_Plus,Ecoli_SoP"),
    ("configs/paper/auc_s3grl.json", "results/paper/pubmed.json",
     "Pubmed_PoS,Pubmed_PoS_Plus,Pubmed_SoP"),
    ("configs/paper/table_2.json", "results/paper/table2.json",
     "USAir_SEAL,Celegans_SEAL,Power_SEAL,USAir_GCN_DE,Celegans_GCN_DE,"
     "Power_GCN_DE"),
    ("configs/baseline_extra.json", "results/paper/pubmed_gae.json",
     "Pubmed_PoS_GAE"),
    ("configs/paper/scaled.json", "results/paper/scaled.json",
     "Cora_PoS_ScaLed,Cora_PoS_Plus_ScaLed,CiteSeer_PoS_ScaLed,"
     "CiteSeer_PoS_Plus_ScaLed"),
]


def main():
    for config, out, ids in GROUPS:
        print(f"=== phase2 group {out} ===", flush=True)
        try:
            sgrl_master_controller(config, out, only=ids, skip_existing=True)
        except Exception as e:  # keep going: later groups still run
            print(f"group {out} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
