"""Run the ScaLed-suite preprocessing-ratio analysis (calc_ratio mode).

Protocol: /root/reference/configs/paper/scaled.json + utils.py:319-422 —
for Cora and CiteSeer, compare SEAL hop-based extraction (hops=3) against
ScaLed random-walk extraction (m=3, M=20) on the train split, averaged over
5 seeds; emit ``calc_ratio/preprocessing_stats_{ds}_train.json`` per dataset
and a combined ``RATIOS_r02.json`` at the repo root.

CPU-only (JAX_PLATFORMS=cpu is set before import) so it can run alongside
TPU jobs.
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from s3grl_tpu.data.io import load_dataset  # noqa: E402
from s3grl_tpu.data.split import do_edge_split  # noqa: E402
from s3grl_tpu.analysis import calc_ratio_helper  # noqa: E402
from s3grl_tpu.sampling.extraction import DeviceGraph  # noqa: E402
from s3grl_tpu.utils.seeding import seed_everything  # noqa: E402

DATASETS = ("Cora", "CiteSeer")
NUM_HOPS = 3          # scaled.json: hops=3 for the SEAL variant
RW_M, RW_MM = 3, 20   # scaled.json: m=3, M=20 for the ScaLed variant
SEEDS = (1, 2, 3, 4, 5)
MAX_NODES = 512


def main() -> None:
    combined: dict = {}
    for ds_name in DATASETS:
        stats = None
        for seed in SEEDS:
            rng, _ = seed_everything(seed)
            full = load_dataset(ds_name)
            graph, edge_split = do_edge_split(full, rng=rng)
            dg = DeviceGraph.from_graph(graph)
            stats = calc_ratio_helper(
                edge_split.train_pos,
                edge_split.train_neg,
                dg,
                num_hops=NUM_HOPS,
                max_nodes=MAX_NODES,
                rw_m=RW_M,
                rw_M=RW_MM,
                split="train",
                dataset_name=ds_name,
                seed=seed,
                final_seed=SEEDS[-1],
            )
            print(f"{ds_name} seed {seed} done", flush=True)
        combined[ds_name] = stats
    combined["protocol"] = {
        "suite": "configs/paper/scaled.json",
        "seal_hops": NUM_HOPS,
        "scaled_rw": {"m": RW_M, "M": RW_MM},
        "seeds": len(SEEDS),
        "split": "train (pos+neg)",
        "reference": "utils.py:319-422 calc_ratio protocol",
    }
    with open("RATIOS_r02.json", "w", encoding="utf-8") as f:
        json.dump(combined, f, indent=1)
    print(json.dumps(combined, indent=1))


if __name__ == "__main__":
    main()
