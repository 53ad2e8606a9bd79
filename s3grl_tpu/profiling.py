"""Profiling and run-stats collection.

Reference: profiler_utils.py (decorator-gathered per-epoch CUDA stats
aggregated into ``stats/stats_{suffix}.json``) and
parsers/parse_profiling_data.py (offline collation across seeds).

TPU equivalents: per-epoch wall times come from the training engines;
device-memory stats come from ``jax.local_devices()[0].memory_stats()``;
optional XLA trace capture via ``jax.profiler.trace`` writes xplane files
viewable in TensorBoard/XProf. The output JSON keeps the reference's field
names (GPU-specific fields map to their TPU analogs) so downstream parsing
keeps working.
"""
from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import Optional

import numpy as np


def device_memory_stats() -> dict:
    """Current accelerator memory stats (TPU analog of torch.cuda stats)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    mb = 1.0 / (1024 * 1024)
    return {
        "max_allocated_mb": stats.get("peak_bytes_in_use", 0) * mb,
        "allocated_mb": stats.get("bytes_in_use", 0) * mb,
        "reserved_mb": stats.get("bytes_reservable_limit", 0) * mb,
        "total_mb": stats.get("bytes_limit", 0) * mb,
    }


def count_parameters(params) -> int:
    import jax

    return int(
        sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    )


def model_size_mb(params) -> float:
    import jax

    return float(
        sum(p.size * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params))
        / (1024 * 1024)
    )


@contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture an XLA profiler trace (xplane) if log_dir given."""
    import jax

    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def profile_helper(
    epoch_times,
    inference_times,
    total_prep_time: float,
    params,
    dataset_num_links: int,
    stats_suffix: str,
    out_dir: str = "stats",
) -> dict:
    """Aggregate run stats into stats/stats_{suffix}.json.

    Mirrors profiler_utils.py:10-66's schema: mean ± std train time, inference
    times, prep time, memory stats, model size, param count, dataset size.
    """
    epoch_times = np.asarray(epoch_times, dtype=np.float64)
    inference_times = np.asarray(inference_times, dtype=np.float64)
    mem = device_memory_stats()

    def ms(arr):
        if arr.size == 0:
            return {"mean": 0.0, "std": 0.0}
        return {
            "mean": float(arr.mean()),
            "std": float(arr.std()) if arr.size > 1 else 0.0,
        }

    stats = {
        "train_time_per_epoch_s": ms(epoch_times),
        "inference_time_per_epoch_s": ms(inference_times),
        "total_prep_time_s": float(total_prep_time),
        "device_memory": mem,
        "model_size_mb": model_size_mb(params),
        "num_parameters": count_parameters(params),
        "dataset_num_links": int(dataset_num_links),
    }
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"stats_{stats_suffix}.json")
    with open(path, "w") as f:
        json.dump(stats, f, indent=2)
    return stats


def parse_profiling_data(stats_dir: str = "stats") -> dict:
    """Offline collation across runs/seeds (parsers/parse_profiling_data.py).

    Groups stats files by (model, dataset) prefix and averages numeric fields;
    emits ``combined_profiling_results.json`` plus a CSV.
    """
    import csv
    import re
    from collections import defaultdict

    groups = defaultdict(list)
    for fname in sorted(os.listdir(stats_dir)):
        if not (fname.startswith("stats_") and fname.endswith(".json")):
            continue
        m = re.match(r"stats_(.+)_seed_\d+.*\.json", fname)
        key = m.group(1) if m else fname[len("stats_") : -len(".json")]
        with open(os.path.join(stats_dir, fname)) as f:
            groups[key].append(json.load(f))

    combined = {}
    for key, runs in groups.items():
        combined[key] = {
            "runs": len(runs),
            "train_time_per_epoch_s": float(
                np.mean([r["train_time_per_epoch_s"]["mean"] for r in runs])
            ),
            "inference_time_per_epoch_s": float(
                np.mean([r["inference_time_per_epoch_s"]["mean"] for r in runs])
            ),
            "total_prep_time_s": float(
                np.mean([r["total_prep_time_s"] for r in runs])
            ),
            "max_allocated_mb": float(
                np.mean([r["device_memory"]["max_allocated_mb"] for r in runs])
            ),
            "num_parameters": float(np.mean([r["num_parameters"] for r in runs])),
        }

    out_json = os.path.join(stats_dir, "combined_profiling_results.json")
    with open(out_json, "w") as f:
        json.dump(combined, f, indent=2)
    out_csv = os.path.join(stats_dir, "collated_csv.csv")
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        cols = [
            "key", "runs", "train_time_per_epoch_s", "inference_time_per_epoch_s",
            "total_prep_time_s", "max_allocated_mb", "num_parameters",
        ]
        writer.writerow(cols)
        for key, row in combined.items():
            writer.writerow([key] + [row[c] for c in cols[1:]])
    return combined
