"""Preprocessing-cost analyzer (calc_ratio mode).

Reference: utils.py:319-422 — SEAL-vs-ScaLed subgraph node/edge count ratios
accumulated across 5 seeds in an npz scratch file, emitted to
``calc_ratio/preprocessing_stats_{ds}_{split}.json``.

TPU version: node/edge counts come from the batched extractor (one device
pass per variant instead of a per-link python loop); the accumulate-across-
seeds protocol and the output JSON schema match the reference.
"""
from __future__ import annotations

import json
import os
from pprint import pprint

import jax.numpy as jnp
import numpy as np

from s3grl_tpu.sampling.extraction import DeviceGraph, extract_subgraphs


def subgraph_counts(
    dg: DeviceGraph,
    links: np.ndarray,
    *,
    num_hops: int,
    max_nodes: int,
    rw_m: int = 0,
    rw_M: int = 0,
    seed: int = 1,
    batch_size: int = 256,
):
    """(num_nodes [L], num_edges [L]) for SEAL BFS or ScaLed random-walk
    extraction of every link."""
    from s3grl_tpu.sampling.random_walk import extract_rw_subgraphs

    L = len(links)
    nodes_out = np.empty(L, dtype=np.int64)
    edges_out = np.empty(L, dtype=np.int64)
    seeds = (np.int64(seed) * 1_000_003 + np.arange(L)).astype(np.int32)
    for s in range(0, L, batch_size):
        lb = links[s : s + batch_size].astype(np.int32)
        ls = seeds[s : s + batch_size]
        bsz = len(lb)
        if bsz < batch_size:
            lb = np.concatenate([lb, np.tile(lb[-1:], (batch_size - bsz, 1))])
            ls = np.concatenate([ls, np.tile(ls[-1:], batch_size - bsz)])
        if rw_m and rw_M:
            sub = extract_rw_subgraphs(
                dg, jnp.asarray(lb), jnp.asarray(ls), rw_m=rw_m, rw_M=rw_M,
                max_nodes=max_nodes,
            )
        else:
            sub = extract_subgraphs(
                dg, jnp.asarray(lb), num_hops=num_hops, max_nodes=max_nodes,
                link_seeds=jnp.asarray(ls),
            )
        nodes_out[s : s + bsz] = np.asarray(sub.node_mask.sum(axis=1))[:bsz]
        edges_out[s : s + bsz] = np.asarray((sub.nbr_w > 0).sum(axis=(1, 2)))[:bsz]
    return nodes_out, edges_out


def calc_ratio_helper(
    pos_links: np.ndarray,
    neg_links: np.ndarray,
    dg: DeviceGraph,
    *,
    num_hops: int,
    max_nodes: int,
    rw_m: int,
    rw_M: int,
    split: str = "train",
    dataset_name: str = "",
    seed: int = 1,
    out_dir: str = "calc_ratio",
    scratch_dir: str = ".",
    final_seed: int = 5,
):
    """Accumulate SEAL vs ScaLed (named SWEAL in the reference) count ratios
    across seeds; on seed == final_seed emit the stats JSON (utils.py:348-422)."""
    links = np.concatenate([pos_links, neg_links], axis=0)
    seal_n, seal_e = subgraph_counts(
        dg, links, num_hops=num_hops, max_nodes=max_nodes, seed=seed
    )
    sweal_n, sweal_e = subgraph_counts(
        dg, links, num_hops=num_hops, max_nodes=max_nodes, rw_m=rw_m, rw_M=rw_M,
        seed=seed,
    )

    scratch = os.path.join(scratch_dir, f"saved_calc_ratio{dataset_name}.npz")
    if seed == 1 or not os.path.exists(scratch):
        acc = {k: np.array([], dtype=np.float64) for k in
               ("seal_nodes", "sweal_nodes", "seal_edges", "sweal_edges")}
    else:
        loaded = np.load(scratch)
        acc = {k: loaded[k] for k in loaded.files}

    acc["seal_nodes"] = np.append(acc["seal_nodes"], seal_n.mean())
    acc["sweal_nodes"] = np.append(acc["sweal_nodes"], sweal_n.mean())
    acc["seal_edges"] = np.append(acc["seal_edges"], seal_e.mean())
    acc["sweal_edges"] = np.append(acc["sweal_edges"], sweal_e.mean())
    np.savez(scratch, **acc)

    if seed == final_seed:
        stats = {
            split: {
                "SEAL average no of nodes": f"{round(acc['seal_nodes'].mean())}",
                "SWEAL average no of nodes": f"{round(acc['sweal_nodes'].mean())}",
                "SEAL average no of edges": f"{round(acc['seal_edges'].mean())}",
                "SWEAL average no of edges": f"{round(acc['sweal_edges'].mean())}",
            }
        }
        pprint(stats, sort_dicts=False)
        os.makedirs(out_dir, exist_ok=True)
        with open(
            os.path.join(
                out_dir, f"preprocessing_stats_{dataset_name}_{split}.json"
            ),
            "w",
            encoding="utf-8",
        ) as f:
            json.dump(stats, f, ensure_ascii=False)
        os.remove(scratch)
        return stats
    return None
