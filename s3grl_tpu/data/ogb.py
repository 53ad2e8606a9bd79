"""OGB link-property-prediction dataset loader (offline).

Reference: sgrl_link_pred.py:826-838 — ``PygLinkPropPredDataset(name)`` +
``get_edge_split()`` with a ``NormalizeFeatures`` transform. This loader
consumes a **pre-downloaded** OGB dataset directory (the standard on-disk
layout produced by the ogb package); there is no network access, so a
missing directory raises a clean FileNotFoundError with instructions.

Expected layout under ``{data_root}/{name with - -> _}/``::

    raw/edge.csv.gz            # one "u,v" edge per line
    raw/num-node-list.csv.gz   # single integer
    raw/node-feat.csv.gz       # optional: N rows of F floats
    raw/edge_weight.csv.gz     # optional: E weights
    split/{scheme}/train.pt    # torch-pickled split dicts
    split/{scheme}/valid.pt
    split/{scheme}/test.pt

Split dicts come in the two OGB layouts handled by
``s3grl_tpu.data.split.OgbEdgeSplit`` (edge format and
source/target/target_node_neg format, reference utils.py:637-678).

Reference quirk documented: the vessel-specific column normalization at
sgrl_link_pred.py:830-838 is DEAD CODE there — the preceding
``startswith('ogbl')`` branch (:826) already catches ``ogbl-vessel``, so
every ogbl-* dataset gets plain NormalizeFeatures. We reproduce the live
behavior.
"""
from __future__ import annotations

import glob
import gzip
import os
from typing import Optional, Tuple

import numpy as np

from s3grl_tpu.data.graph import Graph, coalesce_edges, normalize_features, to_undirected
from s3grl_tpu.data.split import OgbEdgeSplit


def _read_csv_gz(path: str, dtype) -> np.ndarray:
    with gzip.open(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def _to_numpy_tree(obj):
    """Recursively convert a torch-pickled split dict to numpy."""
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if hasattr(obj, "numpy"):  # torch tensor
        return obj.detach().cpu().numpy()
    return np.asarray(obj)


def load_ogb_dataset(
    name: str,
    data_root: str = "dataset",
    normalize: bool = True,
) -> Tuple[Graph, OgbEdgeSplit]:
    """Load a pre-downloaded ogbl-* dataset; returns (Graph, OgbEdgeSplit).

    The observed graph is the raw edge list symmetrized (SEAL treats all
    graphs as undirected; multi-edges coalesced with summed weights).
    """
    dir_name = name.replace("-", "_")
    base = os.path.join(data_root, dir_name)
    raw = os.path.join(base, "raw")
    if not os.path.isdir(raw):
        raise FileNotFoundError(
            f"OGB dataset directory {base!r} not found. Pre-download it on "
            f"a machine with network access via "
            f"`PygLinkPropPredDataset(name={name!r}, root={data_root!r})` "
            f"(or `LinkPropPredDataset`) and copy the directory here."
        )

    edges = _read_csv_gz(os.path.join(raw, "edge.csv.gz"), np.int64)
    num_nodes = int(
        _read_csv_gz(os.path.join(raw, "num-node-list.csv.gz"), np.int64)[0, 0]
    )

    x: Optional[np.ndarray] = None
    feat_path = os.path.join(raw, "node-feat.csv.gz")
    if os.path.exists(feat_path):
        x = _read_csv_gz(feat_path, np.float32)
        if normalize:
            x = normalize_features(x)

    edge_index = to_undirected(edges.T.astype(np.int32))
    w_path = os.path.join(raw, "edge_weight.csv.gz")
    edge_weight = None
    if os.path.exists(w_path):
        w = _read_csv_gz(w_path, np.float32).reshape(-1)
        both = np.concatenate([edges.T, edges.T[::-1]], axis=1)
        edge_index, edge_weight = coalesce_edges(
            both.astype(np.int64), np.concatenate([w, w]), num_nodes
        )
        edge_index = edge_index.astype(np.int32)

    graph = Graph(
        num_nodes=num_nodes,
        edge_index=edge_index,
        edge_weight=edge_weight,
        x=x,
    )

    split_dirs = sorted(glob.glob(os.path.join(base, "split", "*")))
    if not split_dirs:
        raise FileNotFoundError(f"no split directory under {base!r}")
    split_edge = {}
    for split in ("train", "valid", "test"):
        pt = os.path.join(split_dirs[0], f"{split}.pt")
        if not os.path.exists(pt):
            raise FileNotFoundError(f"missing OGB split file {pt!r}")
        import torch  # torch-cpu is in the image; used only to unpickle

        split_edge[split] = _to_numpy_tree(
            torch.load(pt, map_location="cpu", weights_only=False)
        )

    return graph, OgbEdgeSplit(
        split_edge=split_edge, num_nodes=num_nodes, edge_index=graph.edge_index
    )
