"""Raw dataset IO.

Covers the reference's dataset families without any torch/PyG dependency:

- SEAL ``edges.txt`` lists with node-id remapping
  (reference: data_utils.py:76-93 ``read_edges``/``read_label``)
- WalkPool ``.mat`` files, splitted and unsplitted
  (reference: data_utils.py:16-72)
- Planetoid raw pickles (Cora/CiteSeer/Pubmed), replacing the PyG
  ``Planetoid`` dataset class used at sgrl_link_pred.py:849-855.

All loaders return :class:`~s3grl_tpu.data.graph.Graph` (plus split edges for
pre-split data).
"""
from __future__ import annotations

import os
import pickle
import sys
from typing import Optional

import numpy as np

from s3grl_tpu.data.graph import Graph, normalize_features, to_undirected

SEAL_TXT_DATASETS = (
    "USAir", "NS", "Power", "Celegans", "Router", "PB", "Ecoli", "Yeast",
    "facebook", "email", "celegans_small",
)
PLANETOID_DATASETS = ("Cora", "CiteSeer", "Pubmed")


def read_label(seal_ds_path: str) -> dict[str, int]:
    """Sorted-string node-id remapping (reference: data_utils.py:86-93)."""
    nodes: list[str] = []
    with open(os.path.join(seal_ds_path, "edges.txt")) as ef:
        for line in ef.readlines():
            nodes.extend(line.strip().split()[:2])
    nodes = sorted(set(nodes))
    return {old_id: new_id for new_id, old_id in enumerate(nodes)}


def read_edges(seal_ds_path: str, node_id_mapping: dict[str, int]) -> np.ndarray:
    """Edge list under the remapping (reference: data_utils.py:76-84)."""
    edges = []
    with open(os.path.join(seal_ds_path, "edges.txt")) as f:
        for line in f.readlines():
            node1, node2 = line.strip().split()[:2]
            edges.append([node_id_mapping[node1], node_id_mapping[node2]])
    return np.asarray(edges, dtype=np.int32).T  # [2, E]


def load_seal_txt(data_root: str, name: str) -> Graph:
    """Load a SEAL .txt dataset (reference: sgrl_link_pred.py:859-895)."""
    path = os.path.join(data_root, "link_prediction", name.lower())
    if not os.path.exists(path):
        raise FileNotFoundError(f"SEAL dataset path not found: {path}")
    mapping = read_label(path)
    edge_index = read_edges(path, mapping)
    edge_index = to_undirected(edge_index)
    num_nodes = int(edge_index.max()) + 1
    return Graph(num_nodes=num_nodes, edge_index=edge_index)


def _parse_index_file(path: str) -> np.ndarray:
    with open(path) as f:
        return np.asarray([int(line.strip()) for line in f], dtype=np.int64)


def load_planetoid(data_root: str, name: str, normalize: bool = True) -> Graph:
    """Load Cora/CiteSeer/Pubmed from the standard ``ind.*`` raw pickles.

    Replaces PyG ``Planetoid`` + ``NormalizeFeatures``
    (reference: sgrl_link_pred.py:849-855). Follows the canonical Planetoid
    assembly: x/tx/allx stacked with the test split reordered by
    ``test.index`` (and CiteSeer's isolated test nodes zero-filled).
    """
    lname = name.lower()
    raw = os.path.join(data_root, lname, "raw")
    objs = {}
    for ext in ("x", "tx", "allx", "graph"):
        fp = os.path.join(raw, f"ind.{lname}.{ext}")
        with open(fp, "rb") as f:
            if sys.version_info > (3, 0):
                objs[ext] = pickle.load(f, encoding="latin1")
            else:  # pragma: no cover
                objs[ext] = pickle.load(f)
    test_idx = _parse_index_file(os.path.join(raw, f"ind.{lname}.test.index"))

    x = np.asarray(objs["x"].todense(), dtype=np.float32)
    tx = np.asarray(objs["tx"].todense(), dtype=np.float32)
    allx = np.asarray(objs["allx"].todense(), dtype=np.float32)

    # Canonical Planetoid assembly (Kipf/Welling gcn utils / PyG read_planetoid):
    # stack allx+tx, then permute the test rows into their true node slots.
    test_idx_reorder = test_idx
    test_idx_range = np.sort(test_idx_reorder)
    if lname == "citeseer":
        # CiteSeer has isolated test nodes missing from tx; zero-fill them so
        # the id range [min, max] of test indices is contiguous.
        full = np.arange(test_idx_range[0], test_idx_range[-1] + 1)
        tx_ext = np.zeros((len(full), tx.shape[1]), dtype=np.float32)
        tx_ext[test_idx_range - test_idx_range[0]] = tx
        tx = tx_ext

    features = np.vstack([allx, tx])
    features[test_idx_reorder] = features[test_idx_range]

    graph = objs["graph"]
    rows, cols = [], []
    for src, nbrs in graph.items():
        for dst in nbrs:
            rows.append(src)
            cols.append(dst)
    edge_index = np.asarray([rows, cols], dtype=np.int32)
    edge_index = to_undirected(edge_index)
    # Drop self loops (PyG Planetoid keeps the graph as-is but the standard
    # pickle contains a handful of self-edges; PyG removes duplicates only).
    num_nodes = features.shape[0]
    if normalize:
        features = normalize_features(features)
    return Graph(num_nodes=num_nodes, edge_index=edge_index, x=features)


def load_mat_unsplitted(data_root: str, name: str) -> Graph:
    """Load an unsplitted .mat adjacency (reference: data_utils.py:60-72)."""
    import scipy.io as sio

    net = sio.loadmat(os.path.join(data_root, f"{name}.mat"))
    A = net["net"].tocoo()
    edge_index = np.stack([A.row, A.col]).astype(np.int32)
    edge_index = to_undirected(edge_index)
    num_nodes = int(edge_index.max()) + 1
    x = None
    if "group" in net:
        try:
            x = np.asarray(net["group"].todense(), dtype=np.float32)
        except AttributeError:
            x = np.asarray(net["group"], dtype=np.float32)
    return Graph(num_nodes=num_nodes, edge_index=edge_index, x=x)


def load_mat_splitted(
    data_root: str,
    name: str,
    data_split_num: int,
    test_ratio: float,
    val_ratio: float,
    rng: np.random.Generator,
):
    """Load a pre-split WalkPool .mat (reference: data_utils.py:16-58).

    Returns (Graph over train positives, split dict of [2, E] arrays).
    The stored train positives are re-split into train/val with ``val_ratio``
    using the provided seeded RNG (reference shuffles with np.random).
    """
    import scipy.io as sio

    fname = f"{name}_split_{data_split_num}"
    sub = "splitted_0_5" if test_ratio == 0.5 else "splitted"
    net = sio.loadmat(os.path.join(data_root, sub, f"{fname}.mat"))

    def arr(k):
        return np.int64(net[k])  # [E, 2]

    train_pos, train_neg = arr("train_pos"), arr("train_neg")
    test_pos, test_neg = arr("test_pos"), arr("test_neg")

    n_pos = int(val_ratio * len(train_pos))
    perm = rng.permutation(len(train_pos))
    val_pos, train_pos = train_pos[perm[:n_pos]], train_pos[perm[n_pos:]]
    n_neg = int(val_ratio * len(train_neg))
    perm = rng.permutation(len(train_neg))
    val_neg, train_neg = train_neg[perm[:n_neg]], train_neg[perm[n_neg:]]

    split = {
        "train": {"edge": train_pos.T, "edge_neg": train_neg.T},
        "valid": {"edge": val_pos.T, "edge_neg": val_neg.T},
        "test": {"edge": test_pos.T, "edge_neg": test_neg.T},
    }
    num_nodes = 1 + max(
        int(a.max()) for a in (train_pos, test_pos, val_pos) if len(a)
    )
    edge_index = to_undirected(train_pos.T.astype(np.int32))
    g = Graph(num_nodes=num_nodes, edge_index=edge_index)
    return g, split


GEOM_GCN_DATASETS = (
    "Cornell", "Texas", "Wisconsin",  # WebKB (sgrl_link_pred.py:906-908)
    "chameleon", "crocodile", "squirrel",  # WikipediaNetwork (:896-898)
    "film",
)


def load_geom_gcn(data_root: str, name: str, normalize: bool = True) -> Graph:
    """WebKB / WikipediaNetwork loader from geom-gcn raw files.

    Same on-disk format the reference's WalkPool loader reads
    (Software/WalkPooling/src/utils.py:453-524: tab-separated edge list +
    ``node_id \\t csv-features \\t label``; 'film' features are index lists
    into a 932-dim binary vector). PyG's WebKB/WikipediaNetwork classes
    consume the identical raw data, so graphs match the reference's
    (sgrl_link_pred.py:896-908) up to its NormalizeFeatures transform.
    """
    d = os.path.join(data_root, name.lower())
    feat_path = os.path.join(d, "out1_node_feature_label.txt")
    edge_path = os.path.join(d, "out1_graph_edges.txt")
    if not os.path.exists(feat_path):
        raise FileNotFoundError(
            f"{name}: geom-gcn raw feature file missing ({feat_path}); the "
            "reference downloads this dataset at runtime, which requires "
            "network access."
        )
    feats = {}
    with open(feat_path) as f:
        f.readline()
        for line in f:
            nid, fs, _label = line.rstrip().split("\t")
            if name.lower() == "film":
                vec = np.zeros(932, dtype=np.float32)
                vec[np.array(fs.split(","), dtype=np.int64)] = 1.0
            else:
                vec = np.array(fs.split(","), dtype=np.float32)
            feats[int(nid)] = vec
    n = max(feats) + 1
    x = np.zeros((n, len(next(iter(feats.values())))), dtype=np.float32)
    for nid, vec in feats.items():
        x[nid] = vec
    edges = np.loadtxt(edge_path, dtype=np.int64, skiprows=1)
    ei = to_undirected(edges.T.astype(np.int32))
    if normalize:
        x = normalize_features(x)
    return Graph(edge_index=ei, num_nodes=n, x=x)


def load_dataset(
    name: str, data_root: str = "/root/reference/data", normalize: bool = True
) -> Graph:
    """Dataset dispatch by family (reference: sgrl_link_pred.py:826-927)."""
    if name in PLANETOID_DATASETS:
        return load_planetoid(data_root, name, normalize=normalize)
    if name in SEAL_TXT_DATASETS or name.lower() in [
        d.lower() for d in SEAL_TXT_DATASETS
    ]:
        return load_seal_txt(data_root, name)
    if name in GEOM_GCN_DATASETS or name.lower() in [
        d.lower() for d in GEOM_GCN_DATASETS
    ]:
        for candidate in (
            os.path.join(data_root, "new_data"),
            os.path.join(
                os.path.dirname(data_root.rstrip("/")),
                "Software", "WalkPooling", "data", "new_data",
            ),
        ):
            if os.path.isdir(os.path.join(candidate, name.lower())):
                return load_geom_gcn(candidate, name, normalize=normalize)
        raise FileNotFoundError(f"geom-gcn raw data for {name} not found")
    if name in ("CS", "Physics"):
        return load_coauthor(data_root, name, normalize=normalize)
    if name.startswith("attributed"):
        # reference: args.dataset.split('-')[-1] (sgrl_link_pred.py:842)
        return load_attributed(data_root, name.split("-")[-1],
                               normalize=normalize)
    mat_path = os.path.join(data_root, f"{name}.mat")
    if os.path.exists(mat_path):
        return load_mat_unsplitted(data_root, name)
    raise NotImplementedError(f"dataset {name} is not yet supported.")


def dataset_source_paths(
    name: str, data_root: str = "/root/reference/data"
) -> list[str]:
    """Existing raw files (or directories) backing a dataset, for cache
    fingerprinting (the precompute-artifact cache must invalidate when the
    raw data changes or lives under a different root)."""
    paths: list[str] = []
    if name in PLANETOID_DATASETS:
        d = os.path.join(data_root, name.lower(), "raw")
        if not os.path.isdir(d):
            d = os.path.join(data_root, name.lower())
        if os.path.isdir(d):
            paths = [os.path.join(d, f) for f in sorted(os.listdir(d))]
    elif name in SEAL_TXT_DATASETS or name.lower() in [
        d.lower() for d in SEAL_TXT_DATASETS
    ]:
        d = os.path.join(data_root, "link_prediction", name.lower())
        if os.path.isdir(d):
            paths = [os.path.join(d, f) for f in sorted(os.listdir(d))]
    else:
        mat = os.path.join(data_root, f"{name}.mat")
        if os.path.exists(mat):
            paths = [mat]
    return [p for p in paths if os.path.isfile(p)][:8]


COAUTHOR_DATASETS = ("CS", "Physics")
COAUTHOR_RAW = {"CS": "ms_academic_cs.npz", "Physics": "ms_academic_phy.npz"}


def load_coauthor(data_root: str, name: str, normalize: bool = True) -> Graph:
    """Coauthor CS/Physics from the pre-downloaded PyG raw npz
    (reference: sgrl_link_pred.py:916-918 uses ``Coauthor(path, name,
    transform=NormalizeFeatures())``; the raw file is a scipy-CSR bundle
    with adj_{data,indices,indptr,shape} + attr_{...} keys)."""
    import scipy.sparse as ssp

    path = os.path.join(data_root, name, "raw", COAUTHOR_RAW[name])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Coauthor raw file {path!r} not found. Pre-download with PyG "
            f"`Coauthor(root, {name!r})` on a networked machine and copy "
            f"the directory here."
        )
    with np.load(path, allow_pickle=True) as z:
        adj = ssp.csr_matrix(
            (z["adj_data"], z["adj_indices"], z["adj_indptr"]),
            shape=tuple(z["adj_shape"]),
        )
        attr = ssp.csr_matrix(
            (z["attr_data"], z["attr_indices"], z["attr_indptr"]),
            shape=tuple(z["attr_shape"]),
        )
    coo = adj.tocoo()
    edge_index = to_undirected(
        np.stack([coo.row, coo.col]).astype(np.int32)
    )
    x = np.asarray(attr.todense(), dtype=np.float32)
    if normalize:
        x = normalize_features(x)
    return Graph(num_nodes=adj.shape[0], edge_index=edge_index, x=x)


def load_attributed(data_root: str, name: str, normalize: bool = True) -> Graph:
    """AttributedGraphDataset (reference: sgrl_link_pred.py:841-847,
    dataset names ``attributed-{BlogCatalog,Flickr,...}``) from the
    pre-downloaded PyG raw dir: ``attrs.npz`` (scipy CSR or dense) +
    ``edgelist.txt`` (u v per line)."""
    import scipy.sparse as ssp

    raw = os.path.join(data_root, name, "raw")
    attrs_path = os.path.join(raw, "attrs.npz")
    edges_path = os.path.join(raw, "edgelist.txt")
    if not (os.path.exists(attrs_path) and os.path.exists(edges_path)):
        raise FileNotFoundError(
            f"AttributedGraphDataset raw files not found under {raw!r} "
            f"(need attrs.npz + edgelist.txt). Pre-download with PyG "
            f"`AttributedGraphDataset(root, {name!r})` and copy here."
        )
    attr = ssp.load_npz(attrs_path)
    x = np.asarray(attr.todense(), dtype=np.float32)
    edges = np.loadtxt(edges_path, dtype=np.int64, ndmin=2)
    edge_index = to_undirected(edges.T.astype(np.int32))
    if normalize:
        x = normalize_features(x)
    return Graph(num_nodes=x.shape[0], edge_index=edge_index, x=x)
