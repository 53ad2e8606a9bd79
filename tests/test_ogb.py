"""OGB family: split-dict formats, offline loader, valedges, e2e Hits/MRR.

Reference semantics: utils.py:637-678 (get_pos_neg_edges OGB branches),
sgrl_link_pred.py:826-838 (PygLinkPropPredDataset load), :1018-1028
(use_valedges_as_input).
"""
import gzip
import os

import numpy as np
import pytest

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.graph import Graph, to_undirected
from s3grl_tpu.data.io import load_dataset
from s3grl_tpu.data.split import OgbEdgeSplit, do_edge_split
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.utils.seeding import seed_everything


def _toy_graph(n=40, seed=0):
    rng = np.random.default_rng(seed)
    ei = to_undirected(rng.integers(0, n, size=(2, 3 * n)).astype(np.int32))
    return Graph(num_nodes=n, edge_index=ei)


def test_ogb_split_edge_format():
    """Edge-format dict: fresh negatives for EVERY split when the train
    dict lacks edge_neg (reference quirk, utils.py:640-648)."""
    g = _toy_graph()
    rng = np.random.default_rng(1)
    split_edge = {
        "train": {"edge": np.array([[0, 1], [2, 3], [4, 5], [6, 7]])},
        "valid": {
            "edge": np.array([[8, 9], [10, 11]]),
            "edge_neg": np.array([[1, 3]]),  # must be IGNORED (quirk)
        },
        "test": {"edge": np.array([[12, 13], [14, 15]])},
    }
    s = OgbEdgeSplit(split_edge, g.num_nodes, g.edge_index)
    pos, neg = s.pos_neg("train", rng=rng, neg_ratio=2)
    assert pos.shape == (4, 2) and neg.shape == (8, 2)
    pos, neg = s.pos_neg("valid", rng=rng)
    assert pos.shape == (2, 2) and neg.shape == (2, 2)
    # sampled negatives avoid observed edges and self loops
    keys = set((g.edge_index[0].astype(int) * g.num_nodes
                + g.edge_index[1]).tolist())
    for a, b in neg:
        assert a != b and int(a) * g.num_nodes + int(b) not in keys

    # presampled-negative variant (ogbl-vessel): edge_neg honored everywhere
    split_edge2 = {
        "train": {"edge": split_edge["train"]["edge"],
                  "edge_neg": np.array([[3, 0], [5, 1]])},
        "valid": {"edge": np.array([[8, 9]]),
                  "edge_neg": np.array([[7, 2]])},
        "test": {"edge": np.array([[12, 13]]),
                 "edge_neg": np.array([[9, 4]])},
    }
    s2 = OgbEdgeSplit(split_edge2, g.num_nodes, g.edge_index)
    _, neg = s2.pos_neg("valid", rng=rng)
    np.testing.assert_array_equal(neg, [[7, 2]])

    # percent subsampling
    pos, neg = s.pos_neg("train", percent=50.0, rng=rng)
    assert pos.shape == (2, 2)


def test_ogb_split_source_target_format():
    """source/target/target_node_neg format (utils.py:660-678): val/test
    negatives grouped K-per-positive in source order; train negatives are
    one fresh random target per positive."""
    g = _toy_graph()
    rng = np.random.default_rng(2)
    T, K = 6, 4
    src = np.arange(T)
    dst = np.arange(T) + 10
    tneg = np.arange(T * K).reshape(T, K) % g.num_nodes
    split_edge = {
        "train": {"source_node": src, "target_node": dst},
        "valid": {"source_node": src, "target_node": dst,
                  "target_node_neg": tneg},
        "test": {"source_node": src, "target_node": dst,
                 "target_node_neg": tneg},
    }
    s = OgbEdgeSplit(split_edge, g.num_nodes, g.edge_index)
    pos, neg = s.pos_neg("valid", rng=rng)
    assert pos.shape == (T, 2) and neg.shape == (T * K, 2)
    # grouping: the i-th positive's negatives are rows i*K..(i+1)*K-1,
    # sharing its source (repeat_interleave semantics)
    np.testing.assert_array_equal(neg[:, 0], np.repeat(src, K))
    np.testing.assert_array_equal(neg[:, 1], tneg.reshape(-1))

    pos, neg = s.pos_neg("train", rng=rng)
    assert neg.shape == (T, 2)
    np.testing.assert_array_equal(neg[:, 0], src)

    pos, neg = s.pos_neg("test", percent=50.0, rng=rng)
    assert pos.shape == (3, 2) and neg.shape == (3 * K, 2)


def _write_ogb_dir(root, name="ogbl_toy", with_feats=True, n=30,
                   source_target=False):
    import torch

    rng = np.random.default_rng(0)
    base = os.path.join(root, name)
    raw = os.path.join(base, "raw")
    os.makedirs(raw)
    edges = rng.integers(0, n, size=(80, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    with gzip.open(os.path.join(raw, "edge.csv.gz"), "wt") as f:
        for u, v in edges:
            f.write(f"{u},{v}\n")
    with gzip.open(os.path.join(raw, "num-node-list.csv.gz"), "wt") as f:
        f.write(f"{n}\n")
    if with_feats:
        x = rng.random((n, 5)).astype(np.float32)
        with gzip.open(os.path.join(raw, "node-feat.csv.gz"), "wt") as f:
            for row in x:
                f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    sp = os.path.join(base, "split", "time")
    os.makedirs(sp)
    if source_target:
        T = 8
        for split in ("train", "valid", "test"):
            d = {"source_node": torch.arange(T),
                 "target_node": torch.arange(T) + 12}
            if split != "train":
                d["target_node_neg"] = torch.randint(0, n, (T, 3))
            torch.save(d, os.path.join(sp, f"{split}.pt"))
    else:
        for split in ("train", "valid", "test"):
            d = {"edge": torch.as_tensor(edges[:20].copy())}
            if split != "train":
                d["edge_neg"] = torch.randint(0, n, (10, 2))
            torch.save(d, os.path.join(sp, f"{split}.pt"))
    return base


def test_ogb_loader_roundtrip(tmp_path):
    _write_ogb_dir(str(tmp_path), "ogbl_toy")
    from s3grl_tpu.data.ogb import load_ogb_dataset

    g, split = load_ogb_dataset("ogbl-toy", str(tmp_path))
    assert g.num_nodes == 30 and g.x.shape == (30, 5)
    # NormalizeFeatures parity: non-zero rows sum to 1
    s = g.x.sum(axis=1)
    np.testing.assert_allclose(s[s > 0], 1.0, rtol=1e-5)
    # symmetrized observed graph
    pairs = {(int(a), int(b)) for a, b in g.edge_index.T}
    assert all((b, a) in pairs for a, b in pairs)
    assert isinstance(split, OgbEdgeSplit)
    assert split.split_edge["valid"]["edge"].shape == (20, 2)
    pos, neg = split.pos_neg("valid", rng=np.random.default_rng(0))
    assert pos.shape == (20, 2)


def test_ogb_loader_missing_dir(tmp_path):
    from s3grl_tpu.data.ogb import load_ogb_dataset

    with pytest.raises(FileNotFoundError, match="Pre-download"):
        load_ogb_dataset("ogbl-absent", str(tmp_path))


def test_coauthor_loader(tmp_path):
    """Coauthor raw npz (scipy-CSR bundle) -> Graph with normalized feats."""
    import scipy.sparse as ssp

    rng = np.random.default_rng(0)
    n = 25
    a = ssp.random(n, n, density=0.1, random_state=0, format="csr")
    a = ((a + a.T) > 0).astype(np.float32)
    attr = ssp.random(n, 7, density=0.4, random_state=1, format="csr")
    raw = tmp_path / "CS" / "raw"
    raw.mkdir(parents=True)
    np.savez(
        raw / "ms_academic_cs.npz",
        adj_data=a.data, adj_indices=a.indices, adj_indptr=a.indptr,
        adj_shape=np.array(a.shape),
        attr_data=attr.data, attr_indices=attr.indices,
        attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
    )
    g = load_dataset("CS", str(tmp_path))
    assert g.num_nodes == n and g.x.shape == (n, 7)
    with pytest.raises(FileNotFoundError, match="Pre-download"):
        load_dataset("Physics", str(tmp_path))


def test_attributed_loader(tmp_path):
    import scipy.sparse as ssp

    raw = tmp_path / "BlogCatalog" / "raw"
    raw.mkdir(parents=True)
    attr = ssp.random(20, 6, density=0.5, random_state=0, format="csr")
    ssp.save_npz(raw / "attrs.npz", attr)
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 20, size=(50, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    np.savetxt(raw / "edgelist.txt", edges, fmt="%d")
    g = load_dataset("attributed-BlogCatalog", str(tmp_path))
    assert g.num_nodes == 20 and g.x.shape == (20, 6)


OGB_BASE = dict(
    model="SIGN",
    sign_type="PoS",
    optimize_sign=True,
    init_features="degree",
    use_feature=True,
    sign_k=2,
    node_label="zo",
    hidden_channels=32,
    batch_size=32,
    lr=1e-3,
    epochs=2,
    num_hops=1,
    seed=1,
    extract_batch_size=64,
    max_subgraph_nodes=256,
    subgraph_buckets=(64, 256),
    delete_dataset=True,
)


def _usair_ogb_splits(source_target=False):
    rng, _ = seed_everything(1)
    g = load_dataset("USAir")
    tg, es = do_edge_split(g, rng=rng)
    if not source_target:
        split_edge = {
            "train": {"edge": es.train_pos},  # no edge_neg: collab-style
            "valid": {"edge": es.valid_pos},
            "test": {"edge": es.test_pos},
        }
    else:
        rng2 = np.random.default_rng(3)
        split_edge = {"train": {"source_node": es.train_pos[:, 0],
                                "target_node": es.train_pos[:, 1]}}
        for split, pos in (("valid", es.valid_pos), ("test", es.test_pos)):
            split_edge[split] = {
                "source_node": pos[:, 0],
                "target_node": pos[:, 1],
                "target_node_neg": rng2.integers(
                    0, tg.num_nodes, size=(len(pos), 5)
                ),
            }
    return tg, OgbEdgeSplit(split_edge, tg.num_nodes, tg.edge_index)


def test_ogb_e2e_hits():
    """End-to-end Hits@K on an OGB edge-format split (hits is the metric
    auto-selected for ogbl-* datasets, sgrl_link_pred.py:1012-1014)."""
    tg, ogb_split = _usair_ogb_splits()
    cfg = RunConfig(
        **{**OGB_BASE, "dataset": "ogbl-collab", "train_percent": 20.0,
           "val_percent": 100.0, "test_percent": 100.0}
    )
    prep, best, ttimes, itimes, nparams = run_sgrl_learning(
        cfg, graph=tg, edge_split=ogb_split
    )
    assert 0.0 <= best <= 100.0
    assert nparams > 0 and len(ttimes) == 2


def test_ogb_e2e_mrr():
    """End-to-end MRR on a source/target/target_node_neg split (the metric
    auto-selected for ogbl-citation*, sgrl_link_pred.py:1008-1009)."""
    tg, ogb_split = _usair_ogb_splits(source_target=True)
    cfg = RunConfig(
        **{**OGB_BASE, "dataset": "ogbl-citation2", "train_percent": 20.0,
           "val_percent": 100.0, "test_percent": 100.0}
    )
    _, best, _, _, _ = run_sgrl_learning(cfg, graph=tg, edge_split=ogb_split)
    # positives scored against 5 random negatives each: MRR must beat the
    # 1/(5+1) random-rank expectation after training
    assert best > 100.0 / 6.0


def test_use_valedges_as_input():
    """Valid positives joined into the observed graph
    (sgrl_link_pred.py:1018-1028): the run completes and the extraction
    graph contains the valid edges."""
    rng, _ = seed_everything(1)
    g = load_dataset("USAir")
    tg, es = do_edge_split(g, rng=rng)
    cfg = RunConfig(
        **{**OGB_BASE, "dataset": "USAir", "use_valedges_as_input": True,
           "train_percent": 10.0, "val_percent": 50.0, "test_percent": 50.0,
           "epochs": 1}
    )
    _, best, _, _, _ = run_sgrl_learning(cfg, graph=tg, edge_split=es)
    assert 0.0 <= best <= 100.0
