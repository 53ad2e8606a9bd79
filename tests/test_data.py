"""Data layer tests: IO, splits, graph container, metrics."""
import numpy as np
import pytest

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.graph import Graph, coalesce_edges, normalize_features, to_undirected
from s3grl_tpu.data.io import load_dataset, load_planetoid, load_seal_txt
from s3grl_tpu.data.split import do_edge_split, get_pos_neg_edges
from s3grl_tpu.train.metrics import (
    average_precision_score,
    evaluate_hits,
    evaluate_mrr,
    roc_auc_score,
)
from s3grl_tpu.utils.seeding import seed_everything

DATA_ROOT = "/root/reference/data"


def test_to_undirected():
    ei = np.array([[0, 1, 2], [1, 2, 0]], dtype=np.int32)
    sym = to_undirected(ei)
    pairs = set(map(tuple, sym.T.tolist()))
    assert pairs == {(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)}


def test_coalesce():
    ei = np.array([[0, 0, 1], [1, 1, 0]], dtype=np.int32)
    w = np.array([1.0, 2.0, 5.0], dtype=np.float32)
    new_ei, new_w = coalesce_edges(ei, w, 3)
    assert new_ei.shape == (2, 2)
    d = {tuple(e): v for e, v in zip(new_ei.T.tolist(), new_w.tolist())}
    assert d[(0, 1)] == 3.0 and d[(1, 0)] == 5.0


def test_csr_matches_scipy():
    rng = np.random.default_rng(0)
    ei = rng.integers(0, 20, size=(2, 60)).astype(np.int32)
    ei = to_undirected(ei)
    g = Graph(num_nodes=20, edge_index=ei)
    row_ptr, col_idx, w = g.csr
    sp = g.scipy_csr()
    assert np.array_equal(row_ptr, sp.indptr)
    assert np.array_equal(col_idx, sp.indices)


def test_padded_adjacency():
    ei = np.array([[0, 0, 1, 2], [1, 2, 0, 0]], dtype=np.int32)
    g = Graph(num_nodes=3, edge_index=ei)
    nbr, nbr_w, deg = g.padded_adjacency(4)
    assert deg.tolist() == [2, 1, 1]
    assert set(nbr[0, :2].tolist()) == {1, 2}
    assert nbr_w[0, 2] == 0.0  # padding has zero weight


def test_load_usair():
    g = load_seal_txt(DATA_ROOT, "USAir")
    assert g.num_nodes == 332
    assert g.num_edges > 2000  # 2126 undirected edges -> ~4252 directed
    # undirected: every edge present in both directions
    keys = set(
        (int(a), int(b)) for a, b in zip(g.edge_index[0], g.edge_index[1])
    )
    assert all((b, a) in keys for (a, b) in list(keys)[:200])


def test_load_cora():
    g = load_planetoid(DATA_ROOT, "Cora")
    assert g.num_nodes == 2708
    assert g.x is not None and g.x.shape == (2708, 1433)
    # features are L1-normalized rows
    s = g.x.sum(axis=1)
    assert np.all(s <= 1.0 + 1e-5)
    assert g.num_edges > 10000  # 10556 directed


def test_load_dispatch():
    g = load_dataset("USAir", DATA_ROOT)
    assert g.num_nodes == 332


def test_edge_split_properties():
    rng, _ = seed_everything(1)
    g = load_seal_txt(DATA_ROOT, "USAir")
    train_g, split = do_edge_split(g, val_ratio=0.05, test_ratio=0.1, rng=rng)
    n_und = g.num_edges // 2
    assert len(split.valid_pos) == int(0.05 * n_und)
    assert len(split.test_pos) == int(0.1 * n_und)
    # train positives are symmetrized: count = 2 * (n_und - n_v - n_t)
    expect_train = 2 * (n_und - len(split.valid_pos) - len(split.test_pos))
    assert len(split.train_pos) == expect_train
    assert len(split.train_neg) == len(split.train_pos)
    # observed graph = train positives only
    assert train_g.num_edges == expect_train
    all_keys = set(
        (int(a), int(b)) for a, b in zip(g.edge_index[0], g.edge_index[1])
    )
    train_keys = set(
        (int(a), int(b)) for a, b in zip(train_g.edge_index[0], train_g.edge_index[1])
    )
    # train negatives exclude train positives and self loops only (reference
    # parity, utils.py:597-600: negative_sampling over train edges + selfloops)
    for e in split.train_neg[:500]:
        assert (int(e[0]), int(e[1])) not in train_keys
        assert e[0] != e[1]
    # val/test negatives exclude ALL real edges
    for e in split.valid_neg:
        assert (int(e[0]), int(e[1])) not in all_keys
    # val/test positives disjoint from train graph
    for e in np.concatenate([split.valid_pos, split.test_pos]):
        assert (int(e[0]), int(e[1])) not in train_keys


def test_edge_split_seeded_reproducible():
    g = load_seal_txt(DATA_ROOT, "USAir")
    rng1, _ = seed_everything(7)
    _, s1 = do_edge_split(g, rng=rng1)
    rng2, _ = seed_everything(7)
    _, s2 = do_edge_split(g, rng=rng2)
    assert np.array_equal(s1.test_pos, s2.test_pos)
    assert np.array_equal(s1.train_neg, s2.train_neg)


def test_get_pos_neg_edges_percent():
    rng, _ = seed_everything(1)
    g = load_seal_txt(DATA_ROOT, "USAir")
    _, split = do_edge_split(g, rng=rng)
    pos, neg = get_pos_neg_edges("train", split, percent=50.0, rng=rng)
    assert len(pos) == int(0.5 * len(split.train_pos))


@pytest.mark.parametrize("n", [50, 500])
def test_metrics_vs_sklearn(n):
    import sklearn.metrics as skm

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, size=n)
    y_true[0], y_true[1] = 0, 1  # both classes
    y_score = rng.normal(size=n)
    # add ties
    y_score[::5] = 0.5
    assert roc_auc_score(y_true, y_score) == pytest.approx(
        skm.roc_auc_score(y_true, y_score), abs=1e-10
    )
    assert average_precision_score(y_true, y_score) == pytest.approx(
        skm.average_precision_score(y_true, y_score), abs=1e-10
    )


def test_hits_and_mrr():
    pos = np.array([3.0, 2.0, 1.0])
    neg = np.array([0.0] * 30)
    r = evaluate_hits(pos, neg, pos, neg)
    assert r["Hits@20"] == (1.0, 1.0)
    neg2 = np.array([[0.0, 4.0], [0.0, 0.0], [5.0, 6.0]])
    r = evaluate_mrr(pos, neg2, pos, neg2)
    # ranks: pos0 beaten by 4.0 -> rank 2; pos1 rank 1; pos2 rank 3
    assert r["MRR"][0] == pytest.approx((1 / 2 + 1 + 1 / 3) / 3)


def test_config_from_reference_json():
    from s3grl_tpu.config import ExperimentSuite

    suite = ExperimentSuite.load("/root/reference/configs/paper/auc_s3grl.json")
    runs = list(suite.runs())
    assert len(runs) == 42 * 10
    ident, ds, seed, cfg = runs[0]
    cfg.validate()
    assert cfg.sign_k == 3
    assert cfg.model == "SIGN"
    assert cfg.node_label == "zo"


def test_config_validation():
    cfg = RunConfig(model="SIGN", use_feature=False, init_features="")
    with pytest.raises(ValueError):
        cfg.validate()
    cfg = RunConfig(sign_type="SoP", pool_operatorwise=False)
    with pytest.raises(ValueError):
        cfg.validate()


def test_normalize_features_matches_pyg_semantics():
    x = np.array([[1.0, 3.0], [0.2, 0.2], [0.0, 0.0]], dtype=np.float32)
    out = normalize_features(x)
    # global min is 0 -> no shift; row sums > 1 divided, <= 1 kept
    assert np.allclose(out[0], [0.25, 0.75])
    assert np.allclose(out[1], [0.2, 0.2])
    assert np.allclose(out[2], [0.0, 0.0])


def test_geom_gcn_loader_webkb():
    """WebKB raw loader: dims must match PyG's WebKB (Texas: 183 x 1703)."""
    from s3grl_tpu.data.io import load_dataset

    for name, n, f in (("Texas", 183, 1703), ("Cornell", 183, 1703),
                       ("Wisconsin", 251, 1703)):
        g = load_dataset(name)
        assert g.num_nodes == n and g.num_features == f
        # symmetrized: every (u, v) has its reverse (self-loops count once)
        pairs = {(int(a), int(b)) for a, b in g.edge_index.T}
        assert pairs and all((b, a) in pairs for a, b in pairs)
        # NormalizeFeatures parity: non-zero rows sum to 1
        import numpy as np

        s = g.x.sum(axis=1)
        nz = s > 0
        np.testing.assert_allclose(s[nz], 1.0, rtol=1e-5)


def test_n2v_embedding_disk_cache(tmp_path, monkeypatch):
    """Second init_features call with the same (dataset, dim, seed) key must
    load from disk instead of retraining (reference n2v_prep.py:19-22)."""
    import s3grl_tpu.models.n2v as n2v_mod
    from s3grl_tpu.data.features import init_features

    monkeypatch.setenv("S3GRL_TPU_EMB_CACHE", str(tmp_path))
    rng = np.random.default_rng(0)
    ei = to_undirected(rng.integers(0, 20, size=(2, 40)).astype(np.int32))
    g = Graph(num_nodes=20, edge_index=ei)

    calls = {"n": 0}
    real = n2v_mod.node2vec_pretrain

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(n2v_mod, "node2vec_pretrain", counting)

    g1 = init_features(g, "n2v", n2v_dim=4, seed=1, epochs=1, cache_key="toy")
    assert calls["n"] == 1
    g2 = init_features(g, "n2v", n2v_dim=4, seed=1, epochs=1, cache_key="toy")
    assert calls["n"] == 1  # cache hit: no retrain
    np.testing.assert_allclose(g1.x, g2.x)
    # different seed -> different key -> retrain
    init_features(g, "n2v", n2v_dim=4, seed=2, epochs=1, cache_key="toy")
    assert calls["n"] == 2
    # no cache_key -> no caching
    init_features(g, "n2v", n2v_dim=4, seed=1, epochs=1)
    assert calls["n"] == 3
