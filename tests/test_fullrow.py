"""Non-optimized (full-row) SIGN flows: differential tests vs oracles and vs
the optimized flows (the reference's implicit cross-implementation oracle,
SURVEY.md §4 item 4 / utils.py:481-553)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from s3grl_tpu.config import RunConfig
from s3grl_tpu.operators.fullrow import (
    precompute_pos_fullrow,
    precompute_sop_fullrow,
)
from s3grl_tpu.operators.pos import precompute_pos
from s3grl_tpu.runner import run_sgrl_learning
from s3grl_tpu.sampling.extraction import DeviceGraph
from s3grl_tpu.utils.seeding import seed_everything

from tests.reference_oracles import (
    bfs_subgraph_nodes,
    drnl_oracle,
    induced_subgraph,
    sym_normalize_np,
)
from tests.test_extraction import random_graph

DATA_ROOT = "/root/reference/data"


def _links(g, n, seed=0):
    rng = np.random.default_rng(seed)
    links = np.stack(
        [rng.integers(0, g.num_nodes, n), rng.integers(0, g.num_nodes, n)],
        axis=1,
    ).astype(np.int32)
    return links[links[:, 0] != links[:, 1]]


def test_fullrow_pos_target_rows_match_optimized():
    """With node_label=zo the z column equals the optimized flows' one-hot
    target indicator (tuned_SIGN.py:177-179), so rows [0, 1] of the full-row
    dataset must equal the optimized target-row dataset exactly."""
    g = random_graph(n=50, p=0.12, seed=4)
    dg = DeviceGraph.from_graph(g)
    links = _links(g, 12, seed=4)
    y = np.ones(len(links))
    common = dict(
        num_hops=2, sign_k=3, buckets=(16, 32, 64), batch_size=8,
        max_subgraph_nodes=64, seed=7,
    )
    opt = precompute_pos(dg, links, y, **common).to_host()
    full = precompute_pos_fullrow(
        dg, links, y, node_label="zo", **common
    )
    assert full.row_mask[:, :2].all()
    np.testing.assert_allclose(
        full.xs[:, :, :2, :], opt.xs, rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("node_label", ["drnl", "de", "de+", "hop", "degree"])
def test_fullrow_pos_matches_numpy_oracle(node_label):
    """Full-row x{k} = (D^-1/2 A D^-1/2)^k [z | x] over ALL subgraph rows
    (utils.py:497-531 + tuned_SIGN.py:13-23), per-link numpy oracle."""
    g = random_graph(n=40, p=0.12, seed=5)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = _links(g, 6, seed=5)
    y = np.ones(len(links))
    sign_k = 2
    ds = precompute_pos_fullrow(
        dg, links, y, num_hops=2, sign_k=sign_k, node_label=node_label,
        buckets=(16, 32, 64), batch_size=4, max_subgraph_nodes=64, seed=3,
    )
    for b, (s, d) in enumerate(links):
        nodes, dists = bfs_subgraph_nodes(A, int(s), int(d), 2)
        n = len(nodes)
        sub = induced_subgraph(A, nodes)
        if node_label == "drnl":
            z = drnl_oracle(sub)[:, None]
        elif node_label == "hop":
            z = np.asarray(dists, dtype=np.float64)[:, None]
        elif node_label == "degree":
            z = np.minimum(sub.sum(axis=0), 100.0)[:, None]
        elif node_label in ("de", "de+"):
            from scipy.sparse import csr_matrix
            from scipy.sparse.csgraph import shortest_path

            if node_label == "de":
                # subgraph distances, capped at 3 — incl. unreachable
                # (utils.py:241-252, dead isnan branch)
                sp = shortest_path(
                    csr_matrix(sub), directed=False, unweighted=True,
                    indices=[0, 1],
                ).T
                # unreachable -> cap (the reference's isnan branch is dead:
                # scipy inf hits the > max_dist cap, utils.py:250-251)
                z = np.minimum(sp, 3.0)
            else:
                # masked distances as in drnl, capped 100 — including
                # unreachable (dead isnan branch, utils.py:274-277)
                keep_wo_dst = [i for i in range(n) if i != 1]
                keep_wo_src = [i for i in range(n) if i != 0]
                ds_ = shortest_path(
                    csr_matrix(sub[np.ix_(keep_wo_dst, keep_wo_dst)]),
                    directed=False, unweighted=True, indices=0,
                )
                ds_ = np.insert(ds_, 1, 0)
                dd_ = shortest_path(
                    csr_matrix(sub[np.ix_(keep_wo_src, keep_wo_src)]),
                    directed=False, unweighted=True, indices=0,
                )
                dd_ = np.insert(dd_, 0, 0)
                z = np.stack(
                    [np.minimum(ds_, 100.0), np.minimum(dd_, 100.0)], axis=1
                )
        zx = np.concatenate([z, np.asarray(g.x)[nodes]], axis=1)
        adj_n = sym_normalize_np(sub)
        expect = [zx]
        for _ in range(sign_k):
            expect.append(adj_n @ expect[-1])
        got = np.asarray(ds.xs[b])
        mask = np.asarray(ds.row_mask[b])
        assert int(mask.sum()) == n
        for k in range(sign_k + 1):
            np.testing.assert_allclose(
                got[k][:n], expect[k], rtol=1e-4, atol=1e-4,
                err_msg=f"link {b} op {k} label {node_label}",
            )
        assert got[:, n:].sum() == 0  # padding stays zero


def test_fullrow_sop_matches_numpy_oracle():
    """Non-optimized SoP with num_hops=-1: x{k} = diag(Â^k[s,s], Â^k[d,d])
    @ [z | x_{s,d}] (utils.py:532-550 + tuned_SIGN.py:25-44)."""
    g = random_graph(n=30, p=0.15, seed=6)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = _links(g, 8, seed=6)
    y = np.ones(len(links))
    sign_k = 3
    ds = precompute_sop_fullrow(
        dg, links, y, sign_k=sign_k, num_hops=-1, node_label="zo"
    )
    adj_n = sym_normalize_np((A != 0).toarray().astype(np.float64))
    powers = [adj_n]
    for _ in range(sign_k - 1):
        powers.append(adj_n @ powers[-1])
    x = np.asarray(g.x)
    for b, (s, d) in enumerate(links):
        zx = np.concatenate(
            [np.ones((2, 1)), x[[int(s), int(d)]]], axis=1
        )
        got = np.asarray(ds.xs[b])
        np.testing.assert_allclose(got[0], zx, rtol=1e-5, atol=1e-5)
        for k in range(1, sign_k + 1):
            diag = np.array(
                [powers[k - 1][int(s), int(s)], powers[k - 1][int(d), int(d)]]
            )
            np.testing.assert_allclose(
                got[k], diag[:, None] * zx, rtol=1e-4, atol=1e-5,
                err_msg=f"link {b} power {k}",
            )


def test_fullrow_sop_rejects_positive_hops():
    g = random_graph(n=20, p=0.2, seed=7)
    dg = DeviceGraph.from_graph(g)
    links = _links(g, 4, seed=7)
    with pytest.raises(NotImplementedError):
        precompute_sop_fullrow(
            dg, links, np.ones(len(links)), sign_k=2, num_hops=2
        )


def test_fullrow_end_to_end_drnl():
    """optimize_sign=False routes through the full-row dataset and trains."""
    seed_everything(1)
    # n2v init features (F=16): one-hot degree on USAir gives F~1025, which
    # blows the full-row dataset to [L, K+1, S, 1026] and made this test
    # dominate the suite (370 s); the routing under test is F-independent.
    cfg = RunConfig(
        dataset="USAir", model="SIGN", sign_type="PoS", optimize_sign=False,
        node_label="drnl", init_features="n2v", n2v_dim=16, use_feature=True,
        sign_k=2, num_hops=1, epochs=2, hidden_channels=32,
        train_percent=2.0, val_percent=10.0, test_percent=10.0,
        max_subgraph_nodes=128, subgraph_buckets=(32, 64, 128),
        delete_dataset=True, seed=1,
    )
    prep, best, tts, its, params = run_sgrl_learning(cfg)
    assert np.isfinite(best)
    assert params > 0


def test_fullrow_differs_from_optimized_with_drnl():
    """Regression for VERDICT item 2: optimize_sign=False must NOT silently
    run the optimized flow — with drnl labels the datasets differ."""
    g = random_graph(n=50, p=0.12, seed=8)
    dg = DeviceGraph.from_graph(g)
    links = _links(g, 6, seed=8)
    y = np.ones(len(links))
    common = dict(
        num_hops=2, sign_k=2, buckets=(16, 32, 64), batch_size=4,
        max_subgraph_nodes=64, seed=2,
    )
    opt = precompute_pos(dg, links, y, **common).to_host()
    full = precompute_pos_fullrow(dg, links, y, node_label="drnl", **common)
    assert full.num_rows > opt.num_rows
    assert not np.allclose(full.xs[:, :, :2, :], opt.xs)
