"""Pallas BSR SpMM kernel vs dense reference (interpret mode on CPU)."""
import numpy as np
import pytest

from s3grl_tpu.ops.spmm_pallas import (
    blockify,
    blocked_memory_ok,
    bsr_spmm,
    power_chain,
)


def _random_coo(rng, n, e):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (dst, src), w)
    return src, dst, w, dense


@pytest.mark.parametrize("n,e,c", [(50, 200, 7), (300, 2500, 64), (513, 4000, 129)])
def test_bsr_spmm_matches_dense(n, e, c):
    rng = np.random.default_rng(n)
    src, dst, w, dense = _random_coo(rng, n, e)
    x = rng.normal(size=(n, c)).astype(np.float32)
    adj = blockify(src, dst, w, n)
    got = np.asarray(bsr_spmm(adj, x))
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_power_chain_matches_repeated_dense():
    rng = np.random.default_rng(7)
    n, e, c, k = 200, 1500, 16, 3
    src, dst, w, dense = _random_coo(rng, n, e)
    # Scale down so powers stay well-conditioned.
    w *= 0.1
    dense *= 0.1
    x = rng.normal(size=(n, c)).astype(np.float32)
    adj = blockify(src, dst, w, n)
    ys = np.asarray(power_chain(adj, x, k))
    r = x
    for i in range(k):
        r = dense @ r
        np.testing.assert_allclose(ys[i], r, rtol=1e-3, atol=1e-5)


def test_empty_row_blocks_zeroed():
    # Nodes 128..255 have no incident edges -> second row block must be 0.
    n = 260
    src = np.array([0, 1, 2], np.int32)
    dst = np.array([1, 2, 0], np.int32)
    w = np.ones(3, np.float32)
    x = np.ones((n, 5), np.float32)
    adj = blockify(src, dst, w, n)
    y = np.asarray(bsr_spmm(adj, x))
    assert np.all(y[128:256] == 0)
    assert y[:3].sum() == 3 * 5


def test_blocked_memory_guard():
    assert blocked_memory_ok(10_000, 5_000)
    assert not blocked_memory_ok(10_000_000, 10_000_000, budget_bytes=1 << 28)


def test_sop_pallas_path_matches_xla():
    """precompute_sop(use_pallas=True) ≡ (use_pallas=False) on a small graph."""
    from s3grl_tpu.data.graph import Graph
    from s3grl_tpu.operators.sop import precompute_sop
    from s3grl_tpu.sampling.extraction import DeviceGraph

    rng = np.random.default_rng(3)
    n = 90
    src, dst, _, _ = _random_coo(rng, n, 400)
    und_src = np.concatenate([src, dst])
    und_dst = np.concatenate([dst, src])
    x = rng.normal(size=(n, 12)).astype(np.float32)
    g = Graph(
        edge_index=np.stack([und_src, und_dst]), num_nodes=n, x=x
    )
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, n, (20, 2)).astype(np.int32)
    y = rng.integers(0, 2, 20).astype(np.float32)
    a = precompute_sop(dg, links, y, sign_k=3, use_pallas=False)
    b = precompute_sop(dg, links, y, sign_k=3, use_pallas=True)
    np.testing.assert_allclose(a.xs, b.xs, rtol=1e-4, atol=1e-4)
