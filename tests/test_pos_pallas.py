"""Fused Pallas PoS-operator kernel vs the XLA gather path (interpret mode)."""
import numpy as np
import pytest

from s3grl_tpu.data.graph import Graph, to_undirected
from s3grl_tpu.operators.pos import pos_operators, precompute_pos
from s3grl_tpu.sampling.extraction import DeviceGraph, extract_subgraphs


def _graph(rng, n=150, e=500, f=7):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    keep = src != dst
    ei = to_undirected(np.stack([src[keep], dst[keep]]))
    return Graph(edge_index=ei, num_nodes=n,
                 x=rng.normal(size=(n, f)).astype(np.float32))


@pytest.mark.parametrize("max_ccn,strategy", [(0, ""), (8, "union"),
                                              (8, "intersection")])
def test_pos_operators_pallas_matches_xla(max_ccn, strategy):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    g = _graph(rng)
    dg = DeviceGraph.from_graph(g)
    links = jnp.asarray(rng.integers(0, g.num_nodes, (16, 2)).astype(np.int32))
    seeds = jnp.asarray(np.arange(16, dtype=np.int32))
    sub = extract_subgraphs(dg, links, num_hops=2, max_nodes=128,
                            ratio_per_hop=1.0, max_nodes_per_hop=None,
                            link_seeds=seeds)
    kw = dict(sign_k=3, max_ccn=max_ccn, strategy=strategy)
    xs_a, rm_a = pos_operators(sub, dg.x, use_pallas=False, **kw)
    xs_b, rm_b = pos_operators(sub, dg.x, use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(rm_a), np.asarray(rm_b))
    # XLA path leaves x0 of masked rows zeroed too -> compare masked values.
    np.testing.assert_allclose(
        np.asarray(xs_a), np.asarray(xs_b), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("ccn", [{}, dict(k_heuristic=1, max_ccn=8,
                                          k_node_set_strategy="intersection")])
def test_precompute_pos_pallas_end_to_end(ccn):
    """use_pallas=True routes through the global-id node-set path."""
    rng = np.random.default_rng(1)
    g = _graph(rng)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (24, 2)).astype(np.int32)
    y = rng.integers(0, 2, 24).astype(np.float32)
    kw = dict(num_hops=2, sign_k=2, buckets=(32, 64, 128), batch_size=8,
              max_subgraph_nodes=128, seed=3, **ccn)
    a = precompute_pos(dg, links, y, use_pallas=False, **kw)
    b = precompute_pos(dg, links, y, use_pallas=True, **kw)
    np.testing.assert_allclose(a.xs, b.xs, rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(a.row_mask, b.row_mask)


def test_select_rows_mode_matches_full_chain():
    """Selected-row chain (H_k = H_{k-1} Â, then H_k X) must match the
    full-chain kernel row-for-row — same semantics, 5-6x fewer FLOPs at
    wide attributed feature widths (auto-picked when f_pad > 128)."""
    import numpy as np
    import jax.numpy as jnp

    from s3grl_tpu.ops.pos_pallas import pos_power_rows

    rng = np.random.default_rng(3)
    B, S, D, F, R, K = 4, 64, 16, 150, 5, 3  # F > 127 -> auto select mode
    nbr = jnp.asarray(rng.integers(0, S, (B, S, D)), dtype=jnp.int32)
    w = jnp.asarray((rng.random((B, S, D)) < 0.3).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, S, F)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, S, (B, R)), dtype=jnp.int32)

    full = pos_power_rows(sel, nbr, w, x, sign_k=K, interpret=True,
                          select_rows=False)
    selm = pos_power_rows(sel, nbr, w, x, sign_k=K, interpret=True,
                          select_rows=True)
    auto = pos_power_rows(sel, nbr, w, x, sign_k=K, interpret=True)
    np.testing.assert_allclose(np.asarray(selm), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(selm),
                               rtol=0, atol=0)


@pytest.mark.parametrize("ccn", [{}, dict(k_heuristic=1, max_ccn=8,
                                          k_node_set_strategy="union")])
def test_staircase_densify_matches_xla(ccn):
    """S >= 256 routes the global-table kernel through degree-sorted
    staircase densification (slot permutation + per-chunk lane-tile
    counts); results must match the XLA gather path on the same links."""
    rng = np.random.default_rng(5)
    g = _graph(rng, n=300, e=2400, f=9)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (16, 2)).astype(np.int32)
    y = rng.integers(0, 2, 16).astype(np.float32)
    kw = dict(num_hops=2, sign_k=3, buckets=(256,), batch_size=8,
              max_subgraph_nodes=256, seed=7, **ccn)
    a = precompute_pos(dg, links, y, use_pallas=False, **kw)
    b = precompute_pos(dg, links, y, use_pallas=True, **kw)
    np.testing.assert_array_equal(a.row_mask, b.row_mask)
    np.testing.assert_allclose(a.xs, b.xs, rtol=2e-3, atol=2e-4)


def test_local_tab_path_matches_global(monkeypatch):
    """The subgraph-local neighbor-table route (native gc_khop_local_tab +
    pos_operators_local, the width-shrunk fast path of VERDICT r3 weak #2)
    must reproduce the global-table kernel path exactly: same densified
    sub-adjacency, same MXU chain, bit-identical outputs."""
    import jax.numpy as jnp

    from s3grl_tpu import native
    from s3grl_tpu.operators.pos import (
        pos_operators_global,
        pos_operators_local,
    )

    if not native.available():
        pytest.skip("native graphcore unavailable")
    rng = np.random.default_rng(7)
    g = _graph(rng)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (16, 2)).astype(np.int32)
    S = 128
    rp, ci, _ = native.build_csr(
        np.asarray(g.edge_index[0]), np.asarray(g.edge_index[1]),
        None, g.num_nodes,
    )
    nd_ref, sz_ref = native.khop_nodes(rp, ci, links, 2, S)
    nd, sz, loc, mdeg = native.khop_local_tab(
        rp, ci, links, 2, S, min(S, int(dg.nbr.shape[1]))
    )
    np.testing.assert_array_equal(nd, nd_ref)
    np.testing.assert_array_equal(sz, sz_ref)
    assert int(mdeg.max()) <= min(S, int(dg.nbr.shape[1]))

    hm = nd >= 0
    nodes = jnp.asarray(np.where(hm, nd, 0))
    mask = jnp.asarray(hm)
    d_pad = 16
    while d_pad < int(mdeg.max()):
        d_pad *= 2
    for kw in (dict(max_ccn=0, strategy=""),
               dict(max_ccn=8, strategy="intersection"),
               dict(max_ccn=8, strategy="union")):
        xs_g, rm_g = pos_operators_global(
            dg, jnp.asarray(links), nodes, mask, sign_k=3, **kw
        )
        xs_l, rm_l = pos_operators_local(
            dg, nodes, mask, jnp.asarray(loc[:, :, :d_pad]), sign_k=3, **kw
        )
        np.testing.assert_array_equal(np.asarray(rm_g), np.asarray(rm_l))
        np.testing.assert_allclose(
            np.asarray(xs_g), np.asarray(xs_l), rtol=0, atol=0
        )


def test_precompute_pos_host_local_end_to_end(monkeypatch):
    """Forced host-extract + pallas routes through khop_local_tab; the
    assembled dataset must match the plain device path."""
    from s3grl_tpu import native

    if not native.available():
        pytest.skip("native graphcore unavailable")
    rng = np.random.default_rng(11)
    g = _graph(rng)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (24, 2)).astype(np.int32)
    y = rng.integers(0, 2, 24).astype(np.float32)
    kw = dict(num_hops=2, sign_k=2, buckets=(32, 64, 128), batch_size=8,
              max_subgraph_nodes=128, seed=3, k_heuristic=1, max_ccn=8,
              k_node_set_strategy="intersection")
    monkeypatch.setenv("S3GRL_TPU_HOST_EXTRACT", "0")
    a = precompute_pos(dg, links, y, use_pallas=False, **kw)
    monkeypatch.setenv("S3GRL_TPU_HOST_EXTRACT", "1")
    monkeypatch.setenv("S3GRL_TPU_LOCAL_TAB", "1")  # opt-in path under test
    b = precompute_pos(dg, links, y, use_pallas=True, **kw)
    np.testing.assert_allclose(a.xs, b.xs, rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(a.row_mask, b.row_mask)


def test_bucket_scan_route_matches_per_batch(monkeypatch):
    """The one-dispatch-per-bucket scan route (host BFS for the whole
    bucket + lax.scan over batch chunks with in-place scatter) must
    produce the same dataset as the per-batch dispatch path."""
    from s3grl_tpu import native

    if not native.available():
        pytest.skip("native graphcore unavailable")
    rng = np.random.default_rng(13)
    g = _graph(rng, n=300, e=2400, f=9)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (40, 2)).astype(np.int32)
    y = rng.integers(0, 2, 40).astype(np.float32)
    kw = dict(num_hops=2, sign_k=2, buckets=(128, 256), batch_size=8,
              max_subgraph_nodes=256, seed=5, k_heuristic=1, max_ccn=8,
              k_node_set_strategy="intersection")
    monkeypatch.setenv("S3GRL_TPU_HOST_EXTRACT", "1")
    monkeypatch.setenv("S3GRL_TPU_SCAN_SB", "1")  # per-batch path
    a = precompute_pos(dg, links, y, use_pallas=True, **kw)
    monkeypatch.setenv("S3GRL_TPU_SCAN_SB", "4")  # super-batch scan path
    b = precompute_pos(dg, links, y, use_pallas=True, **kw)
    np.testing.assert_array_equal(a.row_mask, b.row_mask)
    np.testing.assert_allclose(a.xs, b.xs, rtol=0, atol=0)


def test_vmem_ok_admits_large_graph_buckets():
    """Dispatch policy: the BlogCatalog-scale bucket (S=1024, D=3424) must
    take the fused kernel (~63 MB true double-buffered footprint vs the
    kernel's 100 MB limit); genuinely over-budget shapes must not."""
    from s3grl_tpu.ops.pos_pallas import vmem_ok

    assert vmem_ok(1024, 3424, 40)      # BlogCatalog PoS bucket
    assert vmem_ok(1024, 448, 1025)     # arxiv bucket (wide features)
    assert vmem_ok(512, 160, 1434)      # Cora attributed bucket
    assert not vmem_ok(2048, 8192, 128)  # blows VMEM: ~290 MB streamed


def test_ccn_width_larger_than_bucket_clamps():
    """Full-width CCN (max_ccn > bucket S) must clamp top_k to the bucket
    size and pad invalid columns — the CCN-guard Celegans_CCN_Full config
    crashed pos_operators_global with k=256 on the S=32 bucket (r5)."""
    rng = np.random.default_rng(11)
    g = _graph(rng)
    dg = DeviceGraph.from_graph(g)
    links = rng.integers(0, g.num_nodes, (12, 2)).astype(np.int32)
    y = rng.integers(0, 2, 12).astype(np.float32)
    kw = dict(num_hops=2, sign_k=2, buckets=(32, 64, 128), batch_size=8,
              max_subgraph_nodes=128, seed=3, k_heuristic=1,
              k_node_set_strategy="union", max_ccn=200)
    a = precompute_pos(dg, links, y, use_pallas=False, **kw)
    b = precompute_pos(dg, links, y, use_pallas=True, **kw)
    np.testing.assert_array_equal(a.row_mask, b.row_mask)
    np.testing.assert_allclose(a.xs, b.xs, rtol=2e-3, atol=2e-4)
