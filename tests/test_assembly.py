"""Dataset assembly placement tiers (device f32 / device bf16 / host) and
CCN width auto-sizing (ADVICE r1: bounded device assembly)."""
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from s3grl_tpu.operators.pos import measure_ccn_width, precompute_pos
from s3grl_tpu.sampling.extraction import DeviceGraph

from tests.test_extraction import random_graph


def _setup(seed=9, n=50):
    g = random_graph(n=n, p=0.15, seed=seed)
    dg = DeviceGraph.from_graph(g)
    rng = np.random.default_rng(seed)
    links = np.stack(
        [rng.integers(0, n, 16), rng.integers(0, n, 16)], axis=1
    ).astype(np.int32)
    links = links[links[:, 0] != links[:, 1]]
    return g, dg, links


def test_measure_ccn_width_matches_bruteforce():
    g, dg, links = _setup()
    A = g.scipy_csr()
    nbrs = [
        set(A.indices[A.indptr[u] : A.indptr[u + 1]].tolist())
        for u in range(g.num_nodes)
    ]
    for strategy in ("intersection", "union"):
        brute = 0
        for s, d in links:
            ns, nd = nbrs[int(s)] - {int(d)}, nbrs[int(d)] - {int(s)}
            cc = (ns & nd) if strategy == "intersection" else (ns | nd)
            cc -= {int(s), int(d)}
            brute = max(brute, len(cc))
        got = measure_ccn_width(dg, links, strategy, cap=10_000)
        assert got == max(1, brute), strategy


def test_ccn_cap_boundary_warns_and_truncates_lowest_slots():
    """At the cap boundary (VERDICT r2 weak #8): capping below the measured
    max |CCN| warns, and the surviving rows are exactly the uncapped
    dataset's lowest-local-slot CCN rows (closest hops kept first)."""
    g, dg, links = _setup(seed=11, n=60)
    measured = measure_ccn_width(dg, links, "union", cap=10_000)
    assert measured > 2, "fixture must have a link with |CCN| > 2"

    # cap >= measured: silent, returns the measured width
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert measure_ccn_width(dg, links, "union", cap=measured) == measured

    # cap < measured: warn + truncate
    cap = measured - 1
    with pytest.warns(UserWarning, match="CCN width capped"):
        got = measure_ccn_width(dg, links, "union", cap=cap)
    assert got == cap

    y = np.ones(len(links))
    kw = dict(
        num_hops=2, sign_k=2, k_heuristic=1, k_node_set_strategy="union",
        buckets=(16, 32, 64), batch_size=8, max_subgraph_nodes=64, seed=5,
    )
    full = precompute_pos(dg, links, y, max_ccn=measured, **kw).to_host()
    with pytest.warns(UserWarning, match="CCN width capped"):
        capped = precompute_pos(dg, links, y, max_ccn=cap, **kw).to_host()
    # CCN selection keeps the max_ccn LOWEST local slots (operators/pos.py
    # top_k over -slot): capped rows == first `cap` CCN rows of the full run.
    np.testing.assert_allclose(
        capped.xs[:, :, : 2 + cap], full.xs[:, :, : 2 + cap],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_array_equal(
        capped.row_mask, full.row_mask[:, : 2 + cap]
    )
    # at least one link actually lost a row to the cap
    assert (full.row_mask[:, 2 + cap :].sum(axis=1) > 0).any()


def test_assembly_tiers_agree(monkeypatch):
    """bf16-device and host-f32 assembly must match the f32-device dataset
    (bf16 to storage precision)."""
    _, dg, links = _setup(seed=10)
    y = np.ones(len(links))
    kw = dict(
        num_hops=2, sign_k=2, k_heuristic=1,
        k_node_set_strategy="intersection", max_ccn=8,
        buckets=(16, 32, 64), batch_size=8, max_subgraph_nodes=64, seed=5,
    )
    monkeypatch.delenv("S3GRL_TPU_DEVICE_DS_BYTES", raising=False)
    base = precompute_pos(dg, links, y, **kw).to_host()
    assert base.xs.dtype == np.float32

    monkeypatch.setenv("S3GRL_TPU_DEVICE_DS_BYTES", str(base.xs.nbytes // 2))
    bf16 = precompute_pos(dg, links, y, **kw)
    assert str(bf16.xs.dtype) == "bfloat16"
    np.testing.assert_allclose(
        np.asarray(bf16.xs, dtype=np.float32), base.xs, rtol=2e-2, atol=2e-2
    )
    np.testing.assert_array_equal(np.asarray(bf16.row_mask), base.row_mask)

    monkeypatch.setenv("S3GRL_TPU_DEVICE_DS_BYTES", "1")
    host = precompute_pos(dg, links, y, **kw)
    assert isinstance(host.xs, np.ndarray) and host.xs.dtype == np.float32
    np.testing.assert_allclose(host.xs, base.xs, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(host.row_mask, base.row_mask)
