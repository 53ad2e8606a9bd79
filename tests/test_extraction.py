"""Differential tests: batched extraction/labeling/operators vs scipy oracles."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from s3grl_tpu.data.graph import Graph, to_undirected
from s3grl_tpu.data.io import load_seal_txt
from s3grl_tpu.operators.pos import measure_subgraph_sizes, pos_operators, precompute_pos
from s3grl_tpu.operators.sop import precompute_sop
from s3grl_tpu.sampling.extraction import DeviceGraph, extract_subgraphs, sym_normalize
from s3grl_tpu.sampling.labeling import label_nodes

from tests.reference_oracles import (
    bfs_subgraph_nodes,
    drnl_oracle,
    induced_subgraph,
    pos_oracle,
    sop_oracle,
)

DATA_ROOT = "/root/reference/data"


def random_graph(n=40, p=0.12, seed=0, with_features=True, f=7):
    rng = np.random.default_rng(seed)
    upper = np.triu(rng.random((n, n)) < p, k=1)
    r, c = np.nonzero(upper)
    ei = to_undirected(np.stack([r, c]).astype(np.int32))
    x = rng.normal(size=(n, f)).astype(np.float32) if with_features else None
    return Graph(num_nodes=n, edge_index=ei, x=x)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("num_hops", [1, 2, 3])
def test_extraction_matches_oracle(seed, num_hops):
    g = random_graph(seed=seed)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    rng = np.random.default_rng(seed)
    links = np.stack(
        [rng.integers(0, g.num_nodes, 8), rng.integers(0, g.num_nodes, 8)], axis=1
    )
    links = links[links[:, 0] != links[:, 1]]
    S = 40
    sub = extract_subgraphs(
        dg, jnp.asarray(links, dtype=jnp.int32), num_hops=num_hops, max_nodes=S
    )
    for b, (s, d) in enumerate(links):
        nodes_ref, dists_ref = bfs_subgraph_nodes(A, int(s), int(d), num_hops)
        got_mask = np.asarray(sub.node_mask[b])
        got_nodes = np.asarray(sub.nodes[b])[got_mask].tolist()
        assert got_nodes == nodes_ref, f"link {b} node order mismatch"
        got_dist = np.asarray(sub.dist[b])[got_mask].tolist()
        assert got_dist == dists_ref
        adj_ref = induced_subgraph(A, nodes_ref)
        n = len(nodes_ref)
        got_adj = np.asarray(sub.adj[b])[:n, :n]
        assert np.array_equal(got_adj, adj_ref)
        # padding region must be all zero
        assert np.asarray(sub.adj[b])[n:].sum() == 0
        assert np.asarray(sub.adj[b])[:, n:].sum() == 0
        assert int(sub.sub_size[b]) == n


def test_extraction_per_hop_cap():
    g = random_graph(n=60, p=0.3, seed=3)
    dg = DeviceGraph.from_graph(g)
    links = np.array([[0, 1], [2, 3]], dtype=np.int32)
    sub = extract_subgraphs(
        dg,
        jnp.asarray(links),
        num_hops=2,
        max_nodes=64,
        max_nodes_per_hop=4,
        link_seeds=jnp.asarray([11, 12], dtype=jnp.int32),
    )
    # at most 2 + 4 + 4 nodes survive per link
    assert int(np.asarray(sub.node_mask).sum(axis=1).max()) <= 10
    # per-link seeds: same link in a different batch -> same sampled set
    sub2 = extract_subgraphs(
        dg,
        jnp.asarray(links[::-1].copy()),
        num_hops=2,
        max_nodes=64,
        max_nodes_per_hop=4,
        link_seeds=jnp.asarray([12, 11], dtype=jnp.int32),
    )
    assert np.array_equal(np.asarray(sub.nodes[0]), np.asarray(sub2.nodes[1]))


@pytest.mark.parametrize("label", ["zo", "hop", "drnl", "degree"])
def test_labeling_matches_oracle(label):
    g = random_graph(n=35, p=0.15, seed=5)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = np.array([[0, 1], [3, 9], [20, 4]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=35)
    z = label_nodes(sub.adj, sub.dist, sub.node_mask, node_label=label)
    for b, (s, d) in enumerate(links):
        nodes_ref, dists_ref = bfs_subgraph_nodes(A, int(s), int(d), 2)
        n = len(nodes_ref)
        adj_ref = induced_subgraph(A, nodes_ref)
        got = np.asarray(z[b])[:n]
        if label == "zo":
            exp = (np.asarray(dists_ref) == 0).astype(float)
        elif label == "hop":
            exp = np.asarray(dists_ref, dtype=float)
        elif label == "degree":
            exp = np.minimum(adj_ref.sum(axis=0), 100.0)
        elif label == "drnl":
            exp = drnl_oracle(adj_ref)
        assert np.allclose(got, exp), f"{label} link {b}: {got} vs {exp}"


def test_de_labels():
    g = random_graph(n=30, p=0.2, seed=6)
    dg = DeviceGraph.from_graph(g)
    links = np.array([[0, 2]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=32)
    z = label_nodes(sub.adj, sub.dist, sub.node_mask, node_label="de")
    assert z.shape == (1, 32, 2)
    n = int(sub.sub_size[0])
    # distances capped at 3, unreachable -> 4
    assert np.asarray(z)[0, :n].max() <= 4.0
    assert np.asarray(z)[0, 0, 0] == 0.0  # src to src


@pytest.mark.parametrize("sign_k", [1, 3])
def test_pos_operators_match_oracle(sign_k):
    g = random_graph(n=40, p=0.15, seed=7)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = np.array([[0, 1], [5, 9], [12, 30]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=40)
    xs, row_mask = pos_operators(sub, dg.x, sign_k=sign_k)
    assert xs.shape == (3, sign_k + 1, 2, g.num_features + 1)
    for b, (s, d) in enumerate(links):
        x0_ref, ops_ref, _ = pos_oracle(A, g.x, int(s), int(d), 2, sign_k)
        assert np.allclose(np.asarray(xs[b, 0]), x0_ref[:2], atol=1e-5)
        for k in range(sign_k):
            assert np.allclose(
                np.asarray(xs[b, k + 1]), ops_ref[k][:2], atol=1e-4
            ), f"link {b} op {k + 1}"


@pytest.mark.parametrize("strategy", ["union", "intersection"])
def test_pos_plus_ccn_matches_oracle(strategy):
    g = random_graph(n=40, p=0.2, seed=8)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = np.array([[0, 1], [2, 3]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=40)
    xs, row_mask = pos_operators(sub, dg.x, sign_k=2, max_ccn=16, strategy=strategy)
    for b, (s, d) in enumerate(links):
        x0_ref, ops_ref, ccn_ids = pos_oracle(
            A, g.x, int(s), int(d), 2, 2, k_heuristic=1, strategy=strategy
        )
        n_ccn = len(ccn_ids)
        got_valid = np.asarray(row_mask[b])
        assert got_valid[:2].all()
        assert got_valid[2:].sum() == n_ccn
        # CCN rows: compare as sets of rows (order = local slot order both sides)
        got = np.asarray(xs[b, 0])[got_valid]
        assert np.allclose(got, x0_ref, atol=1e-5)
        for k in range(2):
            got = np.asarray(xs[b, k + 1])[got_valid]
            assert np.allclose(got, ops_ref[k], atol=1e-4), f"{strategy} b{b} k{k}"


@pytest.mark.parametrize("sign_k", [1, 3])
def test_sop_matches_oracle(sign_k):
    g = random_graph(n=30, p=0.2, seed=9)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = np.array([[0, 1], [4, 7], [10, 20]], dtype=np.int64)
    y = np.array([1.0, 0.0, 1.0])
    ds = precompute_sop(dg, links, y, sign_k=sign_k)
    assert ds.xs.shape == (3, sign_k + 1, 2, g.num_features + 1)
    for b, (s, d) in enumerate(links):
        x0_ref, ops_ref = sop_oracle(A, g.x, int(s), int(d), sign_k)
        assert np.allclose(ds.xs[b, 0], x0_ref, atol=1e-5)
        for k in range(sign_k):
            assert np.allclose(ds.xs[b, k + 1], ops_ref[k], atol=1e-4), f"b{b} k{k}"


def test_precompute_pos_end_to_end_usair():
    """Full driver on a real dataset slice: shapes, masks, determinism."""
    g = load_seal_txt(DATA_ROOT, "USAir")
    # degree features stand-in: eye is too big, use normalized degree scalar
    x = (g.degrees / g.degrees.max()).astype(np.float32)[:, None]
    g = g.with_features(x)
    dg = DeviceGraph.from_graph(g)
    rng = np.random.default_rng(0)
    links = np.stack(
        [rng.integers(0, g.num_nodes, 64), rng.integers(0, g.num_nodes, 64)], axis=1
    )
    links = links[links[:, 0] != links[:, 1]][:50]
    y = np.ones(len(links))
    ds = precompute_pos(
        dg, links, y, num_hops=2, sign_k=3, batch_size=16,
        buckets=(64, 128, 256, 512), max_subgraph_nodes=512,
    )
    assert ds.xs.shape == (len(links), 4, 2, 2)
    assert ds.row_mask.all()
    # spot-check one link against the oracle
    A = g.scipy_csr()
    b = 7
    x0_ref, ops_ref, _ = pos_oracle(A, g.x, int(links[b, 0]), int(links[b, 1]), 2, 3)
    assert np.allclose(ds.xs[b, 0], x0_ref[:2], atol=1e-5)
    assert np.allclose(ds.xs[b, 3], ops_ref[2][:2], atol=1e-4)
    # model_inputs assembly
    mi = ds.model_inputs(sign_k=3)
    assert mi.shape == (len(links), 2, 4 * 2)
    mi_last = ds.model_inputs(sign_k=3, last_only=True)
    assert mi_last.shape == (len(links), 2, 2)


def test_sizing_pass_matches_extraction():
    g = random_graph(n=50, p=0.1, seed=11)
    dg = DeviceGraph.from_graph(g)
    rng = np.random.default_rng(0)
    links = np.stack([rng.integers(0, 50, 20), rng.integers(0, 50, 20)], axis=1)
    links = links[links[:, 0] != links[:, 1]]
    sizes = measure_subgraph_sizes(dg, links.astype(np.int32), num_hops=2)
    sub = extract_subgraphs(
        dg, jnp.asarray(links, dtype=jnp.int32), num_hops=2, max_nodes=50
    )
    assert np.array_equal(sizes, np.asarray(sub.sub_size))


def _de_plus_oracle_dists(adj_ref, n):
    """Reference de+ masked distances (utils.py:255-278) for a subgraph with
    src at 0, dst at 1. Executed-reference semantics: scipy's inf for
    unreachable nodes is caught by the ``dist > max_dist`` cap (-> 100); the
    isnan -> 101 branch is dead code (shortest_path never returns NaN)."""
    from scipy.sparse.csgraph import shortest_path

    def masked_dist(target, deleted, size):
        idx = [i for i in range(size) if i != deleted]
        sp = shortest_path(
            adj_ref[np.ix_(idx, idx)], directed=False, unweighted=True,
            indices=idx.index(target),
        )
        sp = np.insert(sp, deleted, 0, axis=0)
        # cap FIRST, exactly as the reference executes: inf > 100 -> 100
        sp = np.minimum(sp, 100.0)
        assert not np.isnan(sp).any()  # the reference's isnan branch is dead
        return sp

    return masked_dist(0, 1, n), masked_dist(1, 0, n)


def test_de_plus_matches_scipy_masked_shortest_path():
    """de+ differential test vs the reference's masked shortest-path oracle
    (utils.py:255-278: dist-to-src computed with dst deleted and vice versa,
    dist capped at 100 — including unreachable, counterpart position -> 0)."""
    g = random_graph(n=35, p=0.15, seed=9)
    dg = DeviceGraph.from_graph(g)
    A = g.scipy_csr()
    links = np.array([[0, 1], [4, 17], [22, 3]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=35)
    z = np.asarray(
        label_nodes(sub.adj, sub.dist, sub.node_mask, node_label="de+")
    )
    for b, (s, d) in enumerate(links):
        nodes_ref, _ = bfs_subgraph_nodes(A, int(s), int(d), 2)
        n = len(nodes_ref)
        adj_ref = induced_subgraph(A, nodes_ref)  # src at 0, dst at 1
        exp_s, exp_d = _de_plus_oracle_dists(adj_ref, n)
        got = z[b, :n]
        assert np.allclose(got[:, 0], exp_s), f"link {b} dist2src"
        assert np.allclose(got[:, 1], exp_d), f"link {b} dist2dst"


def test_de_plus_unreachable_after_masking_labels_100():
    """A node reachable ONLY through the masked counterpart must get the
    cap value 100 (executed reference behavior — the 101 branch is dead;
    ADVICE r2). Fixture: pendant chain src(0)–dst(1)–leaf(2), so with dst
    deleted the leaf is unreachable from src."""
    ei = to_undirected(np.array([[0, 1, 0], [1, 2, 3]], dtype=np.int32))
    g = Graph(num_nodes=4, edge_index=ei,
              x=np.ones((4, 2), dtype=np.float32))
    dg = DeviceGraph.from_graph(g)
    links = np.array([[0, 1]], dtype=np.int32)
    sub = extract_subgraphs(dg, jnp.asarray(links), num_hops=2, max_nodes=8)
    z = np.asarray(
        label_nodes(sub.adj, sub.dist, sub.node_mask, node_label="de+")
    )
    nodes = np.asarray(sub.nodes[0])
    n_valid = int(np.asarray(sub.node_mask[0]).sum())
    # oracle on the induced subgraph
    A = g.scipy_csr()
    nodes_ref, _ = bfs_subgraph_nodes(A, 0, 1, 2)
    adj_ref = induced_subgraph(A, nodes_ref)
    exp_s, exp_d = _de_plus_oracle_dists(adj_ref, len(nodes_ref))
    assert np.allclose(z[0, :n_valid, 0], exp_s)
    assert np.allclose(z[0, :n_valid, 1], exp_d)
    # the unreachable branch must actually fire: leaf 2 hangs off dst only
    # and leaf 3 off src only, so each is unreachable from the OTHER endpoint
    leaf2 = int(np.nonzero(nodes[:n_valid] == 2)[0][0])
    leaf3 = int(np.nonzero(nodes[:n_valid] == 3)[0][0])
    assert z[0, leaf2, 0] == 100.0  # dist2src with dst masked: unreachable
    assert z[0, leaf3, 1] == 100.0  # dist2dst with src masked: unreachable
    # de label: same dead-isnan semantics at max_dist=3 — with the target
    # link removed, leaf 2 is unreachable from src entirely
    z_de = np.asarray(
        label_nodes(sub.adj, sub.dist, sub.node_mask, node_label="de")
    )
    assert z_de[0, leaf2, 0] == 3.0  # capped, NOT max_dist + 1
