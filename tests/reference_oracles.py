"""Host-side oracles for differential testing.

Small, slow, per-link scipy/numpy implementations of the documented reference
semantics (SURVEY.md §2 #6-#8), written independently from first principles.
Used only in tests to validate the batched TPU implementations allclose.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as ssp
from scipy.sparse.csgraph import shortest_path


def bfs_subgraph_nodes(A: ssp.csr_matrix, src: int, dst: int, num_hops: int):
    """Enclosing-subgraph node list in (src, dst, hop-ordered) order, plus
    per-node hop distances. No sampling."""
    nodes = [src, dst]
    dists = [0, 0]
    visited = {src, dst}
    fringe = {src, dst}
    for hop in range(1, num_hops + 1):
        nxt = set()
        for u in fringe:
            nxt.update(A.indices[A.indptr[u] : A.indptr[u + 1]].tolist())
        fringe = nxt - visited
        visited |= fringe
        if not fringe:
            break
        ordered = sorted(fringe)  # our framework orders within-hop by node id
        nodes += ordered
        dists += [hop] * len(ordered)
    return nodes, dists


def induced_subgraph(A: ssp.csr_matrix, nodes, remove_target=True):
    """Binary induced sub-adjacency with the (0,1) target link removed."""
    sub = A[nodes, :][:, nodes].toarray()
    sub = (sub != 0).astype(np.float64)
    if remove_target:
        sub[0, 1] = 0.0
        sub[1, 0] = 0.0
    return sub


def sym_normalize_np(adj: np.ndarray) -> np.ndarray:
    deg = adj.sum(axis=1)
    with np.errstate(divide="ignore"):
        inv = 1.0 / np.sqrt(deg)
    inv[~np.isfinite(inv)] = 0.0
    return adj * inv[:, None] * inv[None, :]


def pos_oracle(
    A: ssp.csr_matrix,
    x: np.ndarray,
    src: int,
    dst: int,
    num_hops: int,
    sign_k: int,
    k_heuristic: int = 0,
    strategy: str = "",
):
    """Per-link PoS(+) operator features following tuned_SIGN.py:137-262
    semantics: normalize induced subgraph, K matrix powers, slice target
    (+CCN) rows, multiply by [indicator | features].

    Returns (x0 [R, F+1], ops list of K arrays [R, F+1], ccn_global_ids).
    """
    nodes, dists = bfs_subgraph_nodes(A, src, dst, num_hops)
    sub = induced_subgraph(A, nodes)
    n = len(nodes)
    adj_n = sym_normalize_np(sub)

    x_sub = x[nodes]
    ind = np.zeros((n, 1))
    ind[0, 0] = 1.0
    ind[1, 0] = 1.0
    subg_x = np.concatenate([ind, x_sub], axis=1)

    sel = [0, 1]
    ccn_ids = []
    if k_heuristic:
        nb0 = set(np.nonzero(sub[0])[0].tolist())
        nb1 = set(np.nonzero(sub[1])[0].tolist())
        cc = nb0 | nb1 if strategy == "union" else nb0 & nb1
        cc -= {0, 1}
        ccn_local = sorted(cc)
        sel = [0, 1] + ccn_local
        ccn_ids = [nodes[i] for i in ccn_local]

    powers = []
    p = adj_n.copy()
    for _ in range(sign_k):
        powers.append(p[sel] @ subg_x)
        p = adj_n @ p
    x0 = subg_x[sel]
    return x0, powers, ccn_ids


def sop_oracle(
    A: ssp.csr_matrix, x: np.ndarray, src: int, dst: int, sign_k: int
):
    """Per-link SoP features following tuned_SIGN.py:49-134 semantics.

    Returns (x0 [2, F+1], ops list of K arrays [2, F+1]).
    """
    N = A.shape[0]
    binary = (A != 0).astype(np.float64).toarray()
    adj_n = sym_normalize_np(binary)

    x0 = np.stack(
        [np.concatenate([[1.0], x[src]]), np.concatenate([[1.0], x[dst]])]
    )
    ops = []
    p = adj_n.copy()
    for _ in range(sign_k):
        row_s = p[src].copy()
        row_s[dst] = 0.0
        row_d = p[dst].copy()
        row_d[src] = 0.0
        g_s = np.concatenate([[p[src, src]], row_s @ x])
        g_d = np.concatenate([[p[dst, dst]], row_d @ x])
        ops.append(np.stack([g_s, g_d]))
        p = adj_n @ p
    return x0, ops


def drnl_oracle(sub: np.ndarray, max_n: int | None = None) -> np.ndarray:
    """DRNL labels on a dense sub-adjacency (target link already removed),
    following utils.py:211-238: two masked shortest-path runs + the closed
    form; unreachable -> 0; z[src]=z[dst]=1."""
    n = sub.shape[0]
    keep_wo_dst = [i for i in range(n) if i != 1]
    keep_wo_src = [i for i in range(n) if i != 0]
    sp_wo_dst = shortest_path(
        ssp.csr_matrix(sub[np.ix_(keep_wo_dst, keep_wo_dst)]),
        directed=False,
        unweighted=True,
        indices=0,
    )
    d2src = np.insert(sp_wo_dst, 1, 0)
    sp_wo_src = shortest_path(
        ssp.csr_matrix(sub[np.ix_(keep_wo_src, keep_wo_src)]),
        directed=False,
        unweighted=True,
        indices=0,  # dst is index 0 after removing src
    )
    d2dst = np.insert(sp_wo_src, 0, 0)
    d = d2src + d2dst
    d2 = np.floor_divide(d, 2)
    dm = d - 2 * d2
    z = 1 + np.minimum(d2src, d2dst) + d2 * (d2 + dm - 1)
    z[0] = 1.0
    z[1] = 1.0
    z[~np.isfinite(z)] = 0.0
    return z
