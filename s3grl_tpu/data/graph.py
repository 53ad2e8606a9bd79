"""Host-side graph container with CSR views.

The reference keeps the global graph as a scipy CSR matrix built per dataset
class (`sgrl_link_pred.py:111-114`). Here the graph is a small immutable
container of numpy arrays with a cached CSR (row_ptr/col_idx/weights) that is
shipped to the device once; all per-link work (extraction, labeling, diffusion)
is batched JAX on top of it.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property
from typing import Optional

import numpy as np


def coalesce_edges(
    edge_index: np.ndarray, edge_weight: Optional[np.ndarray], num_nodes: int
):
    """Sort edges by (row, col) and sum weights of duplicates.

    TPU-friendly replacement for `torch_sparse.coalesce`
    (reference: sgrl_link_pred.py:102-105) — a segment-sum over sorted keys.
    """
    row, col = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    if edge_weight is None:
        edge_weight = np.ones(row.shape[0], dtype=np.float32)
    key = row * num_nodes + col
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    uniq_key, start = np.unique(key_sorted, return_index=True)
    w_sorted = edge_weight[order]
    seg = np.zeros(len(key_sorted), dtype=np.int64)
    seg[start[1:]] = 1
    seg = np.cumsum(seg)
    w_out = np.zeros(len(uniq_key), dtype=edge_weight.dtype)
    np.add.at(w_out, seg, w_sorted)
    new_edge_index = np.stack(
        [uniq_key // num_nodes, uniq_key % num_nodes]
    ).astype(np.int32)
    return new_edge_index, w_out


def to_undirected(edge_index: np.ndarray) -> np.ndarray:
    """Symmetrize and deduplicate an edge index (PyG `to_undirected` semantics)."""
    both = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    key = both[0].astype(np.int64) * (both.max() + 1) + both[1]
    _, idx = np.unique(key, return_index=True)
    return both[:, np.sort(idx)].astype(np.int32)


@dataclass(frozen=True)
class Graph:
    """An attributed graph: edge list + optional features, with CSR cache."""

    num_nodes: int
    edge_index: np.ndarray  # [2, E] int32 (already symmetrized for undirected)
    edge_weight: Optional[np.ndarray] = None  # [E] float32
    x: Optional[np.ndarray] = None  # [N, F] float32
    directed: bool = False

    def __post_init__(self):
        assert self.edge_index.ndim == 2 and self.edge_index.shape[0] == 2

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def num_features(self) -> int:
        return 0 if self.x is None else int(self.x.shape[1])

    @cached_property
    def csr(self):
        """(row_ptr [N+1], col_idx [E], weight [E]) sorted by (row, col)."""
        row = self.edge_index[0].astype(np.int64)
        col = self.edge_index[1].astype(np.int64)
        w = (
            self.edge_weight.astype(np.float32)
            if self.edge_weight is not None
            else np.ones(row.shape[0], dtype=np.float32)
        )
        order = np.lexsort((col, row))
        row, col, w = row[order], col[order], w[order]
        row_ptr = np.zeros(self.num_nodes + 1, dtype=np.int64)
        np.add.at(row_ptr, row + 1, 1)
        row_ptr = np.cumsum(row_ptr)
        return row_ptr.astype(np.int32), col.astype(np.int32), w

    @cached_property
    def degrees(self) -> np.ndarray:
        row_ptr, _, _ = self.csr
        return (row_ptr[1:] - row_ptr[:-1]).astype(np.int32)

    @cached_property
    def max_degree(self) -> int:
        return int(self.degrees.max()) if self.num_edges else 0

    def padded_adjacency(self, max_degree: Optional[int] = None):
        """Padded neighbor table: (nbr [N, D] int32, nbr_w [N, D] f32, deg [N]).

        Rows beyond a node's degree are filled with the node's own index and
        zero weight so gathers stay in-bounds. This is the static-shape
        equivalent of scipy CSR row slicing (`utils.py:33-44` `neighbors`).
        """
        D = int(max_degree or self.max_degree)
        row_ptr, col_idx, w = self.csr
        N = self.num_nodes

        if D == 0 or len(col_idx) == 0:
            D = max(D, 1)
            return (
                np.tile(np.arange(N, dtype=np.int32)[:, None], (1, D)),
                np.zeros((N, D), dtype=np.float32),
                np.zeros(N, dtype=np.int32),
            )

        from s3grl_tpu import native

        nat = native.padded_adjacency(row_ptr, col_idx, w, D)
        if nat is not None:
            return nat

        # Vectorized numpy fallback: gather each row's first D entries.
        deg = np.minimum(self.degrees, D)
        pos = row_ptr[:-1, None] + np.arange(D)[None, :]
        valid = np.arange(D)[None, :] < deg[:, None]
        idx = np.where(valid, pos, 0)
        nbr = np.where(
            valid, col_idx[idx], np.arange(N, dtype=np.int32)[:, None]
        ).astype(np.int32)
        nbr_w = np.where(valid, w[idx], 0.0).astype(np.float32)
        return nbr, nbr_w, deg

    def scipy_csr(self):
        """scipy CSR view (for differential tests against the reference's math)."""
        import scipy.sparse as ssp

        w = (
            self.edge_weight
            if self.edge_weight is not None
            else np.ones(self.num_edges, dtype=np.float32)
        )
        return ssp.csr_matrix(
            (w, (self.edge_index[0], self.edge_index[1])),
            shape=(self.num_nodes, self.num_nodes),
        )

    def with_features(self, x: Optional[np.ndarray]) -> "Graph":
        return Graph(
            num_nodes=self.num_nodes,
            edge_index=self.edge_index,
            edge_weight=self.edge_weight,
            x=None if x is None else np.asarray(x, dtype=np.float32),
            directed=self.directed,
        )

    def with_edges(
        self, edge_index: np.ndarray, edge_weight: Optional[np.ndarray] = None
    ) -> "Graph":
        return Graph(
            num_nodes=self.num_nodes,
            edge_index=np.asarray(edge_index, dtype=np.int32),
            edge_weight=edge_weight,
            x=self.x,
            directed=self.directed,
        )


def normalize_features(x: np.ndarray) -> np.ndarray:
    """Row-wise L1 normalization (PyG 2.x `NormalizeFeatures` semantics,
    reference: sgrl_link_pred.py:1000-1003): shift by the global min, then
    divide each row by its sum clamped to >= 1."""
    x = np.asarray(x, dtype=np.float32)
    x = x - x.min()
    s = np.maximum(x.sum(axis=-1, keepdims=True), 1.0)
    return x / s
