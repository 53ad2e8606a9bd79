"""Seeded edge splitting and negative sampling.

Replicates the *semantics* of the reference's split pipeline
(`utils.py:588-678`): PyG ``train_test_split_edges`` + self-loop-guarded
``negative_sampling`` with ``neg_ratio``, and ``get_pos_neg_edges`` percent
subsampling. Bit-exact torch RNG streams are out of scope (documented in
SURVEY.md §7 "hard parts"); distributional semantics and fixed-split results
are asserted in tests instead.

Key parity details preserved:
- val/test positives are single-direction upper-triangle pairs;
- the remaining train positives are re-symmetrized, so every train edge
  appears in BOTH orientations (PyG ``to_undirected`` inside
  ``train_test_split_edges``), and the observed message-passing graph equals
  exactly those train edges;
- val/test negatives are drawn without replacement from the global non-edge
  set (upper triangle, no self loops);
- train negatives are sampled uniformly from ordered non-self-loop non-edges,
  ``neg_ratio`` per train positive.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from s3grl_tpu.data.graph import Graph, to_undirected


@dataclass
class EdgeSplit:
    """Split container matching the reference's ``split_edge`` dict layout
    (`utils.py:627-634`): arrays are [E, 2] (row = one candidate link)."""

    train_pos: np.ndarray
    train_neg: np.ndarray
    valid_pos: np.ndarray
    valid_neg: np.ndarray
    test_pos: np.ndarray
    test_neg: np.ndarray

    def as_dict(self) -> Dict[str, Dict[str, np.ndarray]]:
        return {
            "train": {"edge": self.train_pos, "edge_neg": self.train_neg},
            "valid": {"edge": self.valid_pos, "edge_neg": self.valid_neg},
            "test": {"edge": self.test_pos, "edge_neg": self.test_neg},
        }

    @classmethod
    def from_dict(cls, d) -> "EdgeSplit":
        def a(x):
            x = np.asarray(x, dtype=np.int64)
            return x if x.ndim == 2 and x.shape[1] == 2 else x.T

        return cls(
            train_pos=a(d["train"]["edge"]),
            train_neg=a(d["train"]["edge_neg"]),
            valid_pos=a(d["valid"]["edge"]),
            valid_neg=a(d["valid"]["edge_neg"]),
            test_pos=a(d["test"]["edge"]),
            test_neg=a(d["test"]["edge_neg"]),
        )


def _edge_key(row: np.ndarray, col: np.ndarray, num_nodes: int) -> np.ndarray:
    return row.astype(np.int64) * num_nodes + col.astype(np.int64)


def sample_negative_edges(
    num_nodes: int,
    existing_key: np.ndarray,
    num_samples: int,
    rng: np.random.Generator,
    force_undirected: bool = False,
) -> np.ndarray:
    """Uniformly sample ordered (i, j), i != j, (i, j) not in ``existing_key``.

    Rejection sampling without replacement — the TPU-friendly analog of PyG
    ``negative_sampling`` after ``add_self_loops`` (reference: utils.py:597-600
    — the self-loop addition is exactly the self-loop guard).
    Returns [num_samples, 2] int64.
    """
    existing = set(existing_key.tolist())
    out = np.empty((num_samples, 2), dtype=np.int64)
    found = 0
    seen: set[int] = set()
    while found < num_samples:
        n_draw = max(int((num_samples - found) * 1.5) + 16, 32)
        src = rng.integers(0, num_nodes, size=n_draw)
        dst = rng.integers(0, num_nodes, size=n_draw)
        for s, d in zip(src, dst):
            if s == d:
                continue
            k = int(s) * num_nodes + int(d)
            if k in existing or k in seen:
                continue
            if force_undirected:
                k2 = int(d) * num_nodes + int(s)
                if k2 in existing or k2 in seen:
                    continue
                seen.add(k2)
            seen.add(k)
            out[found] = (s, d)
            found += 1
            if found == num_samples:
                break
    return out


def do_edge_split(
    graph: Graph,
    val_ratio: float = 0.05,
    test_ratio: float = 0.1,
    neg_ratio: int = 1,
    rng: Optional[np.random.Generator] = None,
) -> tuple[Graph, EdgeSplit]:
    """Split graph edges (reference: `do_edge_split`, utils.py:588-634).

    Returns (graph restricted to symmetrized train positives, EdgeSplit).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    N = graph.num_nodes
    row, col = graph.edge_index[0], graph.edge_index[1]
    mask = row < col  # upper triangle — one canonical direction per edge
    row, col = row[mask], col[mask]
    n_edges = row.shape[0]
    n_v = int(np.floor(val_ratio * n_edges))
    n_t = int(np.floor(test_ratio * n_edges))

    perm = rng.permutation(n_edges)
    row, col = row[perm], col[perm]

    val_pos = np.stack([row[:n_v], col[:n_v]], axis=1).astype(np.int64)
    test_pos = np.stack([row[n_v : n_v + n_t], col[n_v : n_v + n_t]], axis=1).astype(
        np.int64
    )
    tr_r, tr_c = row[n_v + n_t :], col[n_v + n_t :]
    train_pos_sym = to_undirected(
        np.stack([tr_r, tr_c]).astype(np.int32)
    )  # both orientations, PyG train_test_split_edges parity
    train_pos = train_pos_sym.T.astype(np.int64)

    # val/test negatives: without replacement from global upper-tri non-edges.
    all_key = _edge_key(graph.edge_index[0], graph.edge_index[1], N)
    valtest_neg = sample_negative_edges(
        N, all_key, n_v + n_t, rng, force_undirected=True
    )
    # PyG samples from the upper-triangular non-edge mask: canonicalize i<j.
    lo = valtest_neg.min(axis=1)
    hi = valtest_neg.max(axis=1)
    valtest_neg = np.stack([lo, hi], axis=1)
    val_neg = valtest_neg[:n_v]
    test_neg = valtest_neg[n_v:]

    # train negatives: negative_sampling over train graph + self loops,
    # count = train_pos (symmetrized) * neg_ratio (reference: utils.py:597-600).
    train_key = _edge_key(train_pos_sym[0], train_pos_sym[1], N)
    train_neg = sample_negative_edges(
        N, train_key, train_pos.shape[0] * neg_ratio, rng
    )

    new_graph = graph.with_edges(train_pos_sym)
    return new_graph, EdgeSplit(
        train_pos=train_pos,
        train_neg=train_neg,
        valid_pos=val_pos,
        valid_neg=val_neg,
        test_pos=test_pos,
        test_neg=test_neg,
    )


@dataclass
class OgbEdgeSplit:
    """OGB-format split container (reference: utils.py:637-678).

    ``split_edge`` is the raw OGB split dict with numpy arrays, in either
    layout:
    - edge format: ``{split: {"edge": [E, 2], ["edge_neg": [E, 2]]}}``
      (train "edge_neg" present only for pre-sampled-negative datasets
      like ogbl-vessel);
    - source/target format (ogbl-citation2):
      ``{split: {"source_node", "target_node", ["target_node_neg"]}}``.

    ``edge_index`` is the observed (train) graph — the self-loop-guarded
    negative-sampling support when train negatives must be drawn fresh.
    """

    split_edge: dict
    num_nodes: int
    edge_index: np.ndarray  # [2, E] observed graph

    @property
    def valid_pos(self) -> np.ndarray:
        d = self.split_edge["valid"]
        if "edge" in d:
            return np.asarray(d["edge"], dtype=np.int64)
        return np.stack(
            [np.asarray(d["source_node"]), np.asarray(d["target_node"])],
            axis=1,
        ).astype(np.int64)

    def pos_neg(
        self,
        split: str,
        percent: float = 100.0,
        neg_ratio: int = 1,
        rng: Optional[np.random.Generator] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Both OGB branches of the reference's ``get_pos_neg_edges``
        (utils.py:637-678). Returns (pos [P, 2], neg [Q, 2]) int64."""
        if rng is None:
            rng = np.random.default_rng(0)
        d = self.split_edge[split]
        if "edge" in self.split_edge["train"]:
            pos_edge = np.asarray(d["edge"], dtype=np.int64)
            if "edge_neg" in self.split_edge["train"]:
                # pre-sampled negatives (ogbl-vessel; utils.py:641-643)
                neg_edge = np.asarray(d["edge_neg"], dtype=np.int64)
            else:
                # Reference quirk preserved (utils.py:640-648): the
                # presence check is on the TRAIN dict, so when train has
                # no edge_neg (ogbl-collab/ppa/ddi), fresh self-loop-
                # guarded negatives are sampled for EVERY split — OGB's
                # official valid/test negatives are discarded.
                key = _edge_key(self.edge_index[0], self.edge_index[1],
                                self.num_nodes)
                neg_edge = sample_negative_edges(
                    self.num_nodes, key, len(pos_edge) * neg_ratio, rng
                )
            if percent < 100.0:
                perm = rng.permutation(len(pos_edge))
                pos_edge = pos_edge[perm[: int(percent / 100 * len(pos_edge))]]
                perm = rng.permutation(len(neg_edge))
                neg_edge = neg_edge[perm[: int(percent / 100 * len(neg_edge))]]
            return pos_edge, neg_edge

        # source/target format (utils.py:660-678)
        source = np.asarray(d["source_node"], dtype=np.int64)
        target = np.asarray(d["target_node"], dtype=np.int64)
        if split == "train":
            target_neg = rng.integers(
                0, self.num_nodes, size=(len(target), 1), dtype=np.int64
            )
        else:
            target_neg = np.asarray(d["target_node_neg"], dtype=np.int64)
        if percent < 100.0:
            perm = rng.permutation(len(source))
            perm = perm[: int(percent / 100 * len(source))]
            source, target, target_neg = (
                source[perm], target[perm], target_neg[perm, :]
            )
        pos_edge = np.stack([source, target], axis=1)
        k = target_neg.shape[1]
        neg_edge = np.stack(
            [np.repeat(source, k), target_neg.reshape(-1)], axis=1
        )
        return pos_edge, neg_edge


def get_pos_neg_edges(
    split: str,
    edge_split,
    percent: float = 100.0,
    rng: Optional[np.random.Generator] = None,
    neg_ratio: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Percent subsampling of a split's links (reference: utils.py:637-678).

    Dispatches on the split container: ``EdgeSplit`` (do_edge_split output)
    or ``OgbEdgeSplit`` (OGB split-dict formats).
    Returns (pos [P, 2], neg [Q, 2]) int64.
    """
    if isinstance(edge_split, OgbEdgeSplit):
        return edge_split.pos_neg(
            split, percent=percent, neg_ratio=neg_ratio, rng=rng
        )
    d = edge_split.as_dict()[
        {"train": "train", "valid": "valid", "test": "test"}[split]
    ]
    pos_edge, neg_edge = d["edge"], d["edge_neg"]
    if percent < 100.0:
        if rng is None:
            rng = np.random.default_rng(0)
        num_pos = pos_edge.shape[0]
        perm = rng.permutation(num_pos)[: int(percent / 100 * num_pos)]
        pos_edge = pos_edge[perm]
        num_neg = neg_edge.shape[0]
        perm = rng.permutation(num_neg)[: int(percent / 100 * num_neg)]
        neg_edge = neg_edge[perm]
    return pos_edge, neg_edge
