"""Feature initialization (init_features).

Reference: sgrl_link_pred.py:956-971 —
- ``degree``: PyG OneHotDegree(max_degree=1024) appended/assigned
- ``eye``:    identity features
- ``n2v``:    node2vec pretraining (s3grl_tpu.models.n2v)
followed by NormalizeFeatures re-normalization (:1000-1003).
"""
from __future__ import annotations

import numpy as np

from s3grl_tpu.data.graph import Graph, normalize_features


def one_hot_degree(g: Graph, max_degree: int = 1024) -> np.ndarray:
    """PyG OneHotDegree semantics: one-hot of (in-)degree, capped columns.

    OneHotDegree concatenates to existing x; for the S3GRL datasets using
    init_features='degree' x is None, so the one-hot IS the feature matrix.
    """
    deg = np.minimum(g.degrees, max_degree)
    out = np.zeros((g.num_nodes, max_degree + 1), dtype=np.float32)
    out[np.arange(g.num_nodes), deg] = 1.0
    if g.x is not None:
        return np.concatenate([g.x, out], axis=1)
    return out


def eye_features(g: Graph) -> np.ndarray:
    return np.eye(g.num_nodes, dtype=np.float32)


def init_features(
    g: Graph,
    kind: str,
    *,
    n2v_dim: int = 16,
    seed: int = 1,
    epochs: int = 50,
    normalize: bool = True,
) -> Graph:
    """Apply init_features and the reference's re-normalization."""
    if not kind:
        return g
    if kind == "degree":
        x = one_hot_degree(g)
    elif kind == "eye":
        x = eye_features(g)
    elif kind == "n2v":
        from s3grl_tpu.models.n2v import node2vec_pretrain

        x = node2vec_pretrain(
            g, embedding_dim=n2v_dim, seed=seed, epochs=epochs
        )
    else:
        raise NotImplementedError(f"init_features {kind}")
    if normalize:
        x = normalize_features(x)
    return g.with_features(x)
