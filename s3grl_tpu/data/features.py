"""Feature initialization (init_features).

Reference: sgrl_link_pred.py:956-971 —
- ``degree``: PyG OneHotDegree(max_degree=1024) appended/assigned
- ``eye``:    identity features
- ``n2v``:    node2vec pretraining (s3grl_tpu.models.n2v), with a disk
  cache keyed by (dataset, dim, seed) like the reference's
  ``Emb/{ds}_{dim}_seed{seed}*.pt`` (n2v_prep.py:19-22) — plus an
  edge-set hash so different splits of the same name never collide
followed by NormalizeFeatures re-normalization (:1000-1003).
"""
from __future__ import annotations

import hashlib
import os
from typing import Optional

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


def n2v_cache_path(
    cache_key: str, g: Graph, n2v_dim: int, seed: int, epochs: int
) -> str:
    """``{root}/{ds}_{dim}_seed{seed}_ep{epochs}_{edgehash}.npz`` — the
    reference's Emb/ key (n2v_prep.py:19-22) hardened with a hash of the
    observed edge set (the embedding is trained on the post-split graph,
    so the same dataset name with a different split must not collide)."""
    root = os.environ.get(
        "S3GRL_TPU_EMB_CACHE", os.path.expanduser("~/.cache/s3grl_tpu_emb")
    )
    h = hashlib.sha256(
        np.ascontiguousarray(g.edge_index).tobytes()
        + np.int64(g.num_nodes).tobytes()
    ).hexdigest()[:10]
    return os.path.join(
        root, f"{cache_key}_{n2v_dim}_seed{seed}_ep{epochs}_{h}.npz"
    )


def init_features(
    g: Graph,
    kind: str,
    *,
    n2v_dim: int = 16,
    seed: int = 1,
    epochs: int = 50,
    normalize: bool = True,
    cache_key: Optional[str] = None,
) -> Graph:
    """Apply init_features and the reference's re-normalization.

    ``cache_key`` (usually the dataset name) enables the n2v embedding
    disk cache so multi-experiment suites sharing (dataset, dim, seed)
    pretrain node2vec once (reference n2v_prep.py:19-22,46-47).
    """
    if not kind:
        return g
    if kind == "degree":
        x = one_hot_degree(g)
    elif kind == "eye":
        x = eye_features(g)
    elif kind == "n2v":
        from s3grl_tpu.models.n2v import node2vec_pretrain

        cache_path = None
        if cache_key:
            cache_path = n2v_cache_path(cache_key, g, n2v_dim, seed, epochs)
        if cache_path and os.path.exists(cache_path):
            x = np.load(cache_path)["emb"]
        else:
            x = node2vec_pretrain(
                g, embedding_dim=n2v_dim, seed=seed, epochs=epochs
            )
            if cache_path:
                os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                np.savez_compressed(cache_path, emb=x)
    else:
        raise NotImplementedError(f"init_features {kind}")
    if normalize:
        x = normalize_features(x)
    return g.with_features(x)
