"""Evaluation metrics in pure numpy.

Replicates the reference's metric registry (sgrl_link_pred.py:704-770):
AUC + AP via sklearn there; here self-contained numpy implementations
(validated against sklearn in tests), plus OGB-style Hits@K and MRR
evaluators without the ogb dependency.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def roc_auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """ROC-AUC via the rank statistic (ties handled by midranks)."""
    y_true = np.asarray(y_true).astype(bool)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = int(y_true.sum())
    n_neg = int((~y_true).sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("roc_auc_score requires both classes present")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(len(y_score), dtype=np.float64)
    sorted_scores = y_score[order]
    # midranks for ties
    i = 0
    r = np.arange(1, len(y_score) + 1, dtype=np.float64)
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        r[i : j + 1] = 0.5 * (i + j) + 1.0
        i = j + 1
    ranks[order] = r
    auc = (ranks[y_true].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return float(auc)


def average_precision_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AP = sum over thresholds of (recall delta) * precision, sklearn-style."""
    y_true = np.asarray(y_true).astype(np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    order = np.argsort(-y_score, kind="mergesort")
    y_true = y_true[order]
    y_score = y_score[order]
    # group ties: thresholds are distinct score values
    distinct = np.where(np.diff(y_score))[0]
    threshold_idx = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[threshold_idx]
    fps = (threshold_idx + 1) - tps
    precision = tps / (tps + fps)
    recall = tps / y_true.sum()
    # sklearn: -sum(diff(recall_padded) * precision)
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def evaluate_auc(
    val_pred: np.ndarray,
    val_true: np.ndarray,
    test_pred: np.ndarray,
    test_true: np.ndarray,
) -> Dict[str, Tuple[float, float]]:
    """AUC + AP for valid and test (reference: evaluate_auc,
    sgrl_link_pred.py:757-770)."""
    return {
        "AUC": (
            roc_auc_score(val_true, val_pred),
            roc_auc_score(test_true, test_pred),
        ),
        "AP": (
            average_precision_score(val_true, val_pred),
            average_precision_score(test_true, test_pred),
        ),
    }


def _hits_at_k(pos_pred: np.ndarray, neg_pred: np.ndarray, k: int) -> float:
    """OGB Hits@K: fraction of positives ranked above the K-th best negative."""
    if len(neg_pred) < k:
        return 1.0
    kth = np.sort(neg_pred)[-k]
    return float((pos_pred > kth).mean())


def evaluate_hits(
    pos_val_pred, neg_val_pred, pos_test_pred, neg_test_pred
) -> Dict[str, Tuple[float, float]]:
    """Hits@{20,50,100} (reference: evaluate_hits, sgrl_link_pred.py:704-719)."""
    results = {}
    for K in (20, 50, 100):
        results[f"Hits@{K}"] = (
            _hits_at_k(pos_val_pred, neg_val_pred, K),
            _hits_at_k(pos_test_pred, neg_test_pred, K),
        )
    return results


def _mrr(pos_pred: np.ndarray, neg_pred: np.ndarray) -> float:
    """OGB MRR: neg_pred is [n_pos, n_neg_per_pos]; optimistic/pessimistic mean."""
    neg_pred = neg_pred.reshape(pos_pred.shape[0], -1)
    opt = (neg_pred > pos_pred[:, None]).sum(axis=1)
    pes = (neg_pred >= pos_pred[:, None]).sum(axis=1)
    rank = 0.5 * (opt + pes) + 1.0
    return float((1.0 / rank).mean())


def evaluate_mrr(
    pos_val_pred, neg_val_pred, pos_test_pred, neg_test_pred
) -> Dict[str, Tuple[float, float]]:
    """MRR (reference: evaluate_mrr, sgrl_link_pred.py:722-738)."""
    return {
        "MRR": (
            _mrr(pos_val_pred, neg_val_pred),
            _mrr(pos_test_pred, neg_test_pred),
        )
    }


def evaluate_ogb_rocauc(
    pos_val_pred, neg_val_pred, pos_test_pred, neg_test_pred
) -> Dict[str, Tuple[float, float]]:
    """rocauc over pos/neg score sets (reference: sgrl_link_pred.py:741-754)."""
    def _auc(pos, neg):
        pred = np.concatenate([pos, neg])
        true = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
        return roc_auc_score(true, pred)

    return {
        "rocauc": (
            _auc(pos_val_pred, neg_val_pred),
            _auc(pos_test_pred, neg_test_pred),
        )
    }


def make_eval_fn(eval_metric: str):
    """Metric dispatch by name (reference: sgrl_link_pred.py:1005-1047).

    Adapts the pos/neg-split OGB evaluators to the train loop's
    (val_pred, val_true, test_pred, test_true) calling convention.
    """
    if eval_metric in ("auc", "", None):
        return evaluate_auc
    base = {
        "hits": evaluate_hits,
        "mrr": evaluate_mrr,
        "rocauc": evaluate_ogb_rocauc,
    }[eval_metric]

    def fn(val_pred, val_true, test_pred, test_true):
        pv, nv = val_pred[val_true > 0.5], val_pred[val_true <= 0.5]
        pt, nt = test_pred[test_true > 0.5], test_pred[test_true <= 0.5]
        return base(pv, nv, pt, nt)

    return fn


def eval_metric_for_dataset(dataset: str) -> str:
    """Per-dataset eval metric (reference: sgrl_link_pred.py:1005-1016)."""
    if dataset.startswith("ogbl-citation"):
        return "mrr"
    if dataset == "ogbl-vessel":
        return "rocauc"
    if dataset.startswith("ogbl"):
        return "hits"
    return "auc"
