"""End-to-end integration tests (CPU backend, small configs).

The TPU analog of the reference's config-matrix integration runs
(SURVEY.md §4): seeded runs must learn (AUC well above chance) and reproduce.
"""
import numpy as np
import pytest

from s3grl_tpu.config import RunConfig
from s3grl_tpu.runner import run_sgrl_learning

BASE = dict(
    dataset="USAir",
    model="SIGN",
    optimize_sign=True,
    init_features="degree",
    use_feature=True,
    sign_k=2,
    node_label="zo",
    hidden_channels=32,
    batch_size=32,
    lr=1e-3,
    epochs=2,
    num_hops=1,
    seed=1,
    extract_batch_size=64,
    max_subgraph_nodes=256,
    subgraph_buckets=(64, 256),
    train_percent=25.0,
    val_percent=50.0,
    test_percent=50.0,
)


def test_usair_pos_learns():
    cfg = RunConfig(**{**BASE, "sign_type": "PoS"})
    prep, best, ttimes, itimes, nparams = run_sgrl_learning(cfg)
    assert best > 70.0  # well above chance after 2 tiny epochs
    assert nparams > 0
    assert len(ttimes) == 2


def test_usair_sop_learns():
    cfg = RunConfig(
        **{**BASE, "sign_type": "SoP", "pool_operatorwise": True}
    )
    _, best, _, _, _ = run_sgrl_learning(cfg)
    assert best > 65.0


def test_usair_pos_plus_learns():
    cfg = RunConfig(
        **{
            **BASE,
            "sign_type": "PoS",
            "k_heuristic": 1,
            "k_node_set_strategy": "intersection",
            "k_pool_strategy": "mean",
            "max_ccn_nodes": 8,
        }
    )
    _, best, _, _, _ = run_sgrl_learning(cfg)
    assert best > 65.0


def test_usair_hybrid_learns():
    cfg = RunConfig(
        **{
            **BASE,
            "sign_type": "hybrid",
            "pool_operatorwise": True,
            "optimize_sign": True,
        }
    )
    _, best, _, _, _ = run_sgrl_learning(cfg)
    assert best > 65.0


def test_seeded_reproducibility():
    """Same seed -> identical best test score (SURVEY §4 oracle #1)."""
    cfg = RunConfig(**{**BASE, "sign_type": "PoS", "epochs": 1})
    _, best1, _, _, _ = run_sgrl_learning(cfg)
    _, best2, _, _, _ = run_sgrl_learning(cfg)
    assert best1 == pytest.approx(best2, abs=1e-6)
