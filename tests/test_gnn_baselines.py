"""SEAL GNN baseline tests: conv-layer oracles + end-to-end learning."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from s3grl_tpu.config import RunConfig
from s3grl_tpu.models.gnn import gcn_norm_adj
from s3grl_tpu.runner import run_sgrl_learning


def test_gcn_norm_matches_formula():
    rng = np.random.default_rng(0)
    B, S = 2, 6
    adj = (rng.random((B, S, S)) < 0.4).astype(np.float32)
    adj = np.triu(adj, 1) + np.triu(adj, 1).transpose(0, 2, 1)
    mask = np.ones((B, S), dtype=bool)
    mask[1, 4:] = False
    got = np.asarray(gcn_norm_adj(jnp.asarray(adj), jnp.asarray(mask)))
    for b in range(B):
        m = mask[b]
        a = adj[b] * np.outer(m, m)
        a_hat = a + np.diag(m.astype(np.float32))
        deg = a_hat.sum(1)
        dinv = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-30)), 0)
        exp = a_hat * dinv[:, None] * dinv[None, :]
        assert np.allclose(got[b], exp, atol=1e-6)


BASE = dict(
    dataset="USAir",
    num_hops=1,
    hidden_channels=16,
    num_layers=3,
    batch_size=32,
    lr=1e-3,
    epochs=2,
    seed=1,
    train_percent=20.0,
    val_percent=50.0,
    test_percent=50.0,
    max_subgraph_nodes=128,
)


@pytest.mark.parametrize(
    "model,label",
    [("GCN", "drnl"), ("SAGE", "drnl"), ("GIN", "drnl"), ("GCN", "de"), ("DGCNN", "drnl")],
)
def test_gnn_baseline_learns(model, label):
    cfg = RunConfig(**{**BASE, "model": model, "node_label": label})
    prep, best, ttimes, itimes, nparams = run_sgrl_learning(cfg)
    assert nparams > 0
    assert best > 60.0, f"{model}/{label} failed to learn: {best}"


def test_gnn_static_cache_matches_dynamic(monkeypatch):
    """The static-dataset mode (extract+label once per link, re-densify
    the adjacency from the global table per batch — reference SEALDataset
    semantics) must produce the same learning trajectory as per-epoch
    extraction: same deterministic subgraphs, same labels, same AUC."""
    cfg = RunConfig(**{**BASE, "model": "DGCNN", "node_label": "drnl",
                       "epochs": 3})
    monkeypatch.setenv("S3GRL_TPU_GNN_STATIC", "0")
    _, best_dyn, _, _, _ = run_sgrl_learning(cfg)
    monkeypatch.setenv("S3GRL_TPU_GNN_STATIC", "auto")
    _, best_sta, _, _, _ = run_sgrl_learning(cfg)
    assert abs(best_dyn - best_sta) < 1.0, (best_dyn, best_sta)
