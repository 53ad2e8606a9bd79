"""init_representation dispatch: pretrain node features with GAE/VGAE/ARGVA/GIC.

Reference: sgrl_link_pred.py:973-1003 — hidden dims halved for the encoder
(hidden/2 hidden, hidden out), embeddings replace data.x, then
NormalizeFeatures re-normalization.
"""
from __future__ import annotations

import numpy as np

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.graph import Graph, normalize_features
from s3grl_tpu.data.split import EdgeSplit


def pretrain_representation(
    graph: Graph, edge_split: EdgeSplit, cfg: RunConfig
) -> Graph:
    sd = edge_split.as_dict()
    test_and_val = (
        sd["test"]["edge"].T,
        sd["test"]["edge_neg"].T,
        sd["valid"]["edge"].T,
        sd["valid"]["edge_neg"].T,
    )
    edge_index = sd["train"]["edge"].T  # [2, E]

    kind = cfg.init_representation
    if kind in ("GAE", "VGAE", "ARGVA"):
        from s3grl_tpu.models.gae import run_gae

        # reference dims: embedding = hidden, encoder hidden = hidden // 2
        # (sgrl_link_pred.py:977-979)
        _, z = run_gae(
            graph,
            edge_index,
            test_and_val,
            model=kind,
            embedding_dim=cfg.hidden_channels,
            hidden_channels=cfg.hidden_channels // 2,
            lr=cfg.lr,
            epochs=cfg.epochs,
            seed=cfg.seed,
        )
    elif kind == "SVGAE":
        import os as _os

        from s3grl_tpu.models.svgae import run_svgae

        # Reference protocol: Z_DIM=64 fixed, lr 1e-2, and a HARD-CODED 2000
        # pretraining epochs (WalkPooling/software/svgae.py:160) — unlike
        # GAE/VGAE/ARGVA, which train for args.epochs (vgae.py:114). Using
        # cfg.epochs here (typically 50) would silently produce non-parity
        # SVGAE inits (ADVICE r2). Overridable only via env for bounded
        # smoke runs.
        svgae_epochs = int(_os.environ.get("S3GRL_TPU_SVGAE_EPOCHS", "2000"))
        _, z = run_svgae(
            graph,
            edge_index,
            test_and_val,
            embedding_dim=64,
            epochs=svgae_epochs,
            seed=cfg.seed,
        )
    elif kind == "GIC":
        from s3grl_tpu.models.gic import run_gic

        _, z = run_gic(
            graph,
            edge_index,
            test_and_val,
            embedding_dim=cfg.hidden_channels,
            seed=cfg.seed,
            dataset=cfg.dataset,
        )
    else:
        raise NotImplementedError(f"init_representation: {kind} not supported.")

    x = normalize_features(np.asarray(z, dtype=np.float32))
    return graph.with_features(x)
