"""Link-prediction heuristics: CN, AA, PPR.

Reference: utils.py:681-742 (scipy row products + fast_pagerank). TPU-native:
adjacency rows are densified per link batch from the padded neighbor table
(one scatter per batch) and scored with vectorized reductions; PPR is batched
power iteration — a dense [B, N] state advanced by SpMM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.graph import Graph
from s3grl_tpu.data.split import EdgeSplit
from s3grl_tpu.sampling.extraction import DeviceGraph
from s3grl_tpu.train.logger import Logger
from s3grl_tpu.train.metrics import evaluate_auc


def _dense_rows(dg: DeviceGraph, nodes: jax.Array) -> jax.Array:
    """Densify adjacency rows A[nodes] -> [B, N] via the padded nbr table."""
    B = nodes.shape[0]
    nbr = dg.nbr[nodes]  # [B, D]
    w = dg.nbr_w[nodes] * dg.nbr_mask[nodes]
    out = jnp.zeros((B, dg.num_nodes))
    return out.at[jnp.arange(B)[:, None], nbr].add(w)


@jax.jit
def cn_scores(dg: DeviceGraph, links: jax.Array) -> jax.Array:
    """Common Neighbors: sum(A[src] * A[dst]) (utils.py:681-690)."""
    rs = _dense_rows(dg, links[:, 0])
    rd = _dense_rows(dg, links[:, 1])
    return (rs * rd).sum(axis=1)


@jax.jit
def aa_scores(dg: DeviceGraph, links: jax.Array) -> jax.Array:
    """Adamic-Adar: sum(A[src] * (A[dst] / log deg)) (utils.py:693-706)."""
    deg = jnp.zeros(dg.num_nodes).at[dg.edge_dst].add(dg.edge_weight)
    mult = jnp.where(deg > 0, 1.0 / jnp.log(deg), 0.0)
    mult = jnp.where(jnp.isfinite(mult), mult, 0.0)
    rs = _dense_rows(dg, links[:, 0])
    rd = _dense_rows(dg, links[:, 1]) * mult[None, :]
    return (rs * rd).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("damping", "n_iter"))
def ppr_scores(
    dg: DeviceGraph,
    links: jax.Array,
    damping: float = 0.85,
    n_iter: int = 100,
) -> jax.Array:
    """Personalized PageRank score of dst under src's PPR vector
    (utils.py:709-742, fast_pagerank.pagerank_power semantics: column-
    stochastic transition with uniform dangling redistribution)."""
    N = dg.num_nodes
    out_deg = jnp.zeros(N).at[dg.edge_src].add(dg.edge_weight)
    inv_out = jnp.where(out_deg > 0, 1.0 / out_deg, 0.0)
    dangling = (out_deg == 0).astype(jnp.float32)

    src = links[:, 0]
    B = src.shape[0]
    p0 = jax.nn.one_hot(src, N)  # personalization [B, N]

    def step(_, s):
        # s W where W[u, v] = w_uv / outdeg(u); dangling mass -> personalize
        contrib = s[:, dg.edge_src] * (dg.edge_weight * inv_out[dg.edge_src])[None, :]
        sw = jnp.zeros((B, N)).at[:, dg.edge_dst].add(contrib)
        dang = (s * dangling[None, :]).sum(axis=1, keepdims=True)
        return damping * (sw + dang * p0) + (1.0 - damping) * p0

    s = jax.lax.fori_loop(0, n_iter, step, p0)
    return s[jnp.arange(B), links[:, 1]]


HEURISTICS = {"CN": cn_scores, "AA": aa_scores, "PPR": ppr_scores}


def heuristic_scores(
    graph: Graph, links: np.ndarray, name: str, batch_size: int = 4096
) -> np.ndarray:
    dg = DeviceGraph.from_graph(graph)
    fn = HEURISTICS[name]
    outs = []
    links = np.asarray(links, dtype=np.int32)
    for s in range(0, len(links), batch_size):
        lb = links[s : s + batch_size]
        pad = 0
        if len(lb) < batch_size and s > 0:
            pad = batch_size - len(lb)
            lb = np.concatenate([lb, np.tile(lb[-1:], (pad, 1))])
        o = np.asarray(fn(dg, jnp.asarray(lb)))
        outs.append(o[: len(o) - pad] if pad else o)
    return np.concatenate(outs)


def run_heuristic(graph: Graph, edge_split: EdgeSplit, cfg: RunConfig):
    """Heuristic evaluation path (sgrl_link_pred.py:1049-1095).

    Returns the reference's result tuple shape with best test AUC."""
    name = cfg.use_heuristic
    sd = edge_split.as_dict()
    preds = {}
    for split in ("valid", "test"):
        for kind in ("edge", "edge_neg"):
            preds[(split, kind)] = heuristic_scores(graph, sd[split][kind], name)

    val_pred = np.concatenate([preds[("valid", "edge")], preds[("valid", "edge_neg")]])
    val_true = np.concatenate(
        [np.ones(len(preds[("valid", "edge")])), np.zeros(len(preds[("valid", "edge_neg")]))]
    )
    test_pred = np.concatenate([preds[("test", "edge")], preds[("test", "edge_neg")]])
    test_true = np.concatenate(
        [np.ones(len(preds[("test", "edge")])), np.zeros(len(preds[("test", "edge_neg")]))]
    )
    results = evaluate_auc(val_pred, val_true, test_pred, test_true)
    # Reference quirk preserved: the heuristic path returns the RAW test AUC
    # in [0, 1] (sgrl_link_pred.py:1095 returns results[0][0][-1] without the
    # x100 scaling the learning path applies via Logger.print_statistics).
    return 0.0, results["AUC"][1], [], [], 0
