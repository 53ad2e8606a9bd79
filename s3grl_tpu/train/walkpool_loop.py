"""WalkPool training engine.

Reference: Software/WalkPooling/src/main.py — Adam(lr=5e-5), BCE-with-logits
(or MSE after sigmoid with --MSE), batch 32, 50 epochs; subgraphs are 2-hop
with the candidate link present/injected (src/utils.py:165-212,
observe-val-and-injection default True).

Same fused on-device pipeline as the SEAL-baseline engine: extraction keeps
the target link and injects it when absent (negative candidates), then the
dense WalkPool forward/backward runs in the same jitted step.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.config import RunConfig
from s3grl_tpu.data.graph import Graph
from s3grl_tpu.data.split import EdgeSplit
from s3grl_tpu.models.walkpool import WalkPoolLinkPred
from s3grl_tpu.operators.pos import measure_subgraph_sizes
from s3grl_tpu.runner_utils import round_up_pow2
from s3grl_tpu.sampling.extraction import (
    DeviceGraph,
    dense_adjacency,
    extract_subgraphs,
)
from s3grl_tpu.sampling.labeling import label_nodes
from s3grl_tpu.train.logger import Logger
from s3grl_tpu.train.loop import _count_params, bce_with_logits
from s3grl_tpu.train.metrics import evaluate_auc


def run_walkpool_learning(
    graph: Graph,
    edge_split: EdgeSplit,
    cfg: RunConfig,
    rng,
    *,
    walk_len: int = 7,
    heads: int = 2,
    mse: bool = False,
):
    from s3grl_tpu.runner import build_split_links

    t_prep0 = time.perf_counter()
    dg = DeviceGraph.from_graph(graph)
    use_x = dg.x is not None
    drnl = cfg.node_label == "drnl"

    splits, link_seeds = {}, {}
    for split, percent in (
        ("train", cfg.train_percent),
        ("valid", cfg.val_percent),
        ("test", cfg.test_percent),
    ):
        links, y = build_split_links(split, edge_split, percent, rng, neg_ratio=cfg.neg_ratio)
        splits[split] = (links.astype(np.int32), y.astype(np.float32))
        link_seeds[split] = (
            np.int64(cfg.seed) * 1_000_003 + np.arange(len(links))
        ).astype(np.int32)

    sizes = [
        measure_subgraph_sizes(
            dg, l, link_seeds[s], num_hops=cfg.num_hops,
            max_nodes_per_hop=cfg.max_nodes_per_hop,
        )
        for s, (l, _) in splits.items()
    ]
    S = min(round_up_pow2(max(int(z.max()) for z in sizes)), cfg.max_subgraph_nodes)

    model = WalkPoolLinkPred(
        hidden_channels=cfg.hidden_channels,
        heads=heads,
        walk_len=walk_len,
        drnl=drnl,
        mse=mse,
    )

    def build_batch(dg, lb, ls):
        sub = extract_subgraphs(
            dg, lb, num_hops=cfg.num_hops, max_nodes=S,
            max_nodes_per_hop=cfg.max_nodes_per_hop, link_seeds=ls,
            remove_target_link=True,
        )
        adj = dense_adjacency(sub)
        # inject/keep the candidate link (WalkPool plus-graph semantics)
        adj = adj.at[:, 0, 1].set(1.0).at[:, 1, 0].set(1.0)
        z = (
            label_nodes(adj, sub.dist, sub.node_mask, node_label="drnl",
                        max_iters=min(cfg.max_label_dist, S))
            if drnl
            else jnp.zeros_like(sub.dist)
        )
        x = (
            dg.x[sub.nodes] * sub.node_mask[:, :, None]
            if use_x
            else jnp.ones((lb.shape[0], S, 1))  # init_attribute='ones' default
        )
        return adj, z, sub.node_mask, x

    key = jax.random.PRNGKey(cfg.seed)
    lb0 = jnp.asarray(splits["train"][0][: cfg.batch_size])
    ls0 = jnp.asarray(link_seeds["train"][: cfg.batch_size])
    adj0, z0, m0, x0 = build_batch(dg, lb0, ls0)
    key, ik, dk = jax.random.split(key, 3)
    variables = model.init({"params": ik, "dropout": dk}, adj0, z0, m0, x=x0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    n_params = _count_params(params)
    total_prep = time.perf_counter() - t_prep0

    # One epoch = one scanned device program; per-batch dispatch paid the
    # tunnel's ~30-100 ms upload tax per step (same fix as gnn_loop).
    @jax.jit
    def train_epoch_scan(params, batch_stats, opt_state, dg,
                         lb_e, ls_e, y_e, w_e, keys_e):
        def body(carry, t):
            params, batch_stats, opt_state = carry
            lb, ls, yb, wb, dkey = t
            adj, z, m, x = build_batch(dg, lb, ls)

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    adj, z, m, x=x, train=True,
                    rngs={"dropout": dkey}, mutable=["batch_stats"],
                )
                if mse:
                    losses = (out - yb) ** 2
                else:
                    losses = bce_with_logits(out, yb)
                return (
                    (losses * wb).sum() / jnp.maximum(wb.sum(), 1.0),
                    mut["batch_stats"],
                )

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_bs, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            (lb_e, ls_e, y_e, w_e, keys_e),
        )
        return params, batch_stats, opt_state, losses.mean()

    @jax.jit
    def predict_all(params, batch_stats, dg, lb_nb, ls_nb):
        def one(t):
            lb, ls = t
            adj, z, m, x = build_batch(dg, lb, ls)
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                adj, z, m, x=x, train=False,
            )

        return jax.lax.map(one, (lb_nb, ls_nb))

    bsz = cfg.batch_size
    eval_batches = {}
    for split in ("valid", "test"):
        links, _ = splits[split]
        seeds = link_seeds[split]
        n = len(links)
        nb = (n + bsz - 1) // bsz
        pad = nb * bsz - n
        lb = np.concatenate([links, np.tile(links[-1:], (pad, 1))]) if pad else links
        ls = np.concatenate([seeds, np.tile(seeds[-1:], pad)]) if pad else seeds
        eval_batches[split] = (
            jnp.asarray(lb.reshape(nb, bsz, 2)),
            jnp.asarray(ls.reshape(nb, bsz)),
            n,
        )

    def predict_split(split):
        lb_nb, ls_nb, n = eval_batches[split]
        out = predict_all(params, batch_stats, dg, lb_nb, ls_nb)
        return np.asarray(out).reshape(-1)[:n]

    loggers = {"AUC": Logger(cfg.runs), "AP": Logger(cfg.runs)}
    np_rng = np.random.default_rng(cfg.seed)
    train_links, train_y = splits["train"]
    L = len(train_links)
    steps = (L + bsz - 1) // bsz
    pad_n = steps * bsz - L
    train_seeds = link_seeds["train"]
    train_times, inference_times = [], []
    for epoch in range(1, cfg.epochs + 1):
        t0 = time.perf_counter()
        perm = np_rng.permutation(L)
        w_e = np.ones(steps * bsz, dtype=np.float32)
        if pad_n:
            w_e[L:] = 0.0
            perm = np.concatenate([perm, np.zeros(pad_n, dtype=perm.dtype)])
        key, ek = jax.random.split(key)
        keys_e = jax.random.split(ek, steps)
        params, batch_stats, opt_state, _ = train_epoch_scan(
            params, batch_stats, opt_state, dg,
            jnp.asarray(train_links[perm].reshape(steps, bsz, 2)),
            jnp.asarray(train_seeds[perm].reshape(steps, bsz)),
            jnp.asarray(train_y[perm].reshape(steps, bsz)),
            jnp.asarray(w_e.reshape(steps, bsz)),
            keys_e,
        )
        train_times.append(time.perf_counter() - t0)
        if epoch % cfg.eval_steps == 0:
            val_pred = predict_split("valid")
            t1 = time.perf_counter()
            test_pred = predict_split("test")
            inference_times.append(time.perf_counter() - t1)
            r = evaluate_auc(
                val_pred, splits["valid"][1], test_pred, splits["test"][1]
            )
            for k, v in r.items():
                loggers[k].add_result(0, v)

    best_scores = []
    for k in loggers:
        loggers[k].add_info(cfg.epochs, cfg.runs)
        best_scores.append(loggers[k].print_statistics())
    return total_prep, best_scores[0], train_times, inference_times, n_params
