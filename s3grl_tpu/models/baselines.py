"""Non-subgraph baselines: MF, plain GNN link prediction, node2vec+LR.

Reference: baselines/mf.py (embedding + MLP predictor over hadamard products),
baselines/gnn_link_pred.py (3-layer GCN/SAGE/GIN encoder + dot-product
decoder with fresh per-epoch negative sampling), baselines/n2v.py (node2vec
embeddings + sklearn LogisticRegression on hadamard link features).

All training runs as jitted device programs over the global graph.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.data.graph import Graph
from s3grl_tpu.data.split import EdgeSplit
from s3grl_tpu.models.gae import _gcn_norm_edges
from s3grl_tpu.ops.spmm import spmm
from s3grl_tpu.train.logger import Logger
from s3grl_tpu.train.metrics import evaluate_auc


def _torch_linear_init(key, shape):
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


# --------------------------------------------------------------------------
# MF (baselines/mf.py)
# --------------------------------------------------------------------------
def train_mf(
    graph: Graph,
    edge_split: EdgeSplit,
    *,
    hidden_channels: int = 256,
    num_layers: int = 3,
    dropout: float = 0.5,
    batch_size: int = 64 * 1024,
    lr: float = 0.01,
    epochs: int = 200,
    eval_steps: int = 1,
    seed: int = 1,
) -> Tuple[float, Dict]:
    """Matrix factorization: trainable node embedding + MLP link predictor.

    Per batch: positive log loss on train edges + log loss on uniformly
    random negative pairs (mf.py:40-70 "trivial random sampling")."""
    N = graph.num_nodes
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, num_layers + 2)
    params = {"emb": jax.random.normal(keys[0], (N, hidden_channels))}
    dims = [hidden_channels] * num_layers + [1]
    for i in range(num_layers):
        params[f"w{i}"] = _torch_linear_init(keys[i + 1], (dims[i], dims[i + 1]))
        params[f"b{i}"] = jnp.zeros(dims[i + 1])

    def predictor(p, xi, xj, dkey=None, train=False):
        x = xi * xj
        for i in range(num_layers - 1):
            x = x @ p[f"w{i}"] + p[f"b{i}"]
            x = jax.nn.relu(x)
            if train and dropout > 0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dkey, i), 1 - dropout, x.shape
                )
                x = jnp.where(keep, x / (1 - dropout), 0.0)
        i = num_layers - 1
        x = x @ p[f"w{i}"] + p[f"b{i}"]
        return jax.nn.sigmoid(x[:, 0])

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    pos_train = jnp.asarray(edge_split.train_pos, dtype=jnp.int32)
    E = pos_train.shape[0]

    @jax.jit
    def train_epoch(params, opt_state, key):
        def loss_fn(p, kk):
            k1, k2 = jax.random.split(kk)
            pos = predictor(
                p, p["emb"][pos_train[:, 0]], p["emb"][pos_train[:, 1]], k1, True
            )
            neg_pairs = jax.random.randint(k2, (E, 2), 0, N)
            neg = predictor(
                p, p["emb"][neg_pairs[:, 0]], p["emb"][neg_pairs[:, 1]], k1, True
            )
            return (
                -jnp.log(pos + 1e-15).mean() - jnp.log(1 - neg + 1e-15).mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def score(params, edges):
        return predictor(params, params["emb"][edges[:, 0]], params["emb"][edges[:, 1]])

    sd = edge_split.as_dict()
    logger = {"AUC": Logger(1), "AP": Logger(1)}
    for epoch in range(epochs):
        key, sk = jax.random.split(key)
        params, opt_state, _ = train_epoch(params, opt_state, sk)
        if epoch % eval_steps == 0:
            preds = {}
            for split in ("valid", "test"):
                p = np.asarray(score(params, jnp.asarray(sd[split]["edge"], dtype=jnp.int32)))
                n = np.asarray(score(params, jnp.asarray(sd[split]["edge_neg"], dtype=jnp.int32)))
                preds[split] = (
                    np.concatenate([p, n]),
                    np.concatenate([np.ones(len(p)), np.zeros(len(n))]),
                )
            r = evaluate_auc(*preds["valid"], *preds["test"])
            for k, v in r.items():
                logger[k].add_result(0, v)
    best = logger["AUC"].print_statistics()
    return best, {"params": params}


# --------------------------------------------------------------------------
# Plain GNN link prediction (baselines/gnn_link_pred.py)
# --------------------------------------------------------------------------
def train_gnn(
    graph: Graph,
    edge_split: EdgeSplit,
    *,
    layer: str = "GCN",
    hidden_channels: int = 256,
    dropout: float = 0.5,
    lr: float = 0.01,
    epochs: int = 100,
    eval_steps: int = 1,
    seed: int = 1,
) -> Tuple[float, Dict]:
    """3-layer encoder + dot-product decoder, fresh negatives per epoch."""
    N = graph.num_nodes
    x_np = graph.x if graph.x is not None else np.eye(N, dtype=np.float32)
    x = jnp.asarray(x_np)
    F = x.shape[1]
    edge_index = graph.edge_index
    es, ed, wn = _gcn_norm_edges(np.asarray(edge_index, np.int64), N)
    # un-normalized adjacency for SAGE/GIN aggregation
    es_r = jnp.asarray(edge_index[0], dtype=jnp.int32)
    ed_r = jnp.asarray(edge_index[1], dtype=jnp.int32)
    ones_w = jnp.ones(edge_index.shape[1], dtype=jnp.float32)
    deg = jnp.zeros(N).at[ed_r].add(1.0)

    key = jax.random.PRNGKey(seed)
    dims = [F, hidden_channels, hidden_channels, hidden_channels]
    params = {}
    kidx = 0
    keys = jax.random.split(key, 32)

    def glorot(shape):
        nonlocal kidx
        lim = float(np.sqrt(6.0 / (shape[0] + shape[1])))
        k = keys[kidx]
        kidx += 1
        return jax.random.uniform(k, shape, minval=-lim, maxval=lim)

    for i in range(3):
        if layer == "GIN":
            params[f"w{i}a"] = glorot((dims[i], dims[i + 1]))
            params[f"b{i}a"] = jnp.zeros(dims[i + 1])
            params[f"w{i}b"] = glorot((dims[i + 1], dims[i + 1]))
            params[f"b{i}b"] = jnp.zeros(dims[i + 1])
        elif layer == "SAGE":
            params[f"wl{i}"] = glorot((dims[i], dims[i + 1]))
            params[f"bl{i}"] = jnp.zeros(dims[i + 1])
            params[f"wr{i}"] = glorot((dims[i], dims[i + 1]))
        else:  # GCN
            params[f"w{i}"] = glorot((dims[i], dims[i + 1]))
            params[f"b{i}"] = jnp.zeros(dims[i + 1])

    def conv(p, i, h):
        if layer == "GCN":
            return spmm(es, ed, wn, h @ p[f"w{i}"], N) + p[f"b{i}"]
        if layer == "SAGE":
            agg = spmm(es_r, ed_r, ones_w, h, N) / jnp.maximum(deg, 1.0)[:, None]
            return agg @ p[f"wl{i}"] + p[f"bl{i}"] + h @ p[f"wr{i}"]
        # GIN: nn(x + sum_nbrs x)
        agg = h + spmm(es_r, ed_r, ones_w, h, N)
        y = jax.nn.relu(agg @ p[f"w{i}a"] + p[f"b{i}a"])
        return jax.nn.relu(y @ p[f"w{i}b"] + p[f"b{i}b"])

    def encode(p, dkey=None, train=False):
        h = x
        for i in range(3):
            h = conv(p, i, h)
            if i < 2:
                h = jax.nn.relu(h) if layer != "GIN" else h
                if train and dropout > 0:
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(dkey, i), 1 - dropout, h.shape
                    )
                    h = jnp.where(keep, h / (1 - dropout), 0.0)
        return h

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    pos = jnp.asarray(edge_split.train_pos, dtype=jnp.int32)
    E = pos.shape[0]

    @jax.jit
    def train_epoch(params, opt_state, key):
        k1, k2 = jax.random.split(key)

        def loss_fn(p):
            z = encode(p, k1, True)
            neg = jax.random.randint(k2, (E, 2), 0, N)
            logits = jnp.concatenate(
                [
                    (z[pos[:, 0]] * z[pos[:, 1]]).sum(-1),
                    (z[neg[:, 0]] * z[neg[:, 1]]).sum(-1),
                ]
            )
            labels = jnp.concatenate([jnp.ones(E), jnp.zeros(E)])
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def score(params, edges):
        z = encode(params)
        return jax.nn.sigmoid((z[edges[:, 0]] * z[edges[:, 1]]).sum(-1))

    sd = edge_split.as_dict()
    logger = {"AUC": Logger(1), "AP": Logger(1)}
    for epoch in range(epochs):
        key, sk = jax.random.split(key)
        params, opt_state, _ = train_epoch(params, opt_state, sk)
        if epoch % eval_steps == 0:
            preds = {}
            for split in ("valid", "test"):
                p = np.asarray(score(params, jnp.asarray(sd[split]["edge"], dtype=jnp.int32)))
                n = np.asarray(score(params, jnp.asarray(sd[split]["edge_neg"], dtype=jnp.int32)))
                preds[split] = (
                    np.concatenate([p, n]),
                    np.concatenate([np.ones(len(p)), np.zeros(len(n))]),
                )
            r = evaluate_auc(*preds["valid"], *preds["test"])
            for k, v in r.items():
                logger[k].add_result(0, v)
    best = logger["AUC"].print_statistics()
    return best, {"params": params}


# --------------------------------------------------------------------------
# node2vec + LogisticRegression (baselines/n2v.py)
# --------------------------------------------------------------------------
def run_n2v(
    graph: Graph,
    edge_split: EdgeSplit,
    *,
    hidden_channels: int = 128,
    epochs: int = 10,
    lr: float = 0.01,
    seed: int = 1,
) -> float:
    """node2vec embeddings + sklearn LogisticRegression over hadamard link
    features, class predictions scored (n2v.py:88-119 uses clf.predict)."""
    from sklearn.linear_model import LogisticRegression

    from s3grl_tpu.models.n2v import node2vec_pretrain

    emb = node2vec_pretrain(
        graph, embedding_dim=hidden_channels, epochs=epochs, lr=lr, seed=seed
    )

    sd = edge_split.as_dict()

    def feats(edges):
        return emb[edges[:, 0]] * emb[edges[:, 1]]

    train_e = np.concatenate([sd["train"]["edge"], sd["train"]["edge_neg"]])
    train_y = np.concatenate(
        [np.ones(len(sd["train"]["edge"])), np.zeros(len(sd["train"]["edge_neg"]))]
    )
    clf = LogisticRegression()
    clf.fit(feats(train_e), train_y)

    logger = {"AUC": Logger(1), "AP": Logger(1)}
    preds = {}
    for split in ("valid", "test"):
        e = np.concatenate([sd[split]["edge"], sd[split]["edge_neg"]])
        y = np.concatenate(
            [np.ones(len(sd[split]["edge"])), np.zeros(len(sd[split]["edge_neg"]))]
        )
        # reference parity: hard class predictions, not probabilities
        preds[split] = (clf.predict(feats(e)), y)
    r = evaluate_auc(*preds["valid"], *preds["test"])
    for k, v in r.items():
        logger[k].add_result(0, v)
    return logger["AUC"].print_statistics()
