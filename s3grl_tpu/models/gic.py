"""GIC (Graph InfoClust) init-representation model.

Reference: Software/GIC/ — one GCN layer (xavier Linear + SpMM over the
normalized-with-self-loops adjacency + PReLU, layers/gcn.py), a DGI bilinear
discriminator against row-shuffled features (layers/discriminator.py), and a
ClusterNet soft-K-means cluster discriminator (layers/cluster.py: cosine
similarities sharpened by softmax(beta * sim), 10+1 iterations from a fixed
random init). Loss = alpha * BCE(DGI logits) + (1-alpha) * BCE(cluster
logits) with per-dataset (beta, alpha, K) (GICEmbs.py:96-108).

Faithfully preserved reference quirks:
- the optimizer steps ONLY on epochs where the loss does not improve the
  best-so-far (GICEmbs.py:156-166's if/else places backward+step in the
  else branch);
- early stopping patience 100 on training loss;
- returned embeddings are L2 row-normalized encoder outputs from the last
  evaluation, NaN-zeroed.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.data.graph import Graph
from s3grl_tpu.ops.spmm import spmm
from s3grl_tpu.train.metrics import evaluate_auc

DATASET_HPARAMS = {
    # data_name -> (beta, alpha, num_clusters)  (GICEmbs.py:96-108)
    "cora": (100.0, 0.5, 128),
    "citeseer": (100.0, 0.5, 128),
    "pubmed": (10.0, 0.75, 32),
}
DEFAULT_HPARAMS = (100.0, 0.5, 10)


def _norm_adj_with_self_loops(edge_index: np.ndarray, n: int):
    """normalize_adj(A + I): D^-1/2 (A+I) D^-1/2 (GICEmbs.py:121)."""
    ei = np.concatenate(
        [edge_index, np.tile(np.arange(n, dtype=edge_index.dtype), (2, 1))], axis=1
    )
    deg = np.zeros(n)
    np.add.at(deg, ei[0], 1.0)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    w = dinv[ei[0]] * dinv[ei[1]]
    return (
        jnp.asarray(ei[0], dtype=jnp.int32),
        jnp.asarray(ei[1], dtype=jnp.int32),
        jnp.asarray(w, dtype=jnp.float32),
    )


def _soft_kmeans(h, mu_init, beta, num_iter):
    """ClusterNet cosine soft k-means (layers/cluster.py:13-51)."""
    data = h / (jnp.linalg.norm(h, axis=1, keepdims=True) + 1e-6)

    def body(mu, _):
        mu = mu / (jnp.linalg.norm(mu, axis=1, keepdims=True) + 1e-6)
        dist = data @ mu.T  # [N, K]
        r = jax.nn.softmax(beta * dist, axis=1)
        cluster_r = r.sum(axis=0)
        cluster_mean = r.T @ data
        return cluster_mean / cluster_r[:, None], dist

    mu, dists = jax.lax.scan(body, mu_init, None, length=num_iter)
    r = jax.nn.softmax(beta * dists[-1], axis=1)
    return mu, r


def run_gic(
    graph: Graph,
    edge_index: np.ndarray,  # [2, E] train edges
    test_and_val: Tuple[np.ndarray, ...],
    *,
    embedding_dim: int = 128,
    lr: float = 1e-4,
    epochs: int = 50,
    eval_steps: int = 1,
    patience: int = 100,
    seed: int = 1,
    dataset: str = "",
) -> Tuple[float, np.ndarray]:
    """Train GIC; returns (best test AUC x100, embeddings [N, D])."""
    beta, alpha, num_clusters = DATASET_HPARAMS.get(
        dataset.lower(), DEFAULT_HPARAMS
    )
    N = graph.num_nodes
    x_np = graph.x if graph.x is not None else np.eye(N, dtype=np.float32)
    x = jnp.asarray(x_np)
    F = x.shape[1]
    H = embedding_dim
    es, ed, w = _norm_adj_with_self_loops(np.asarray(edge_index, np.int64), N)

    key = jax.random.PRNGKey(seed)
    k = jax.random.split(key, 6)
    lim = float(np.sqrt(6.0 / (F + H)))
    blim = float(np.sqrt(6.0 / (2 * H)))
    params = {
        "w_gcn": jax.random.uniform(k[0], (F, H), minval=-lim, maxval=lim),
        "b_gcn": jnp.zeros(H),
        "prelu_a": jnp.full((1,), 0.25),
        # DGI bilinear f_k(h, c) = h W c + b (xavier init, bias 0)
        "w_bil": jax.random.uniform(
            k[1], (H, H), minval=-blim, maxval=blim
        ),
        "b_bil": jnp.zeros(1),
    }
    mu_init = jax.random.uniform(k[2], (num_clusters, H))  # fixed torch.rand init

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def encode(p, feats):
        h = spmm(es, ed, w, feats @ p["w_gcn"], N) + p["b_gcn"]
        return jnp.where(h > 0, h, p["prelu_a"] * h)  # PReLU

    def forward_loss(p, shuf_idx):
        h1 = encode(p, x)
        h2 = encode(p, x[shuf_idx])
        # cluster summary per node: c2 = sigmoid(S @ Z)
        mu0, _ = _soft_kmeans(h1, mu_init, beta, 10)
        mu, r = _soft_kmeans(h1, jax.lax.stop_gradient(mu0), beta, 1)
        c2 = jax.nn.sigmoid(r @ mu)  # [N, H]
        # DGI graph summary
        c = jax.nn.sigmoid(h1.mean(axis=0))  # [H]
        sc1 = (h1 @ p["w_bil"]) @ c + p["b_bil"][0]
        sc2 = (h2 @ p["w_bil"]) @ c + p["b_bil"][0]
        logits = jnp.concatenate([sc1, sc2])
        lbl = jnp.concatenate([jnp.ones(N), jnp.zeros(N)])
        bce1 = optax.sigmoid_binary_cross_entropy(logits, lbl).mean()
        # cluster discriminator: dot(h, c2) per node
        sc1c = (h1 * c2).sum(axis=1)
        sc2c = (h2 * c2).sum(axis=1)
        logits2 = jnp.concatenate([sc1c, sc2c])
        bce2 = optax.sigmoid_binary_cross_entropy(logits2, lbl).mean()
        return alpha * bce1 + (1 - alpha) * bce2

    @jax.jit
    def loss_and_step(p, opt_state, shuf_idx):
        loss, grads = jax.value_and_grad(forward_loss)(p, shuf_idx)
        updates, new_opt = tx.update(grads, opt_state)
        new_p = optax.apply_updates(p, updates)
        return loss, new_p, new_opt

    @jax.jit
    def embed(p):
        h = encode(p, x)
        h = h / jnp.linalg.norm(h, axis=1, keepdims=True)
        return jnp.nan_to_num(h)

    def roc(embs, pos, neg):
        s = embs @ embs.T
        sp = np.asarray([s[e[0], e[1]] for e in pos.T])
        sn = np.asarray([s[e[0], e[1]] for e in neg.T])
        pred = 1 / (1 + np.exp(-np.concatenate([sp, sn])))
        true = np.concatenate([np.ones(len(sp)), np.zeros(len(sn))])
        return pred, true

    test_pos, test_neg, val_pos, val_neg = [np.asarray(a) for a in test_and_val]
    rng = np.random.default_rng(seed)
    best = np.inf
    cnt_wait = 0
    history = []
    embs = np.asarray(embed(params))
    for epoch in range(epochs):
        shuf = jnp.asarray(rng.permutation(N))
        loss, new_p, new_opt = loss_and_step(params, opt_state, shuf)
        loss = float(loss)
        if loss < best:
            # reference quirk: improving epochs only checkpoint, never step
            best = loss
            cnt_wait = 0
        else:
            cnt_wait += 1
            if cnt_wait == patience:
                break
            params, opt_state = new_p, new_opt
        if epoch % eval_steps == 0:
            embs = np.asarray(embed(params))
            vp, vt = roc(embs, val_pos, val_neg)
            tp, tt = roc(embs, test_pos, test_neg)
            r = evaluate_auc(vp, vt, tp, tt)
            history.append((r["AUC"][0], r["AUC"][1]))

    best_test = max(history, key=lambda h: h[0])[1] if history else 0.0
    return 100 * best_test, embs
