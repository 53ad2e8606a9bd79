"""Graph autoencoder init-representation models: GAE / VGAE / ARGVA.

Reference: baselines/vgae.py — GCN encoders + inner-product decoder trained
on the observed (train-positive) graph; the learned node embeddings replace
``data.x`` (sgrl_link_pred.py:973-988: hidden = hidden/2, out = embedding_dim).

Parity note (preserved bug): the reference compares the *module object*
against the strings 'ARGVA'/'VGAE' after reassigning ``model`` to the torch
module (baselines/vgae.py:120,126), so the KL term is never added and the
ARGVA discriminator is never trained — every variant effectively optimizes
the reconstruction loss only. We reproduce that effective behavior (flag
``faithful_bug=True``) because it is what produced the reference's numbers;
set it False for the textbook objective.

TPU design: the global-graph GCNConv is an SpMM over the normalized edge
list; the whole train step (encode + sampled recon loss + Adam) is one jit.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.data.graph import Graph
from s3grl_tpu.ops.spmm import spmm
from s3grl_tpu.train.metrics import evaluate_auc


def _gcn_norm_edges(edge_index: np.ndarray, num_nodes: int):
    """GCNConv normalization with self loops: edges + weights for SpMM."""
    ei = np.concatenate(
        [edge_index, np.tile(np.arange(num_nodes, dtype=edge_index.dtype), (2, 1))],
        axis=1,
    )
    deg = np.zeros(num_nodes)
    np.add.at(deg, ei[1], 1.0)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    w = dinv[ei[0]] * dinv[ei[1]]
    return (
        jnp.asarray(ei[0], dtype=jnp.int32),
        jnp.asarray(ei[1], dtype=jnp.int32),
        jnp.asarray(w, dtype=jnp.float32),
    )


def _glorot(key, shape):
    lim = float(np.sqrt(6.0 / (shape[0] + shape[1])))
    return jax.random.uniform(key, shape, minval=-lim, maxval=lim)


def _encode(params, es, ed, w, x, n, variational, key=None, sample=False):
    h = spmm(es, ed, w, x @ params["w1"], n)
    h = jax.nn.relu(h)
    if not variational:
        return spmm(es, ed, w, h @ params["w2"], n), None, None
    mu = spmm(es, ed, w, h @ params["w_mu"], n)
    logstd = spmm(es, ed, w, h @ params["w_ls"], n)
    if sample:
        eps = jax.random.normal(key, mu.shape)
        return mu + eps * jnp.exp(logstd), mu, logstd
    return mu, mu, logstd


def _recon_loss(z, pos_src, pos_dst, neg_src, neg_dst):
    """PyG GAE.recon_loss: -log sigma(z_u . z_v) on positives plus
    -log(1 - sigma(.)) on uniformly sampled negatives."""
    eps = 1e-15
    pos = jax.nn.sigmoid((z[pos_src] * z[pos_dst]).sum(-1))
    neg = jax.nn.sigmoid((z[neg_src] * z[neg_dst]).sum(-1))
    return -jnp.log(pos + eps).mean() - jnp.log(1 - neg + eps).mean()


def run_gae(
    graph: Graph,
    edge_index: np.ndarray,  # [2, E] train edges (message passing + recon)
    test_and_val: Tuple[np.ndarray, ...],  # (test_pos, test_neg, val_pos, val_neg) [2, E]
    model: str = "GAE",
    *,
    embedding_dim: int = 128,
    hidden_channels: int = 64,
    lr: float = 1e-4,
    epochs: int = 50,
    seed: int = 1,
    faithful_bug: bool = True,
) -> Tuple[float, np.ndarray]:
    """Train the autoencoder; returns (best test AUC x100, embeddings [N, D])."""
    N = graph.num_nodes
    x = jnp.asarray(
        graph.x
        if graph.x is not None
        else np.eye(N, dtype=np.float32)
    )
    F = x.shape[1]
    es, ed, w = _gcn_norm_edges(np.asarray(edge_index, dtype=np.int64), N)
    variational = model in ("VGAE", "ARGVA")

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 8)
    if variational:
        params = {
            "w1": _glorot(keys[0], (F, hidden_channels)),
            "w_mu": _glorot(keys[1], (hidden_channels, embedding_dim)),
            "w_ls": _glorot(keys[2], (hidden_channels, embedding_dim)),
        }
    else:
        params = {
            "w1": _glorot(keys[0], (F, hidden_channels)),
            "w2": _glorot(keys[1], (hidden_channels, embedding_dim)),
        }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    pos_src = jnp.asarray(edge_index[0], dtype=jnp.int32)
    pos_dst = jnp.asarray(edge_index[1], dtype=jnp.int32)
    E = pos_src.shape[0]
    add_kl = variational and not faithful_bug

    @jax.jit
    def train_step(params, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        neg_src = jax.random.randint(k1, (E,), 0, N)
        neg_dst = jax.random.randint(k2, (E,), 0, N)

        def loss_fn(p):
            z, mu, logstd = _encode(
                p, es, ed, w, x, N, variational, key=k3, sample=True
            )
            loss = _recon_loss(z, pos_src, pos_dst, neg_src, neg_dst)
            if add_kl:
                logstd_c = jnp.minimum(logstd, 10.0)
                kl = -0.5 * jnp.mean(
                    jnp.sum(
                        1 + 2 * logstd_c - mu**2 - jnp.exp(logstd_c) ** 2, axis=1
                    )
                )
                loss = loss + kl / N
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def encode_eval(params):
        z, _, _ = _encode(params, es, ed, w, x, N, variational, sample=False)
        return z

    def scores(z, pos, neg):
        pos, neg = np.asarray(pos), np.asarray(neg)
        s = np.concatenate(
            [
                np.asarray((z[pos[0]] * z[pos[1]]).sum(-1)),
                np.asarray((z[neg[0]] * z[neg[1]]).sum(-1)),
            ]
        )
        t = np.concatenate([np.ones(pos.shape[1]), np.zeros(neg.shape[1])])
        return 1 / (1 + np.exp(-s)), t

    test_pos, test_neg, val_pos, val_neg = test_and_val
    history = []
    for _ in range(epochs):
        key, sk = jax.random.split(key)
        params, opt_state, _ = train_step(params, opt_state, sk)
        zh = np.asarray(encode_eval(params))
        vp, vt = scores(zh, val_pos, val_neg)
        tp, tt = scores(zh, test_pos, test_neg)
        r = evaluate_auc(vp, vt, tp, tt)
        history.append((r["AUC"][0], r["AUC"][1]))

    # reference returns (highest-valid-selected test score, LAST epoch's z)
    # (baselines/vgae.py:160-170: z is from the final eval)
    best_test = max(history, key=lambda h: h[0])[1]
    return 100 * best_test, zh
