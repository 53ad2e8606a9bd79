"""node2vec pretraining in JAX.

Reference: n2v_prep.py:10-48 — PyG Node2Vec(walk_length=20, context_size=10,
walks_per_node=10, num_negative_samples=1, p=1, q=1), SparseAdam(lr=0.01),
batch 32, trained for ``epochs`` epochs; output embeddings become init
features (sgrl_link_pred.py:966-971).

TPU redesign: walk generation is a jitted ``lax.scan`` over a padded neighbor
table (uniform neighbor choice — p=q=1 makes the biased alias walk reduce to
this), and the skip-gram window loss runs as one batched program per step.
The torch_cluster C++ random_walk kernel is replaced by pure device code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s3grl_tpu.data.graph import Graph
from s3grl_tpu.sampling.extraction import DeviceGraph


@functools.partial(jax.jit, static_argnames=("walk_length",))
def random_walks(
    nbr: jax.Array,  # [N, D] padded neighbor table
    deg: jax.Array,  # [N] clamped degrees
    starts: jax.Array,  # [W] start nodes
    key: jax.Array,
    walk_length: int,
) -> jax.Array:
    """Uniform random walks [W, walk_length + 1] (torch_cluster.random_walk
    semantics for p=q=1: isolated nodes repeat in place)."""

    def step(carry, k):
        cur = carry
        u = jax.random.uniform(k, cur.shape)
        d = jnp.maximum(deg[cur], 1)
        idx = jnp.minimum((u * d).astype(jnp.int32), d - 1)
        nxt = nbr[cur, idx]
        nxt = jnp.where(deg[cur] > 0, nxt, cur)
        return nxt, nxt

    keys = jax.random.split(key, walk_length)
    _, path = jax.lax.scan(step, starts, keys)
    return jnp.concatenate([starts[None, :], path], axis=0).T


def node2vec_pretrain(
    g: Graph,
    embedding_dim: int = 16,
    *,
    walk_length: int = 20,
    context_size: int = 10,
    walks_per_node: int = 10,
    num_negative_samples: int = 1,
    lr: float = 0.01,
    epochs: int = 50,
    batch_size: int = 512,
    seed: int = 1,
) -> np.ndarray:
    """Train node2vec embeddings; returns [N, embedding_dim] float32."""
    dg = DeviceGraph.from_graph(g)
    N = g.num_nodes
    deg = jnp.asarray(np.minimum(g.degrees, dg.nbr.shape[1]), dtype=jnp.int32)

    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    emb = jax.random.normal(ik, (N, embedding_dim)) * 1.0  # torch Embedding N(0,1)

    tx = optax.adam(lr)
    opt_state = tx.init(emb)

    n_windows = walk_length + 1 - context_size + 1

    def train_step(emb, opt_state, starts, key):
        kw, kn = jax.random.split(key)
        pos_rw = random_walks(dg.nbr, deg, starts, kw, walk_length)
        # negative walks: random nodes (PyG neg_sample)
        neg_rw = jax.random.randint(
            kn,
            (starts.shape[0] * num_negative_samples, walk_length + 1),
            0,
            N,
        )
        neg_rw = neg_rw.at[:, 0].set(
            jnp.tile(starts, num_negative_samples)
        )

        def windows(rw):
            return jnp.stack(
                [rw[:, j : j + context_size] for j in range(n_windows)], axis=1
            ).reshape(-1, context_size)

        pw, nw = windows(pos_rw), windows(neg_rw)

        def loss_fn(e):
            def skipgram(w):
                start = e[w[:, 0]]  # [M, H]
                rest = e[w[:, 1:]]  # [M, C-1, H]
                return (start[:, None, :] * rest).sum(-1).reshape(-1)

            pos_out = skipgram(pw)
            neg_out = skipgram(nw)
            pos_loss = -jax.nn.log_sigmoid(pos_out).mean()
            # log(1 - sigmoid(x)) == log_sigmoid(-x). The reference's
            # log(1 - sigmoid + eps) form (PyG Node2Vec.loss) is unstable
            # under XLA fusion: (1.0 - sigmoid) + eps can reassociate to
            # (1.0 + eps) - sigmoid == 1.0 - sigmoid -> log(0) = -inf once
            # sigmoid saturates, and NaN gradients poison the embeddings.
            neg_loss = -jax.nn.log_sigmoid(-neg_out).mean()
            return pos_loss + neg_loss

        loss, grads = jax.value_and_grad(loss_fn)(emb)
        updates, opt_state = tx.update(grads, opt_state)
        emb = optax.apply_updates(emb, updates)
        return emb, opt_state, loss

    # Device-resident epochs: each epoch's minibatch loop is ONE compiled
    # lax.scan program (one dispatch per epoch). The step-per-dispatch form
    # (~2k dispatches) was latency-bound on remote TPU — ~130 s for USAir —
    # and a single scan over ALL epochs' steps triggers a superlinear
    # XLA:TPU compile blowup (42-step scan: 13 s; 2100-step: 542 s), so the
    # sweet spot is scan-per-epoch: compile once, ~50 cheap dispatches.
    all_starts = np.repeat(np.arange(N, dtype=np.int32), walks_per_node)
    rng = np.random.default_rng(seed)
    steps = -(-len(all_starts) // batch_size)

    def epoch_sched() -> np.ndarray:
        perm = rng.permutation(len(all_starts))
        pad = steps * batch_size - len(all_starts)
        if pad:
            perm = np.concatenate([perm, rng.choice(len(all_starts), pad)])
        return all_starts[perm].reshape(steps, batch_size)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch(emb, opt_state, sched, key):
        def body(carry, xs):
            emb, opt_state = carry
            starts, k = xs
            emb, opt_state, _ = train_step(emb, opt_state, starts, k)
            return (emb, opt_state), ()

        keys = jax.random.split(key, sched.shape[0])
        (emb, opt_state), _ = jax.lax.scan(
            body, (emb, opt_state), (sched, keys)
        )
        return emb, opt_state

    for _ in range(epochs):
        key, ek = jax.random.split(key)
        emb, opt_state = train_epoch(
            emb, opt_state, jnp.asarray(epoch_sched()), ek
        )
    return np.asarray(emb, dtype=np.float32)
