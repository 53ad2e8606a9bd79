"""SEAL-style GNN baselines on padded dense subgraph batches.

Reference: models.py — DGCNN (:139-222), GCN (:12-75), SAGE (:78-135),
GIN (:225-298). All embed the structural label z via Embedding(max_z=1000)
(sgrl_link_pred.py:929), optionally concat raw features / node embeddings,
run a conv stack, pool, and score with an MLP.

TPU redesign: a "graph batch" is dense padded tensors (adj [B, S, S],
x [B, S, F], mask [B, S]) straight out of the batched extractor — every conv
is a batched matmul on the MXU; sort-pooling is top-k over a channel; no
scatter/segment ops or per-graph indexing anywhere.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from s3grl_tpu.models.mlp import MLP, Dense, MaskedBatchNorm

MAX_Z = 1000  # reference: sgrl_link_pred.py:929


class ZEmbedding(nn.Module):
    """Embedding(max_z, hidden) with torch N(0,1) init; multi-label z
    ([B, S, 2] for de/de+) sums the embeddings (models.py:47-48)."""

    hidden: int

    @nn.compact
    def __call__(self, z):
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (MAX_Z, self.hidden)
        )
        zi = jnp.clip(z.astype(jnp.int32), 0, MAX_Z - 1)
        emb = table[zi]
        if emb.ndim == 4:  # [B, S, L, H] multi-label
            emb = emb.sum(axis=2)
        return emb


def gcn_norm_adj(adj, mask, edge_weight: bool = False):
    """GCNConv normalization: D^-1/2 (A + I) D^-1/2 over valid nodes."""
    a = adj if edge_weight else (adj > 0).astype(jnp.float32)
    a = a * mask[:, :, None] * mask[:, None, :]
    eye = jnp.eye(a.shape[-1])[None] * mask[:, :, None]
    a_hat = a + eye
    deg = a_hat.sum(axis=-1)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
    return a_hat * dinv[:, :, None] * dinv[:, None, :]


class BatchedGCNConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, h, norm_adj):
        h = Dense(self.features)(h)
        return jnp.einsum("bst,btf->bsf", norm_adj, h)


class BatchedSAGEConv(nn.Module):
    """SAGEConv(mean aggr): lin_l(mean_nbrs) + lin_r(x) (lin_r bias-free)."""

    features: int

    @nn.compact
    def __call__(self, h, adj, mask):
        a = (adj > 0).astype(jnp.float32) * mask[:, :, None] * mask[:, None, :]
        deg = a.sum(axis=-1, keepdims=True)
        mean_nbr = jnp.einsum("bst,btf->bsf", a, h) / jnp.maximum(deg, 1.0)
        out = Dense(self.features)(mean_nbr)
        out = out + nn.Dense(
            self.features,
            use_bias=False,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
        )(h)
        return out


class BatchedGINConv(nn.Module):
    """GINConv(train_eps=False): nn((1 + eps) x + sum_nbrs x), eps=0."""

    features: int

    @nn.compact
    def __call__(self, h, adj, mask, train: bool = True):
        a = (adj > 0).astype(jnp.float32) * mask[:, :, None] * mask[:, None, :]
        agg = h + jnp.einsum("bst,btf->bsf", a, h)
        # Sequential(Lin, ReLU, Lin, ReLU, BN) (models.py:241-248)
        y = Dense(self.features)(agg)
        y = nn.relu(y)
        y = Dense(self.features)(y)
        y = nn.relu(y)
        y = MaskedBatchNorm()(y, mask=mask, train=train)
        return y


def dropedge_mask(key, adj, p: float):
    """dropout_adj(force_undirected): drop each undirected edge with prob p
    (models.py:41-44)."""
    if p <= 0:
        return adj
    S = adj.shape[-1]
    keep = jax.random.bernoulli(key, 1.0 - p, adj.shape)
    upper = jnp.triu(keep, k=1)
    sym = upper | jnp.swapaxes(upper, -1, -2)
    return adj * sym


def _build_input(z, x, use_feature, node_emb, z_embedder):
    h = z_embedder(z)
    if use_feature and x is not None:
        h = jnp.concatenate([h, x], axis=-1)
    if node_emb is not None:
        h = jnp.concatenate([h, node_emb], axis=-1)
    return h


class GCNModel(nn.Module):
    """Reference GCN (models.py:12-75): GCNConv stack + center pooling."""

    hidden_channels: int
    num_layers: int
    use_feature: bool = False
    dropout: float = 0.5
    dropedge: float = 0.0
    use_edge_weight: bool = False

    @nn.compact
    def __call__(self, adj, z, mask, x=None, node_emb=None, train: bool = True):
        if train and self.dropedge > 0:
            adj = dropedge_mask(self.make_rng("dropout"), adj, self.dropedge)
        h = _build_input(z, x, self.use_feature, node_emb, ZEmbedding(self.hidden_channels))
        norm_adj = gcn_norm_adj(adj, mask, self.use_edge_weight)
        for i in range(self.num_layers):
            h = BatchedGCNConv(self.hidden_channels)(h, norm_adj)
            if i < self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # center pooling (models.py:62-66)
        pooled = h[:, 0] * h[:, 1]
        out = MLP(
            [self.hidden_channels, 1],
            dropout=self.dropout,
            act="relu",
            act_first=False,
            batch_norm=True,
        )(pooled, train=train)
        return out[:, 0]


class SAGEModel(nn.Module):
    """Reference SAGE (models.py:78-135)."""

    hidden_channels: int
    num_layers: int
    use_feature: bool = False
    dropout: float = 0.5
    dropedge: float = 0.0

    @nn.compact
    def __call__(self, adj, z, mask, x=None, node_emb=None, train: bool = True):
        if train and self.dropedge > 0:
            adj = dropedge_mask(self.make_rng("dropout"), adj, self.dropedge)
        h = _build_input(z, x, self.use_feature, node_emb, ZEmbedding(self.hidden_channels))
        for i in range(self.num_layers):
            h = BatchedSAGEConv(self.hidden_channels)(h, adj, mask)
            if i < self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        pooled = h[:, 0] * h[:, 1]
        out = MLP(
            [self.hidden_channels, 1],
            dropout=self.dropout,
            act="relu",
            act_first=False,
            batch_norm=True,
        )(pooled, train=train)
        return out[:, 0]


class GINModel(nn.Module):
    """Reference GIN (models.py:225-298): jk concat + masked mean pooling."""

    hidden_channels: int
    num_layers: int
    use_feature: bool = False
    dropout: float = 0.5
    jk: bool = True

    @nn.compact
    def __call__(self, adj, z, mask, x=None, node_emb=None, train: bool = True):
        h = _build_input(z, x, self.use_feature, node_emb, ZEmbedding(self.hidden_channels))
        hs = []
        for _ in range(self.num_layers):
            h = BatchedGINConv(self.hidden_channels)(h, adj, mask, train=train)
            hs.append(h)
        feats = jnp.concatenate(hs, axis=-1) if self.jk else hs[-1]
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = (feats * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        out = MLP(
            [self.hidden_channels, 1],
            dropout=0.5,
            act="relu",
            act_first=False,
            batch_norm=True,
        )(pooled, train=train)
        return out[:, 0]


class DGCNN(nn.Module):
    """Reference DGCNN (models.py:139-222): tanh GCN stack -> sort-pool(k) ->
    two Conv1d stages -> MLP. ``k`` is precomputed from the train subgraph
    size distribution (60th percentile, models.py:148-158)."""

    hidden_channels: int
    num_layers: int
    k: int
    use_feature: bool = False
    dropedge: float = 0.0

    @nn.compact
    def __call__(self, adj, z, mask, x=None, node_emb=None, train: bool = True):
        if train and self.dropedge > 0:
            adj = dropedge_mask(self.make_rng("dropout"), adj, self.dropedge)
        h = _build_input(z, x, self.use_feature, node_emb, ZEmbedding(self.hidden_channels))
        norm_adj = gcn_norm_adj(adj, mask)
        feats = []
        dims = [self.hidden_channels] * self.num_layers + [1]
        for d in dims:
            h = jnp.tanh(BatchedGCNConv(d)(h, norm_adj))
            feats.append(h)
        hcat = jnp.concatenate(feats, axis=-1)  # [B, S, hidden*L + 1]

        # global_sort_pool: order rows by last channel desc, keep first k
        last = jnp.where(mask, hcat[:, :, -1], -jnp.inf)
        _, top_idx = jax.lax.top_k(last, min(self.k, hcat.shape[1]))
        b_idx = jnp.arange(hcat.shape[0])[:, None]
        sel = hcat[b_idx, top_idx]  # [B, k, D]
        sel_mask = jnp.take_along_axis(mask, top_idx, axis=1)
        sel = sel * sel_mask[:, :, None]
        if self.k > sel.shape[1]:  # pad graphs smaller than k
            sel = jnp.pad(sel, ((0, 0), (0, self.k - sel.shape[1]), (0, 0)))

        D = sel.shape[-1]
        flat = sel.reshape(sel.shape[0], 1, self.k * D)  # [B, 1, k*D]
        # Conv1d(1, 16, kernel=D, stride=D): one tap per node row
        y = nn.Conv(
            16, kernel_size=(D,), strides=(D,), padding="VALID",
            kernel_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype,
                minval=-1.0 / jnp.sqrt(shape[0] * shape[1]),
                maxval=1.0 / jnp.sqrt(shape[0] * shape[1]),
            ),
        )(flat.transpose(0, 2, 1))  # flax Conv expects [B, L, C]
        y = nn.relu(y)  # [B, k, 16]
        # MaxPool1d(2, 2)
        y = nn.max_pool(y, window_shape=(2,), strides=(2,))
        y = nn.Conv(
            32, kernel_size=(5,), strides=(1,), padding="VALID",
            kernel_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype,
                minval=-1.0 / jnp.sqrt(shape[0] * shape[1]),
                maxval=1.0 / jnp.sqrt(shape[0] * shape[1]),
            ),
        )(y)
        y = nn.relu(y)
        y = y.reshape(y.shape[0], -1)
        out = MLP([128, 1], dropout=0.5, act="relu", act_first=False,
                  batch_norm=True)(y, train=train)
        return out[:, 0]
