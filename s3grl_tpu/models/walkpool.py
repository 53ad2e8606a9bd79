"""WalkPool link predictor, padded-dense TPU edition.

Reference: Software/WalkPooling/src/model.py — two GCN layers, a QK attention
encoder producing per-edge weights (:74-91), "plus" (with candidate link) and
"minus" (without) random-walk transition matrices via edge softmax
(:93-112), and walk-profile features: node-level return probabilities,
link-level transition probabilities and graph-level trace differences for
walk lengths tau = 2..walk_len+1 (:114-219), fed to a 5-layer MLP classifier
(:224-251).

TPU redesign: the per-edge scatter softmax and sparse ``propagate`` calls
become masked dense softmax over [B, S, S] adjacency slices and batched
matmul chains on the MXU; the per-graph identity-feature trick the reference
uses to batch diagonal extraction (:121-135) is unnecessary — walk states are
[B, S, S] matrices whose diagonals/entries are read directly.

The input adjacency must CONTAIN the candidate link (slots 0-1) — the
reference's subgraph datapoints carry the candidate/injected edge with
``edge_mask`` marking it (src/utils.py:165-212).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from s3grl_tpu.models.gnn import ZEmbedding, gcn_norm_adj
from s3grl_tpu.models.mlp import Dense

WP_Z_MAX = 100  # reference: z_max default (src/main.py)


class WalkPoolClassifier(nn.Module):
    """5-layer MLP with input BatchNorm (src/model.py:224-251)."""

    input_size: int
    mse: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from s3grl_tpu.models.mlp import MaskedBatchNorm

        L = self.input_size
        x = MaskedBatchNorm()(x, train=train)
        x = nn.relu(Dense(L * 20)(x))
        x = nn.relu(Dense(L * 20)(x))
        x = nn.relu(Dense(L * 10)(x))
        x = nn.relu(Dense(L)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = Dense(1)(x)
        if self.mse:
            x = jax.nn.sigmoid(x)
        return x[:, 0]


class WalkPoolLinkPred(nn.Module):
    hidden_channels: int = 32
    heads: int = 2
    walk_len: int = 7
    drnl: bool = False
    mse: bool = False

    @nn.compact
    def __call__(self, adj, z, mask, x=None, train: bool = True):
        """adj [B, S, S] INCLUDING candidate link at slots (0, 1);
        z [B, S] labels (used if drnl); mask [B, S]; x [B, S, F] or None."""
        B, S, _ = adj.shape
        H = self.hidden_channels
        heads, tau = self.heads, self.walk_len

        if self.drnl:
            z_emb = ZEmbedding(H)(jnp.clip(z, 0, WP_Z_MAX - 1))
            x = z_emb if x is None else jnp.concatenate([x, z_emb], axis=-1)
        assert x is not None, "WalkPool needs features (init_attribute/ones)"

        # two GCN layers, jk-concat (src/model.py:42-51)
        norm_adj = gcn_norm_adj(adj, mask)
        h1 = jnp.einsum("bst,btf->bsf", norm_adj, Dense(H)(x))
        x_out = jnp.concatenate([x, h1], axis=-1)
        h = nn.Dropout(0.5, deterministic=not train)(nn.relu(h1))
        h2 = jnp.einsum("bst,btf->bsf", norm_adj, Dense(H)(h))
        x_out = jnp.concatenate([x_out, h2], axis=-1)

        # --- attention edge weights (src/model.py:74-91) ---
        q = nn.leaky_relu(Dense(H)(x_out), 0.2)
        k = nn.leaky_relu(Dense(H)(x_out), 0.2)
        q = nn.Dropout(0.5, deterministic=not train)(q)
        k = nn.Dropout(0.5, deterministic=not train)(k)
        q = Dense(heads * H)(q).reshape(B, S, heads, H)
        k = Dense(heads * H)(k).reshape(B, S, heads, H)
        # weights[b, i, j, head] for edge i -> j
        w = jnp.einsum("bihc,bjhc->bijh", q, k) / jnp.sqrt(float(H))

        edge = (adj > 0) & mask[:, None, :] & mask[:, :, None]  # [B, S, S]
        cand = jnp.zeros((S, S), dtype=bool).at[0, 1].set(True).at[1, 0].set(True)
        cand = jnp.broadcast_to(cand[None], edge.shape)
        edge_minus = edge & ~cand

        # omega: sigmoid of attention on the two candidate directions, summed
        omega = jax.nn.sigmoid(w[:, 0, 1, :]) + jax.nn.sigmoid(w[:, 1, 0, :])

        neg_inf = jnp.float32(-1e30)
        we = jnp.where(edge[..., None], w, neg_inf)
        # plus: softmax over incoming edges per target column j (dim i)
        wp = jax.nn.softmax(we, axis=1)
        wp = jnp.where(edge[..., None], wp, 0.0)
        # minus: exp(w - colmax over ALL edges) on non-candidate edges,
        # normalized per column (src/model.py:105-111)
        colmax = we.max(axis=1, keepdims=True)
        wm = jnp.exp(jnp.maximum(we - colmax, -60.0))
        wm = jnp.where(edge_minus[..., None], wm, 0.0)
        wm = wm / (wm.sum(axis=1, keepdims=True) + 1e-16)

        # transition: x'[j] = sum_i w[i->j] x[i]  =>  x' = P x with
        # P[b, j, i] = w[b, i, j]
        def profiles(wmat):
            P = jnp.swapaxes(wmat, 1, 2)  # [B, S, S] per head handled outside
            state = P  # identity start + one propagate (tau = 1)
            nodelv, linklv, graphlv = [], [], []
            for _ in range(tau):
                state = jnp.einsum(
                    "bji,bik->bjk", P, state, preferred_element_type=jnp.float32
                )
                nodelv.append(state[:, 0, 0] + state[:, 1, 1])
                linklv.append(state[:, 0, 1] + state[:, 1, 0])
                diag = jnp.diagonal(state, axis1=1, axis2=2) * mask
                graphlv.append(diag.sum(axis=1))
            return (
                jnp.stack(nodelv, 1),
                jnp.stack(linklv, 1),
                jnp.stack(graphlv, 1),
            )  # each [B, tau]

        node_p, link_p, graph_p = [], [], []
        node_m, link_m, graph_m = [], [], []
        for head in range(heads):
            np_, lp_, gp_ = profiles(wp[..., head])
            nm_, lm_, gm_ = profiles(wm[..., head])
            node_p.append(np_), link_p.append(lp_), graph_p.append(gp_)
            node_m.append(nm_), link_m.append(lm_), graph_m.append(gm_)

        cat = lambda xs: jnp.concatenate(xs, axis=1)  # heads-major blocks
        graphlevel = cat(
            [graph_p[h] - graph_m[h] for h in range(heads)]
        )
        feats = jnp.concatenate(
            [graphlevel, omega, cat(node_p), cat(node_m), cat(link_p), cat(link_m)],
            axis=1,
        )  # [B, heads * (5 tau + 1)]

        return WalkPoolClassifier(
            input_size=heads * (5 * tau + 1), mse=self.mse
        )(feats, train=train)
