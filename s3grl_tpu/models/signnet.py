"""SIGNNet — the S3GRL MLP scorer, padded-batch TPU edition.

Reference: ``SIGNNet`` (models.py:301-383). Forward there: concat operator
features feature-wise, one MLP layer (``operator_diff``: Linear->ELU->BN->
Dropout), center pooling h_src ⊙ h_dst via first-two-rows-per-graph batch
indices, optional CCN pooling over the remaining rows (mean/sum/concat),
final ReLU MLP to a logit.

TPU redesign: instead of PyG's flat row batching with ``batch`` index vectors,
inputs are padded dense [B, R, D] with a row-validity mask — center pooling is
simply rows 0/1, CCN pooling a masked reduction over rows 2:. Everything jits
to static shapes; no host-side ``np.unique`` per batch (models.py:341).

Parity notes:
- ``pool_operatorwise`` is accepted and stored but the forward pools once on
  the concatenated features — preserving the reference quirk (SURVEY.md #9:
  models.py:310 stores the flag, forward ignores it).
- input width = num_features * (num_layers + 1) (models.py:314-320).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from s3grl_tpu.models.mlp import MLP


class SIGNNet(nn.Module):
    hidden_channels: int
    num_layers: int  # = sign_k (or 2*sign_k - 1 for hybrid)
    dropout: float = 0.5
    pool_operatorwise: bool = False  # stored-but-unused reference quirk
    k_heuristic: int = 0
    k_pool_strategy: str = ""

    @nn.compact
    def __call__(self, xs, row_mask, train: bool = True):
        """xs: [B, R, D_in] concat of (num_layers + 1) operators;
        row_mask: [B, R] (rows 0/1 = targets, rows 2: = CCN slots)."""
        h = MLP(
            [self.hidden_channels],
            dropout=self.dropout,
            act="elu",
            act_first=True,
            batch_norm=True,
            plain_last=False,
            name="operator_diff",
        )(xs, mask=row_mask, train=train)

        # center pooling (models.py:344-350)
        h_src = h[:, 0]
        h_dst = h[:, 1]
        h_a = h_src * h_dst

        if not self.k_heuristic:
            pooled = h_a
        else:
            rest = h[:, 2:]
            rest_mask = row_mask[:, 2:].astype(jnp.float32)[..., None]
            if self.k_pool_strategy == "mean":
                denom = jnp.maximum(rest_mask.sum(axis=1), 1.0)
                h_k = (rest * rest_mask).sum(axis=1) / denom
            elif self.k_pool_strategy == "sum":
                h_k = (rest * rest_mask).sum(axis=1)
            elif self.k_pool_strategy == "concat":
                # exactly k_heuristic rows are expected (reference reshape,
                # models.py:363-366); take the first k_heuristic slots.
                h_k = (rest * rest_mask)[:, : self.k_heuristic].reshape(
                    h.shape[0], self.hidden_channels * self.k_heuristic
                )
            else:
                raise NotImplementedError(
                    f"Check pool strat: {self.k_pool_strategy}"
                )
            pooled = jnp.concatenate([h_a, h_k], axis=-1)

        logit = MLP(
            [self.hidden_channels, 1],
            dropout=self.dropout,
            act="relu",
            act_first=True,
            batch_norm=True,
            plain_last=True,
            name="link_pred_mlp",
        )(pooled, train=train)
        return logit[:, 0]
