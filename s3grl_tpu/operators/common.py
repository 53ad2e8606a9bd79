"""Shared containers for precomputed diffusion-operator datasets."""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _xp(a):
    """numpy-or-jax namespace for ``a`` (device arrays stay on device —
    D2H over a tunneled TPU runs at ~20 MB/s, so implicit np conversions
    of large operator tensors are the single worst thing we can do)."""
    if type(a).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


@dataclass
class OperatorDataset:
    """Precomputed SIGN-style per-link operator features.

    The static-shape analog of the reference's list of PyG ``Data`` objects
    with keys x, x1..xK (tuned_SIGN.py:173-185): every link stores R rows
    (2 targets + optional CCN rows) for each of the K+1 operators.

    Arrays may be numpy (host) or jax (device-resident — the precompute
    drivers keep results on device so training never round-trips the host).

    xs:       [L, K+1, R, F'] float  (op 0 = raw trimmed x, ops 1..K = A^k X)
    row_mask: [L, R] bool            (False on padded CCN slots)
    y:        [L] float              labels
    """

    xs: "np.ndarray"
    row_mask: "np.ndarray"
    y: "np.ndarray"

    @property
    def num_links(self) -> int:
        return int(self.xs.shape[0])

    @property
    def num_operators(self) -> int:
        return int(self.xs.shape[1])

    @property
    def num_rows(self) -> int:
        return int(self.xs.shape[2])

    @property
    def feature_dim(self) -> int:
        return int(self.xs.shape[3])

    def model_inputs(self, sign_k: int, last_only: bool = False):
        """Concatenate operators feature-wise for SIGNNet consumption.

        Mirrors the train-loop assembly (sgrl_link_pred.py:449-459):
        xs = [x, x1..xK] concat along features, or only x{K} if
        ``last_only`` (sign_k == -1 mode, tuned_SIGN.py:18-23).
        Returns [L, R, n_ops * F'].
        """
        if last_only:
            ops = self.xs[:, -1:]
        else:
            ops = self.xs[:, : sign_k + 1]
        L, O, R, F = ops.shape
        return ops.transpose(0, 2, 1, 3).reshape(L, R, O * F)

    def concat(self, other: "OperatorDataset") -> "OperatorDataset":
        xp = _xp(self.xs)
        return OperatorDataset(
            xs=xp.concatenate([self.xs, other.xs], axis=0),
            row_mask=xp.concatenate([self.row_mask, other.row_mask], axis=0),
            y=np.concatenate([np.asarray(self.y), np.asarray(other.y)], axis=0),
        )

    def to_host(self) -> "OperatorDataset":
        """Materialize on host (ONE bulk transfer per array)."""
        return OperatorDataset(
            xs=np.asarray(self.xs),
            row_mask=np.asarray(self.row_mask),
            y=np.asarray(self.y),
        )

    def save(self, path: str) -> None:
        """Persist as npz — the analog of the reference's processed
        ``SEAL_{split}_data.pt`` artifacts (sgrl_link_pred.py:87-94)."""
        import os

        host = self.to_host()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, xs=host.xs, row_mask=host.row_mask, y=host.y)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "OperatorDataset":
        with np.load(path) as z:
            return cls(xs=z["xs"], row_mask=z["row_mask"], y=z["y"])

    def hybrid_with(self, sop: "OperatorDataset") -> "OperatorDataset":
        """Hybrid PoS+SoP: append SoP operators x2..xK as x{K+1}..x{2K-1}
        (reference: utils.py:476-477, data[f'x{k}'] = sop x{k - K + 1}).
        Requires equal R (vanilla PoS, R=2)."""
        assert self.num_links == sop.num_links
        assert self.num_rows == sop.num_rows, "hybrid requires vanilla PoS (R=2)"
        xp = _xp(self.xs)
        extra = sop.xs[:, 2:]
        f = max(self.feature_dim, sop.feature_dim)

        def pad(a):
            if a.shape[-1] == f:
                return a
            widths = [(0, 0)] * (a.ndim - 1) + [(0, f - a.shape[-1])]
            return _xp(a).pad(a, widths)

        a, b = pad(self.xs), pad(extra)
        if _xp(a) is not _xp(b):  # mixed host/device -> join on device
            import jax.numpy as jnp

            a, b, xp = jnp.asarray(a), jnp.asarray(b), jnp
        return OperatorDataset(
            xs=xp.concatenate([a, b], axis=1),
            row_mask=self.row_mask,
            y=self.y,
        )
