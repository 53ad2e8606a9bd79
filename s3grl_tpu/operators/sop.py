"""SoP (Subgraph of Powers) operator precompute.

Reference semantics (`OptimizedSignOperations.get_SoP_prepped_ds`,
tuned_SIGN.py:49-134): for each link (src, dst) and power k of the globally
sym-normalized adjacency Â, store

    x_k = [ [Â^k[src,src],  (Â^k[src,:] with entry [src,dst] zeroed) · X ]
            [Â^k[dst,dst],  (Â^k[dst,:] with entry [dst,src] zeroed) · X ] ]

and x = [[1, X[src]], [1, X[dst]]].

The reference materializes a giant (2L × N) sparse gather matrix per power,
runs one spspmm against sparse X, then assembles rows in a Python loop
(tuned_SIGN.py:64-133). TPU-native redesign — no sparse matrix, no SpGEMM:

1. propagate the endpoint one-hot rows through the power chain with SpMM:
   ``R_k = R_{k-1} Â`` (so R_k = rows of Â^k for this batch's endpoints);
2. the target-entry zeroing is a rank-1 correction:
   (row - a_uv e_v) · X = row·X - a_uv X[v], with a_uv read from R_k;
3. the h-diagonal prepend (tuned_SIGN.py:108-113) reads Â^k[u,u] from R_k.

Everything is batched over links; the SpMM is the HBM-bandwidth-bound hot op.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.ops.spmm import spmm
from s3grl_tpu.sampling.extraction import DeviceGraph


@functools.partial(jax.jit, static_argnames=("sign_k", "num_nodes"))
def _sop_power_features(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    norm_w: jax.Array,
    x_global: jax.Array,  # [N, F]
    *,
    sign_k: int,
    num_nodes: int,
) -> jax.Array:
    """Global diffusion chain Y_k = Â^k X, stacked [K, N, F] (one pass)."""
    ys = []
    y = x_global
    for _ in range(sign_k):
        y = spmm(edge_src, edge_dst, norm_w, y, num_nodes)
        ys.append(y)
    return jnp.stack(ys, axis=0)


@functools.partial(jax.jit, static_argnames=("sign_k", "num_nodes"))
def _sop_batch(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    norm_w: jax.Array,
    x_global: jax.Array,  # [N, F]
    ys: jax.Array,  # [K, N, F] global Â^k X
    links: jax.Array,  # [B, 2]
    *,
    sign_k: int,
    num_nodes: int,
) -> jax.Array:
    """SoP operator features for one link batch: [B, K+1, 2, F+1].

    Only the scalar entries Â^k[u,v] / Â^k[u,u] need per-batch propagation;
    the feature product reuses the global chain:
    (Â^k[u,:] with [u,v] zeroed) · X  =  Y_k[u] - Â^k[u,v] · X[v].
    """
    B = links.shape[0]
    F = x_global.shape[1]
    src, dst = links[:, 0], links[:, 1]

    ends = jnp.stack([src, dst], axis=1).reshape(-1)  # [2B]
    other = jnp.stack([dst, src], axis=1).reshape(-1)  # counterpart per row
    R = jax.nn.one_hot(ends, num_nodes, dtype=jnp.float32)  # [2B, N]

    # x (op 0): [1 | X[endpoint]]  (tuned_SIGN.py:119-124)
    ones = jnp.ones((B, 2, 1))
    x0 = jnp.concatenate([ones, x_global[links]], axis=-1)  # [B, 2, F+1]

    rows2b = jnp.arange(2 * B)
    x_other = x_global[other]  # [2B, F]

    ops = [x0]
    for k in range(sign_k):
        # R <- R @ Â  == (Â^T R^T)^T == spmm since Â symmetric
        R = spmm(edge_src, edge_dst, norm_w, R.T, num_nodes).T  # [2B, N]
        a_uv = R[rows2b, other]  # Â^k[u, v] (the zeroed entry)
        a_uu = R[rows2b, ends]  # Â^k[u, u] (h-diagonal prepend)
        g = ys[k][ends] - a_uv[:, None] * x_other  # [2B, F]
        gh = jnp.concatenate([a_uu[:, None], g], axis=-1)  # [2B, F+1]
        ops.append(gh.reshape(B, 2, F + 1))

    return jnp.stack(ops, axis=1)  # [B, K+1, 2, F+1]


def precompute_sop(
    dg: DeviceGraph,
    links: np.ndarray,  # [L, 2]
    y: np.ndarray,
    *,
    sign_k: int,
    batch_size: int = 0,
    x_override: Optional[np.ndarray] = None,
    use_pallas: Optional[bool] = None,
) -> OperatorDataset:
    """Host driver for SoP precompute over all links.

    ``use_pallas=None`` auto-selects: the global ``Â^k X`` chain (the hot,
    whole-graph op) runs on the Pallas BSR kernel on TPU when the densified
    block layout fits the memory budget; the per-batch endpoint-row
    propagation stays on the XLA gather/segment-sum path (it is one-hot
    seeded and batch-shaped, not worth a second block layout).
    """
    assert dg.x is not None or x_override is not None, "SoP requires features"
    x_global = dg.x if x_override is None else jnp.asarray(x_override)
    N = dg.num_nodes
    F = int(x_global.shape[1])
    L = links.shape[0]
    links = np.asarray(links, dtype=np.int32)

    # Normalized weights computed host-side (E-sized, cheap) so the Pallas
    # blockify path never reads a device buffer back over the tunnel.
    src_h, dst_h, _ = dg.host_edges()
    deg_h = np.zeros(N, dtype=np.float32)
    np.add.at(deg_h, dst_h, 1.0)
    inv_sqrt_h = np.where(deg_h > 0, 1.0 / np.sqrt(np.maximum(deg_h, 1e-30)), 0.0)
    norm_w_h = (inv_sqrt_h[src_h] * inv_sqrt_h[dst_h]).astype(np.float32)
    norm_w = jnp.asarray(norm_w_h)

    from s3grl_tpu.ops import spmm_pallas as sp

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and sp.should_use_pallas(
            src_h, dst_h, N, F
        )
    if use_pallas:
        adj = sp.blockify(src_h, dst_h, norm_w_h, N)
        ys = sp.power_chain(adj, x_global, sign_k)
    else:
        ys = _sop_power_features(
            dg.edge_src, dg.edge_dst, norm_w, x_global,
            sign_k=sign_k, num_nodes=N,
        )

    if batch_size <= 0:
        # Two memory drivers scale with the batch: the [2B, N] propagation
        # state AND the [E, 2B] edge-message intermediate XLA materializes
        # inside each SpMM (mul + scatter-add both hold one — at BlogCatalog
        # scale E=568k an unbounded batch compiled two 10 GB temps and
        # OOM'd HBM). Budget ~192 MB state / ~2x384 MB edge messages.
        E_edges = int(dg.edge_src.shape[0])
        batch_size = max(
            16,
            min(
                4096,
                24_000_000 // max(N, 1),
                48_000_000 // max(E_edges, 1),
            ),
        )

    # Device-resident assembly; batches kept at FULL padded size (distinct
    # remainder-slice shapes would each trigger a fresh remote XLA compile),
    # pads dropped by one gather.
    chunks = []
    for start in range(0, L, batch_size):
        lb = links[start : start + batch_size]
        bsz = len(lb)
        if bsz < batch_size:
            lb = np.concatenate([lb, np.tile(lb[-1:], (batch_size - bsz, 1))])
        xs = _sop_batch(
            dg.edge_src,
            dg.edge_dst,
            norm_w,
            x_global,
            ys,
            jnp.asarray(lb),
            sign_k=sign_k,
            num_nodes=N,
        )
        chunks.append(xs)
    xs_cat = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    xs_out = xs_cat[:L] if len(chunks) == 1 else jnp.take(
        xs_cat,
        jnp.asarray(
            np.concatenate([
                i * batch_size + np.arange(
                    min(batch_size, L - i * batch_size), dtype=np.int32
                )
                for i in range(len(chunks))
            ])
        ),
        axis=0,
    )

    row_mask = np.ones((L, 2), dtype=bool)
    return OperatorDataset(
        xs=xs_out, row_mask=row_mask, y=np.asarray(y, dtype=np.float32)
    )
