"""Sparse-matrix × dense-matrix products (SpMM) for global diffusion chains.

The TPU-native equivalent of ``torch_sparse`` SpMM/spspmm used by the
reference for global A^k chains (sgrl_link_pred.py:161-182, tuned_SIGN.py:94).
Two implementations:

- ``spmm`` — XLA path: gather + scatter-add over the edge list. XLA lowers
  this to fused dynamic-gather/segment-sum; HBM-bandwidth bound, which is the
  roofline for SpMM anyway.
- ``spmm_pallas`` (ops/spmm_pallas.py) — hand-tiled Pallas kernel with
  double-buffered HBM→VMEM DMA for the large-graph regime.

The SoP "spspmm against sparse X" (tuned_SIGN.py:94-100) is NOT reproduced as
a general SpGEMM: the left matrix there is a row-selector with target-entry
zeroing, so it decomposes into row propagation + a rank-1 correction (see
operators/sop.py) — no sparse-sparse product is ever needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def spmm(
    edge_src: jax.Array,  # [E] int32
    edge_dst: jax.Array,  # [E] int32
    edge_weight: jax.Array,  # [E] float
    x: jax.Array,  # [N, C]
    num_nodes: int,
) -> jax.Array:
    """Y[v] = sum over edges (u -> v) of w_e * X[u].

    This computes A^T X for A[u, v] = w_(u->v); for the symmetric normalized
    adjacencies used everywhere in S3GRL, A^T X = A X.
    """
    contrib = x[edge_src] * edge_weight[:, None]  # [E, C]
    out = jnp.zeros((num_nodes, x.shape[1]), dtype=x.dtype)
    return out.at[edge_dst].add(contrib)


def normalized_adjacency_weights(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Edge weights of D^-1/2 A D^-1/2 for the *binary* adjacency.

    Reference: the SoP global normalization (sgrl_link_pred.py:165-173) builds
    SparseTensor(row, col) — implicit 1s — then scales by deg^-1/2 both sides.
    """
    deg = jnp.zeros(num_nodes, dtype=jnp.float32).at[edge_dst].add(1.0)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
    return inv_sqrt[edge_src] * inv_sqrt[edge_dst]
