"""Non-optimized ("full-row") SIGN operator precompute.

Reference semantics: the ``optimize_sign=False`` branch of
``extract_enclosing_subgraphs`` (utils.py:497-553). Per link the reference
keeps the WHOLE enclosing subgraph:

- **PoS**: ``k_hop_subgraph`` -> ``construct_pyg_graph`` with SIGN kwargs,
  which prepends the structural label z as the FIRST feature column
  (utils.py:308-312), then the PyG ``SIGN``/``TunedSIGN`` transform computes
  ``x{k} = (D^-1/2 A D^-1/2)^k [z | x]`` for k = 1..K over ALL subgraph rows
  (tuned_SIGN.py:13-23). Unlike the optimized flows (which hardcode the
  zero-one target indicator, tuned_SIGN.py:177-179), node_label here is live:
  drnl / de / de+ / hop / zo / degree all flow into the feature matrix.

- **SoP**: per power k, ``k_hop_subgraph`` runs on the GLOBAL normalized
  power Â^k (utils.py:533-546). The paper configs use ``num_hops=-1`` so the
  extracted node set is exactly {src, dst}; target-link removal
  (utils.py:78-80) zeroes the off-diagonal, leaving the 2x2 diagonal
  [Â^k[s,s], Â^k[d,d]], and ``SoP_data_creation`` (tuned_SIGN.py:25-44)
  yields ``x{k} = diag(Â^k[s,s], Â^k[d,d]) @ [z_k | x_{s,d}]``. Any other
  num_hops gives per-power subgraphs of different sizes, which the
  reference model cannot consume (torch.cat row mismatch in
  models.py:374) — rejected here with a clear error instead.

TPU redesign: one jitted program per link batch — batched padded extraction,
batched masked-BFS labeling, and the full-row power chain as a neighbor-table
gather + einsum (no dense [S, S] power materialization). Assembly is
host-side: full-row datasets are O(L * S * (K+1) * F) and exist for parity /
label-trick research, not as the performance path (that is the optimized
target-row flow).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.ops.spmm import normalized_adjacency_weights, spmm
from s3grl_tpu.sampling.extraction import (
    DeviceGraph,
    SubgraphBatch,
    dense_adjacency,
    extract_subgraphs,
    pick_bucket,
)
from s3grl_tpu.sampling.labeling import label_nodes


def _label_columns(
    sub: SubgraphBatch, node_label: str, max_label_dist: int
) -> jax.Array:
    """z as feature column(s) [B, S, Z] (Z = 2 for de/de+, else 1)."""
    if node_label == "zo":
        z = (sub.dist == 0).astype(jnp.float32) * sub.node_mask
        return z[:, :, None]
    if node_label == "hop":
        z = sub.dist.astype(jnp.float32) * sub.node_mask
        return z[:, :, None]
    z = label_nodes(
        dense_adjacency(sub),
        sub.dist,
        sub.node_mask,
        node_label=node_label,
        max_iters=max_label_dist,
    )
    if z.ndim == 2:
        z = z[:, :, None]
    return z


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_hops",
        "max_nodes",
        "ratio_per_hop",
        "max_nodes_per_hop",
        "sign_k",
        "node_label",
        "max_label_dist",
    ),
)
def _extract_and_operate_fullrow(
    dg: DeviceGraph,
    links: jax.Array,
    link_seeds: jax.Array,
    *,
    num_hops: int,
    max_nodes: int,
    ratio_per_hop: float,
    max_nodes_per_hop,
    sign_k: int,
    node_label: str,
    max_label_dist: int,
):
    """Fused extraction + labeling + full-row PoS power chain for one batch.

    Returns (xs [B, K+1, S, Z+F], row_mask [B, S]).
    """
    sub = extract_subgraphs(
        dg,
        links,
        num_hops=num_hops,
        max_nodes=max_nodes,
        ratio_per_hop=ratio_per_hop,
        max_nodes_per_hop=max_nodes_per_hop,
        link_seeds=link_seeds,
    )
    B, S = sub.nodes.shape

    z = _label_columns(sub, node_label, max_label_dist)  # [B, S, Z]
    x_sub = dg.x[sub.nodes] * sub.node_mask[:, :, None]  # [B, S, F]
    # label-first concat (utils.py:308-312)
    subg_x = jnp.concatenate([z, x_sub], axis=-1)  # [B, S, Z+F]

    # Sym-normalized weights on the local neighbor structure — identical
    # normalization to the optimized path (tuned_SIGN.py:155-161 / PyG SIGN).
    b_idx = jnp.arange(B)
    flat_j = (b_idx[:, None, None] * S + sub.nbr_local).reshape(-1)
    deg = sub.nbr_w.sum(axis=-1)
    dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-30)), 0.0)
    dinv_j = jnp.take(dinv.reshape(-1), flat_j).reshape(sub.nbr_local.shape)
    w_norm = sub.nbr_w * dinv[:, :, None] * dinv_j  # [B, S, D]

    Fz = subg_x.shape[-1]
    D = sub.nbr_local.shape[2]
    # The [B*S*D, Fz] gather keeps Fz (label+feature width, >= 17 in every
    # non-optimized config) in the minor dim — tiling pad <= 7.5x at worst,
    # and the full-row flows only run on the small reference datasets. The
    # narrow-minor-dim blowup this layout CAN hit is guarded in the
    # optimized path (operators/pos.py, R as small as 2 at large-graph
    # scale) by per-row 1-D gathers.
    ops = [subg_x]
    y = subg_x
    for _ in range(sign_k):
        gathered = jnp.take(y.reshape(B * S, Fz), flat_j, axis=0).reshape(
            B, S, D, Fz
        )
        y = jnp.einsum(
            "bsd,bsdf->bsf",
            w_norm,
            gathered,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ops.append(y)

    xs = jnp.stack(ops, axis=1)  # [B, K+1, S, Z+F]
    xs = xs * sub.node_mask[:, None, :, None]
    return xs, sub.node_mask


def precompute_pos_fullrow(
    dg: DeviceGraph,
    links: np.ndarray,  # [L, 2]
    y: np.ndarray,
    *,
    num_hops: int,
    sign_k: int,
    node_label: str = "drnl",
    max_label_dist: int = 32,
    ratio_per_hop: float = 1.0,
    max_nodes_per_hop: Optional[int] = None,
    buckets=(32, 64, 128, 256, 512, 1024),
    batch_size: int = 256,
    max_subgraph_nodes: int = 1024,
    seed: int = 0,
) -> OperatorDataset:
    """Host driver for the non-optimized PoS flow (utils.py:497-531).

    Buckets links by subgraph size like the optimized driver; every bucket's
    rows are padded to the LARGEST bucket used so one [L, K+1, S, F'] tensor
    comes out. Assembly is host-side numpy: full-row datasets are large and
    reloaded batch-wise by training if they exceed device memory.
    """
    assert dg.x is not None, "SIGN flows require node features"
    L = links.shape[0]
    links = np.asarray(links, dtype=np.int32)
    link_seeds = (np.int64(seed) * 1_000_003 + np.arange(L)).astype(np.int32)

    buckets = [
        b
        for b in sorted(set(list(buckets) + [max_subgraph_nodes]))
        if b <= max_subgraph_nodes
    ]

    from s3grl_tpu.operators.pos import measure_subgraph_sizes

    sizes = measure_subgraph_sizes(
        dg,
        links,
        link_seeds,
        num_hops=num_hops,
        ratio_per_hop=ratio_per_hop,
        max_nodes_per_hop=max_nodes_per_hop,
        batch_size=max(batch_size, 512),
    )

    order = np.argsort(sizes, kind="stable")
    bucket_of = np.array([pick_bucket(int(s), buckets) for s in sizes[order]])
    s_max = int(bucket_of.max()) if len(bucket_of) else int(buckets[0])

    Fz = int(dg.x.shape[1]) + (2 if node_label in ("de", "de+") else 1)
    xs_all = np.zeros((L, sign_k + 1, s_max, Fz), dtype=np.float32)
    mask_all = np.zeros((L, s_max), dtype=bool)

    # [B, S, S] labeling + [B, S, D, F] propagation bound the batch size.
    ELEM_BUDGET = 192_000_000
    for bucket in np.unique(bucket_of):
        idx_all = order[bucket_of == bucket]
        per_link = int(bucket) * max(int(bucket), Fz * (sign_k + 1))
        bsz_cap = max(4, min(batch_size, ELEM_BUDGET // max(per_link, 1)))
        bsz_cap = 1 << (bsz_cap.bit_length() - 1)
        for start in range(0, len(idx_all), bsz_cap):
            idx = idx_all[start : start + bsz_cap]
            bsz = len(idx)
            lb = links[idx]
            ls = link_seeds[idx]
            if bsz < bsz_cap:
                lb = np.concatenate([lb, np.tile(lb[-1:], (bsz_cap - bsz, 1))])
                ls = np.concatenate([ls, np.tile(ls[-1:], bsz_cap - bsz)])
            xs, row_mask = _extract_and_operate_fullrow(
                dg,
                jnp.asarray(lb),
                jnp.asarray(ls),
                num_hops=num_hops,
                max_nodes=int(bucket),
                ratio_per_hop=ratio_per_hop,
                max_nodes_per_hop=max_nodes_per_hop,
                sign_k=sign_k,
                node_label=node_label,
                max_label_dist=max_label_dist,
            )
            xs_all[idx, :, : int(bucket)] = np.asarray(xs)[:bsz]
            mask_all[idx, : int(bucket)] = np.asarray(row_mask)[:bsz]

    return OperatorDataset(
        xs=xs_all, row_mask=mask_all, y=np.asarray(y, dtype=np.float32)
    )


@functools.partial(
    jax.jit, static_argnames=("sign_k", "num_nodes", "node_label")
)
def _sop_fullrow_batch(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    norm_w: jax.Array,
    x_global: jax.Array,  # [N, F]
    links: jax.Array,  # [B, 2]
    *,
    sign_k: int,
    num_nodes: int,
    node_label: str,
) -> jax.Array:
    """Non-optimized SoP features for one batch: [B, K+1, 2, Z+F].

    The num_hops=-1 subgraph of Â^k around (s, d) is the 2x2 diagonal
    [Â^k[s,s], Â^k[d,d]] after target-link removal, so
    x{k} = diag(...) @ [z | x_{s,d}]. The diagonal entries come from the
    endpoint-row power chain (same propagation as the optimized SoP,
    operators/sop.py), never a global A^k materialization.
    """
    B = links.shape[0]
    src, dst = links[:, 0], links[:, 1]
    ends = jnp.stack([src, dst], axis=1).reshape(-1)  # [2B]
    R = jax.nn.one_hot(ends, num_nodes, dtype=jnp.float32)
    rows2b = jnp.arange(2 * B)

    # z on a 2-node edgeless graph (off-diagonal removed): dist-to-targets
    # is [0, 0]; src/dst are mutually unreachable for masked BFS labels.
    if node_label == "zo":
        z = jnp.ones((B, 2, 1))
    elif node_label == "hop":
        z = jnp.zeros((B, 2, 1))
    elif node_label == "drnl":
        # drnl fixes z=1 on both targets (utils.py:228-236 z[0]=z[1]=1).
        z = jnp.ones((B, 2, 1))
    elif node_label == "de":
        # distances on the 2-node diag graph (target link removed): 0 to
        # self, unreachable to the counterpart -> capped at max_dist = 3
        # (the reference's isnan -> 4 branch is dead: scipy returns inf,
        # caught by the > max_dist cap first, utils.py:250-251).
        z = jnp.tile(
            jnp.asarray([[0.0, 3.0], [3.0, 0.0]])[None], (B, 1, 1)
        )
    elif node_label == "de+":
        # masked distances, unreachable -> 100 (dead isnan branch,
        # utils.py:274-277)
        z = jnp.tile(
            jnp.asarray([[0.0, 100.0], [100.0, 0.0]])[None], (B, 1, 1)
        )
    elif node_label == "degree":
        z = jnp.zeros((B, 2, 1))  # filled per power below
    else:
        raise NotImplementedError(f"node_label {node_label}")

    x_ends = x_global[links]  # [B, 2, F]

    def zx(diag_k):
        """[z | x] with per-power degree labels when requested."""
        if node_label == "degree":
            # degree label = column sum of the 2x2 diag subgraph = diag
            # entries themselves, capped at 100 (utils.py:303-305).
            zc = jnp.minimum(diag_k, 100.0)[:, :, None]
        else:
            zc = z
        return jnp.concatenate([zc, x_ends], axis=-1)

    # x (op 0): labels from the power-1 subgraph (SoP_data_creation keeps
    # sop_data_list[0] as the base datapoint, tuned_SIGN.py:26).
    R1 = spmm(edge_src, edge_dst, norm_w, R.T, num_nodes).T
    diag1 = R1[rows2b, ends].reshape(B, 2)
    ops = [zx(diag1)]

    Rk = R1
    for k in range(sign_k):
        if k > 0:
            Rk = spmm(edge_src, edge_dst, norm_w, Rk.T, num_nodes).T
        diag_k = Rk[rows2b, ends].reshape(B, 2)  # Â^k[u, u]
        ops.append(diag_k[:, :, None] * zx(diag_k))

    return jnp.stack(ops, axis=1)  # [B, K+1, 2, Z+F]


def precompute_sop_fullrow(
    dg: DeviceGraph,
    links: np.ndarray,
    y: np.ndarray,
    *,
    sign_k: int,
    num_hops: int = -1,
    node_label: str = "zo",
    batch_size: int = 0,
) -> OperatorDataset:
    """Host driver for the non-optimized SoP flow (utils.py:532-550)."""
    if num_hops != -1:
        raise NotImplementedError(
            "non-optimized SoP requires num_hops=-1: with num_hops >= 1 the "
            "per-power subgraphs have different node counts and the SIGNNet "
            "feature concat (models.py:374) cannot consume them"
        )
    assert dg.x is not None, "SIGN flows require node features"
    N = dg.num_nodes
    L = links.shape[0]
    links = np.asarray(links, dtype=np.int32)
    norm_w = normalized_adjacency_weights(dg.edge_src, dg.edge_dst, N)

    if batch_size <= 0:
        batch_size = max(16, min(4096, 24_000_000 // max(N, 1)))

    chunks = []
    for start in range(0, L, batch_size):
        lb = links[start : start + batch_size]
        bsz = len(lb)
        if bsz < batch_size:
            lb = np.concatenate([lb, np.tile(lb[-1:], (batch_size - bsz, 1))])
        xs = _sop_fullrow_batch(
            dg.edge_src,
            dg.edge_dst,
            norm_w,
            dg.x,
            jnp.asarray(lb),
            sign_k=sign_k,
            num_nodes=N,
            node_label=node_label,
        )
        chunks.append(np.asarray(xs)[:bsz])

    xs_out = np.concatenate(chunks, axis=0)
    row_mask = np.ones((L, 2), dtype=bool)
    return OperatorDataset(
        xs=xs_out, row_mask=row_mask, y=np.asarray(y, dtype=np.float32)
    )
