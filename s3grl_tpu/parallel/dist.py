"""Multi-device distributed precompute (link-sharded PoS, row-partitioned SoP).

The reference is strictly single-device (SURVEY.md §2c — no torch.distributed
anywhere); these are the new TPU capabilities mandated by the north star:

- **Link-sharded PoS**: links are embarrassingly parallel. The batched
  extraction+operator pipeline (operators/pos.py) is already pure batched
  jnp, so distribution is sharding propagation: link batches arrive sharded
  over the ``data`` mesh axis, the graph is replicated, and XLA partitions
  every per-link op with zero collectives until the host copy.

- **Row-partitioned SoP global chain**: ``Y_k = Â Y_{k-1}`` with nodes
  partitioned over ``data``. Each device owns a contiguous node-row shard
  (its incoming edges, grouped by destination owner) and computes its shard
  of every power after an ``all_gather`` of the previous power over ICI —
  the 1D-partitioned SpMM + boundary exchange of SURVEY.md §2c. The gather
  is the per-power boundary exchange; XLA overlaps it with the local gather/
  segment-sum epilogue of the previous step.

Multi-host runs only need ``jax.distributed.initialize()`` before building
the mesh; everything below is expressed against the mesh, not hosts.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.sampling.extraction import DeviceGraph


# --------------------------------------------------------------------------
# Row-partitioned SoP power chain
# --------------------------------------------------------------------------


def partition_edges_by_owner(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_weight: np.ndarray,
    num_nodes: int,
    n_shards: int,
):
    """Group edges by the shard that owns their destination row.

    Returns (src [n, Emax] global ids, dst_local [n, Emax] owner-local rows,
    w [n, Emax] zero-padded, rows_per_shard). Padding edges carry w=0 so the
    scatter-add is a no-op for them.
    """
    rows = -(-num_nodes // n_shards)  # rows per shard (last shard padded)
    owner = np.asarray(edge_dst) // rows
    order = np.argsort(owner, kind="stable")
    src_s = np.asarray(edge_src)[order]
    dst_s = np.asarray(edge_dst)[order]
    w_s = np.asarray(edge_weight)[order]
    own_s = owner[order]
    counts = np.bincount(own_s, minlength=n_shards)
    e_max = max(int(counts.max()), 1)

    src_p = np.zeros((n_shards, e_max), np.int32)
    dstl_p = np.zeros((n_shards, e_max), np.int32)
    w_p = np.zeros((n_shards, e_max), np.float32)
    start = 0
    for s in range(n_shards):
        c = counts[s]
        src_p[s, :c] = src_s[start : start + c]
        dstl_p[s, :c] = dst_s[start : start + c] - s * rows
        w_p[s, :c] = w_s[start : start + c]
        start += c
    return src_p, dstl_p, w_p, rows


def dist_power_chain(
    mesh: Mesh,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_weight: np.ndarray,
    x: jax.Array,  # [N, F]
    sign_k: int,
    axis: str = "data",
) -> jax.Array:
    """[Â X, ..., Â^K X] stacked [K, N, F], node-rows sharded over ``axis``.

    Per power: all_gather the previous power's rows over ICI (the boundary
    exchange), then each shard computes its owned output rows with a local
    gather + segment-sum.
    """
    n = mesh.shape[axis]
    N, F = int(x.shape[0]), int(x.shape[1])
    src_p, dstl_p, w_p, rows = partition_edges_by_owner(
        edge_src, edge_dst, edge_weight, N, n
    )
    n_pad = rows * n
    x_pad = jnp.zeros((n_pad, F), jnp.float32).at[:N].set(x.astype(jnp.float32))

    def step(src, dstl, w, y_shard):
        # src/dstl/w: [1, Emax] this shard's incoming edges; y_shard [rows, F]
        y_full = jax.lax.all_gather(y_shard, axis, axis=0, tiled=True)
        contrib = y_full[src[0]] * w[0][:, None]
        out = jnp.zeros((rows, F), jnp.float32).at[dstl[0]].add(contrib)
        return out

    spec_e = P(axis, None)
    spec_x = P(axis, None)
    step_sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(spec_e, spec_e, spec_e, spec_x),
        out_specs=spec_x,
        check_rep=False,
    )

    src_d = jax.device_put(src_p, NamedSharding(mesh, spec_e))
    dstl_d = jax.device_put(dstl_p, NamedSharding(mesh, spec_e))
    w_d = jax.device_put(w_p, NamedSharding(mesh, spec_e))
    y = jax.device_put(x_pad, NamedSharding(mesh, spec_x))

    @jax.jit
    def chain(src_d, dstl_d, w_d, y):
        ys = []
        for _ in range(sign_k):
            y = step_sharded(src_d, dstl_d, w_d, y)
            ys.append(y)
        return jnp.stack(ys, axis=0)

    return chain(src_d, dstl_d, w_d, y)[:, :N, :]


# --------------------------------------------------------------------------
# Link-sharded PoS precompute
# --------------------------------------------------------------------------


def replicate_graph(mesh: Mesh, dg: DeviceGraph) -> DeviceGraph:
    """Replicate the device graph across the mesh (small-graph regime)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), dg)


def precompute_pos_sharded(
    mesh: Mesh,
    dg: DeviceGraph,
    links: np.ndarray,
    y: np.ndarray,
    *,
    axis: str = "data",
    **pos_kwargs,
) -> OperatorDataset:
    """Link-sharded PoS precompute over the mesh.

    Reuses the single-device bucketed driver (operators/pos.py::
    precompute_pos) with two changes: the graph is replicated once across
    the mesh, and every per-bucket link batch is placed sharded over
    ``axis`` — XLA's sharding propagation partitions the whole fused
    extraction+operator pipeline over the batch dimension with no
    collectives (links are independent).
    """
    from s3grl_tpu.operators import pos as pos_mod

    n = mesh.shape[axis]
    dg_rep = replicate_graph(mesh, dg)
    link_sharding = NamedSharding(mesh, P(axis, None))
    seed_sharding = NamedSharding(mesh, P(axis))

    # shard_map, not sharding propagation: with only input shardings to go
    # on, XLA's auto-spmd replicated the BFS frontier intermediates of
    # extract_subgraphs on every device — measured 8.2 s/batch at 8 virtual
    # devices vs 0.61 s/batch (13.6x) for the identical computation under
    # shard_map, which pins EVERY per-link intermediate to the link shard.
    # One wrapper per static-kwarg signature (jit caches by it anyway).
    _smap_cache: dict = {}

    def _smap_fn(statics: tuple, with_host_nodes: bool):
        key = (statics, with_host_nodes)
        if key not in _smap_cache:
            kw = dict(statics)
            if with_host_nodes:
                fn = shard_map(
                    lambda d, l, s, hn, hm: pos_mod._extract_and_operate(
                        d, l, s, host_nodes=(hn, hm), **kw
                    ),
                    mesh=mesh,
                    in_specs=(P(), P(axis, None), P(axis), P(axis, None),
                              P(axis, None)),
                    out_specs=(P(axis, None, None, None), P(axis, None)),
                )
            else:
                fn = shard_map(
                    lambda d, l, s: pos_mod._extract_and_operate(d, l, s, **kw),
                    mesh=mesh,
                    in_specs=(P(), P(axis, None), P(axis)),
                    out_specs=(P(axis, None, None, None), P(axis, None)),
                )
            _smap_cache[key] = jax.jit(fn)
        return _smap_cache[key]

    def sharded_extract(dg_arg, lb, ls, host_nodes=None, **kw):
        b = lb.shape[0]
        if b % n != 0:  # unshardable remainder batch: single-device path
            if b >= 8 * n:
                # A FULL batch landing here means the bucket driver chose
                # a batch size that does not divide the mesh — every batch
                # of this bucket would run single-device with no signal
                # (ADVICE r3 #4; batch_multiple below should prevent it).
                print(f"[dist] warning: full batch b={b} not divisible by "
                      f"mesh n={n}; running single-device", flush=True)
            return pos_mod._extract_and_operate(
                dg_arg, lb, ls, host_nodes=host_nodes, **kw
            )
        lb = jax.device_put(lb, link_sharding)
        ls = jax.device_put(ls, seed_sharding)
        fn = _smap_fn(tuple(sorted(kw.items())), host_nodes is not None)
        if host_nodes is not None:
            hn = jax.device_put(host_nodes[0], link_sharding)
            hm = jax.device_put(host_nodes[1], link_sharding)
            return fn(dg_arg, lb, ls, hn, hm)
        return fn(dg_arg, lb, ls)

    # Route the driver through the sharded dispatcher. batch_multiple=n
    # forces every full bucket batch to divide the mesh even when the
    # ELEM_BUDGET cap would shrink it below n (a 16-device mesh with an
    # 8-link cap used to silently run every batch single-device —
    # ADVICE r3 #4).
    kwargs = dict(pos_kwargs)
    kwargs["batch_size"] = max(int(kwargs.get("batch_size", 256)), 8 * n)
    kwargs["batch_multiple"] = n
    return pos_mod.precompute_pos(
        dg_rep, links, y, extract_fn=sharded_extract,
        # Keep the assembled dataset link-sharded too: a replicated output
        # buffer all-gathers every batch during scatter-assembly.
        out_shardings=(
            NamedSharding(mesh, P(axis, None, None, None)),
            NamedSharding(mesh, P(axis, None)),
        ),
        **kwargs,
    )


# --------------------------------------------------------------------------
# Distributed SoP precompute (chain + link-sharded batch assembly)
# --------------------------------------------------------------------------


def precompute_sop_sharded(
    mesh: Mesh,
    dg: DeviceGraph,
    links: np.ndarray,
    y: np.ndarray,
    *,
    sign_k: int,
    axis: str = "data",
    x_override: Optional[np.ndarray] = None,
) -> OperatorDataset:
    """SoP precompute with the global chain row-partitioned over the mesh.

    The per-link assembly (endpoint row propagation + rank-1 correction,
    operators/sop.py::_sop_batch) is link-sharded: batches are placed with
    PartitionSpec('data') and XLA partitions the one-hot propagation over
    the batch axis.
    """
    from s3grl_tpu.operators import sop as sop_mod

    assert dg.x is not None or x_override is not None
    x_global = dg.x if x_override is None else jnp.asarray(x_override)
    N = dg.num_nodes
    F = int(x_global.shape[1])
    L = links.shape[0]
    links = np.asarray(links, dtype=np.int32)
    n = mesh.shape[axis]

    src_h, dst_h, _ = dg.host_edges()
    deg_h = np.zeros(N, dtype=np.float32)
    np.add.at(deg_h, dst_h, 1.0)
    inv_h = np.where(deg_h > 0, 1.0 / np.sqrt(np.maximum(deg_h, 1e-30)), 0.0)
    norm_w = (inv_h[src_h] * inv_h[dst_h]).astype(np.float32)
    ys = dist_power_chain(
        mesh,
        src_h,
        dst_h,
        norm_w,
        x_global,
        sign_k,
        axis=axis,
    )
    # Replicate the (small) chain + graph for the link-sharded assembly.
    rep = NamedSharding(mesh, P())
    ys = jax.device_put(ys, rep)
    es = jax.device_put(dg.edge_src, rep)
    ed = jax.device_put(dg.edge_dst, rep)
    wn = jax.device_put(jnp.asarray(norm_w), rep)
    xg = jax.device_put(x_global, rep)
    link_sharding = NamedSharding(mesh, P(axis, None))

    # Same two batch-memory drivers as operators/sop.py: the [2B, N] state
    # and the [E, 2B] edge-message intermediate inside each SpMM.
    E_edges = int(dg.edge_src.shape[0])
    batch = max(
        16,
        min(4096, 24_000_000 // max(N, 1), 48_000_000 // max(E_edges, 1)),
    )
    batch = max(batch // n, 8) * n  # divisible by the mesh
    xs_out = np.empty((L, sign_k + 1, 2, F + 1), dtype=np.float32)
    for start in range(0, L, batch):
        lb = links[start : start + batch]
        bsz = len(lb)
        if bsz < batch:
            lb = np.concatenate([lb, np.tile(lb[-1:], (batch - bsz, 1))])
        lb_dev = jax.device_put(jnp.asarray(lb), link_sharding)
        xs = sop_mod._sop_batch(
            es, ed, wn, xg, ys, lb_dev, sign_k=sign_k, num_nodes=N
        )
        xs_out[start : start + bsz] = np.asarray(xs)[:bsz]

    row_mask = np.ones((L, 2), dtype=bool)
    return OperatorDataset(
        xs=xs_out, row_mask=row_mask, y=np.asarray(y, dtype=np.float32)
    )
