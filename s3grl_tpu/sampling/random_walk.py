"""ScaLed random-walk subgraph extraction.

Reference: the rw branch of ``k_hop_subgraph`` (utils.py:86-150) and
``create_rw_cache`` (utils.py:425-443): the subgraph node set of a link is
the union of nodes visited by M uniform random walks of length m from src
and dst (via the torch_cluster C++ random_walk kernel). ``torch.unique``
sorts, so nodes are id-ordered with src, dst moved to the front
(utils.py:132-135); dists are 0 for targets, 1 elsewhere (utils.py:145-146);
the target link is removed.

TPU redesign: walks are the jitted ``lax.scan`` kernel from models/n2v.py;
membership is a [B, N] scatter-max; node selection and local-structure
assembly reuse the BFS extractor's helpers. Per-link seeds keep the sampled
sets batch-composition independent — the analog of the reference's walk
cache (cached walks per endpoint) falls out for free since seeds derive from
the link, not the batch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from s3grl_tpu.models.n2v import random_walks
from s3grl_tpu.sampling.extraction import (
    DeviceGraph,
    SubgraphBatch,
    assemble_local_structure,
    select_padded_nodes,
)


@functools.partial(
    jax.jit,
    static_argnames=("rw_m", "rw_M", "max_nodes", "remove_target_link", "binary_adj"),
)
def extract_rw_subgraphs(
    dg: DeviceGraph,
    links: jax.Array,  # [B, 2]
    link_seeds: jax.Array,  # [B]
    *,
    rw_m: int,  # walk length
    rw_M: int,  # number of walks per endpoint
    max_nodes: int,
    remove_target_link: bool = True,
    binary_adj: bool = True,
) -> SubgraphBatch:
    """Batched ScaLed extraction (jitted)."""
    B = links.shape[0]
    N = dg.num_nodes
    S = max_nodes
    deg = dg.nbr_mask.sum(axis=1).astype(jnp.int32)

    def walks_for_link(link, seed):
        starts = jnp.tile(link, rw_M)  # [2M] alternating src,dst per repeat
        key = jax.random.PRNGKey(seed)
        rw = random_walks(dg.nbr, deg, starts, key, rw_m)  # [2M, m+1]
        member = jnp.zeros((N,), dtype=bool).at[rw.reshape(-1)].set(True)
        return member

    member = jax.vmap(walks_for_link)(links, link_seeds)  # [B, N]
    sub_size = member.sum(axis=1).astype(jnp.int32)

    # id-ordered selection (torch.unique sorts), src/dst forced first.
    ids = jnp.arange(N, dtype=jnp.int32)[None, :]
    sel_key = jnp.where(member, ids, N + 1)
    nodes, node_mask = select_padded_nodes(sel_key, links, S, valid_below=N + 1)

    # dists: 0 on targets, 1 elsewhere (utils.py:145-146)
    dist = jnp.ones((B, S), dtype=jnp.int32).at[:, :2].set(0)
    dist = dist * node_mask

    return assemble_local_structure(
        dg,
        nodes,
        node_mask,
        dist,
        sub_size,
        remove_target_link=remove_target_link,
        binary_adj=binary_adj,
    )
