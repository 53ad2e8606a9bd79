"""Device mesh and sharding helpers.

The reference has no multi-device parallelism at all (SURVEY.md §2c) — these
are new capabilities mandated by the TPU north star. The principal axis is
``data`` (links are embarrassingly parallel in both precompute and training);
``model`` shards the hidden dimension of the MLP stack (tensor parallel) for
the large-hidden / large-feature regime.

All collectives ride XLA sharding propagation: inputs carry NamedShardings,
jit inserts all-reduces (gradient psum over ``data``) and all-gathers
(activation re-materialization across ``model``) automatically over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes. n_data=0 -> all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data <= 0:
        n_data = n_dev // n_model
    assert n_data * n_model <= n_dev, (
        f"mesh {n_data}x{n_model} exceeds {n_dev} devices"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, *arrays, axis: int = 0):
    """Place arrays sharded along ``axis`` over the 'data' mesh axis."""
    out = []
    for a in arrays:
        spec = [None] * a.ndim
        spec[axis] = "data"
        out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def signnet_param_shardings(mesh: Mesh, params):
    """Tensor-parallel PartitionSpecs for SIGNNet params over 'model'.

    Megatron-style MLP partitioning (models/signnet.py param tree):
    - ``operator_diff`` Dense kernels are COLUMN-parallel — kernel
      [d_in, hidden] sharded (None, 'model'); its bias and the following
      MaskedBatchNorm scale/bias are sharded ('model',) so the [B, R,
      hidden] activations stay feature-sharded through pooling (center
      product and CCN mean/sum are elementwise/row ops on the sharded
      feature axis; the channel concat concatenates two 'model'-sharded
      tensors).
    - ``link_pred_mlp`` first Dense is ROW-parallel — kernel [2*hidden,
      hidden] sharded ('model', None): the contraction over the sharded
      input dim makes XLA insert the psum, after which activations (and the
      rest of the head: batch norm, final Dense [hidden, 1]) are replicated.
    Everything else (final Dense, batch_stats) replicates.
    """

    def spec_for(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        last = names[-1] if names else ""
        if "operator_diff" in names:
            if last == "kernel":
                return P(None, "model")
            if last in ("bias", "scale"):
                return P("model")
        if "link_pred_mlp" in names and "Dense_0" in names and last == "kernel":
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, spec_for(p, l)), params
    )


def shard_signnet_params(mesh: Mesh, params):
    """Place SIGNNet params tensor-parallel over the 'model' mesh axis."""
    shardings = signnet_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
