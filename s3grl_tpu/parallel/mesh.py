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


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays sharded along axis 0 over the 'data' mesh axis."""
    out = []
    for a in arrays:
        spec = P("data", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
