from s3grl_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from s3grl_tpu.parallel.dist import (
    dist_power_chain,
    precompute_pos_sharded,
    precompute_sop_sharded,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "dist_power_chain",
    "precompute_pos_sharded",
    "precompute_sop_sharded",
]
