from s3grl_tpu.ops.spmm import spmm, normalized_adjacency_weights

__all__ = ["spmm", "normalized_adjacency_weights"]
