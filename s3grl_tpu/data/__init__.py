from s3grl_tpu.data.graph import Graph
from s3grl_tpu.data.io import load_dataset
from s3grl_tpu.data.split import EdgeSplit, do_edge_split, get_pos_neg_edges

__all__ = ["Graph", "load_dataset", "EdgeSplit", "do_edge_split", "get_pos_neg_edges"]
