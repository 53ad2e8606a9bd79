from s3grl_tpu.sampling.extraction import DeviceGraph, extract_subgraphs
from s3grl_tpu.sampling.labeling import label_nodes

__all__ = ["DeviceGraph", "extract_subgraphs", "label_nodes"]
