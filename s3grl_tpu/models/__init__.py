from s3grl_tpu.models.signnet import SIGNNet
from s3grl_tpu.models.mlp import MLP

__all__ = ["SIGNNet", "MLP"]
