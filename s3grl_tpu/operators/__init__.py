from s3grl_tpu.operators.common import OperatorDataset
from s3grl_tpu.operators.pos import precompute_pos
from s3grl_tpu.operators.sop import precompute_sop

__all__ = ["OperatorDataset", "precompute_pos", "precompute_sop"]
