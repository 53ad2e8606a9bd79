from s3grl_tpu.train.metrics import (
    evaluate_auc,
    evaluate_hits,
    evaluate_mrr,
    roc_auc_score,
    average_precision_score,
)
from s3grl_tpu.train.logger import Logger

__all__ = [
    "evaluate_auc",
    "evaluate_hits",
    "evaluate_mrr",
    "roc_auc_score",
    "average_precision_score",
    "Logger",
]
