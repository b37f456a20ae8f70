from come_tpu.evaluation.metrics import (
    f1_train_ratio_sweep,
    nmi_score,
    node_classification_f1,
)
from come_tpu.evaluation import oracle

__all__ = [
    "f1_train_ratio_sweep",
    "nmi_score",
    "node_classification_f1",
    "oracle",
]
