from come_tpu.evaluation.metrics import nmi_score, node_classification_f1
from come_tpu.evaluation import oracle

__all__ = ["nmi_score", "node_classification_f1", "oracle"]
