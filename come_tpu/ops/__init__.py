from come_tpu.ops.sparse import (
    gather_rows,
    sddmm_pair_scores,
    sddmm_neg_scores,
    scatter_add_rows,
    scatter_add_rows_sorted,
)

__all__ = [
    "gather_rows",
    "sddmm_pair_scores",
    "sddmm_neg_scores",
    "scatter_add_rows",
    "scatter_add_rows_sorted",
]
