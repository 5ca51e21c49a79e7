from cunet_tpu.evaluation.decode import (
    MPII_ORIGIN_IDX,
    MPII_TRAIN_IDX,
    accuracy,
    accuracy_origin_res,
    calc_dists,
    dist_acc,
    final_preds,
    get_preds,
    per_image_nme,
    quarter_pixel_refine,
)
from cunet_tpu.evaluation.pckh import (
    MPII_PART_PAIRS,
    approx_pckh,
    format_pckh_table,
    pckh_table,
)

__all__ = [
    "MPII_ORIGIN_IDX",
    "MPII_PART_PAIRS",
    "MPII_TRAIN_IDX",
    "accuracy",
    "accuracy_origin_res",
    "approx_pckh",
    "calc_dists",
    "dist_acc",
    "final_preds",
    "format_pckh_table",
    "get_preds",
    "pckh_table",
    "per_image_nme",
    "quarter_pixel_refine",
]
