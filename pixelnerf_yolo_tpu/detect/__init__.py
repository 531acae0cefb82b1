"""Detection postprocessing layer."""

from .boxes import (
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    draw_bounding_boxes,
    iou,
    nms,
)
from .nms_jax import decode_cells, nms_padded, tp_fp_fn_padded

__all__ = [
    "calculate_precision_recall_f1",
    "calculate_tp_fp_fn",
    "convert_cells_to_bboxes",
    "decode_cells",
    "draw_bounding_boxes",
    "iou",
    "nms",
    "nms_padded",
    "tp_fp_fn_padded",
]
