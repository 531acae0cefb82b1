"""Detection postprocessing layer."""

from .boxes import (
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    draw_bounding_boxes,
    iou,
    nms,
)
from .nms_jax import nms_padded

__all__ = [
    "calculate_precision_recall_f1",
    "calculate_tp_fp_fn",
    "convert_cells_to_bboxes",
    "draw_bounding_boxes",
    "iou",
    "nms",
    "nms_padded",
]
