"""Detection postprocessing layer."""

from .boxes import (
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    draw_bounding_boxes,
    iou,
    nms,
    suppress_cross_scale,
)
from .map import (
    average_precision,
    map_from_raw_boxes,
    match_image_detections,
    mean_average_precision,
)
from .nms_jax import decode_cells, nms_padded, tp_fp_fn_padded

__all__ = [
    "average_precision",
    "calculate_precision_recall_f1",
    "calculate_tp_fp_fn",
    "convert_cells_to_bboxes",
    "decode_cells",
    "draw_bounding_boxes",
    "iou",
    "map_from_raw_boxes",
    "match_image_detections",
    "mean_average_precision",
    "nms",
    "nms_padded",
    "suppress_cross_scale",
    "tp_fp_fn_padded",
]
