"""mAP@IoU for the detection eval.

Neither the reference nor its fork computes mAP — only P/R/F1 at a single
confidence point (/root/reference/src/util/util.py:765-805).  The
detection north star ("mAP@0.5 within 0.5 pt") needs the full
precision-recall sweep, so this module adds the standard VOC2010-style
all-point-interpolated AP on top of the same box representation
([class, score, x, y, w, h], centers+wh normalized to [0, 1]) and the
same host IoU (detect.boxes.iou == util.py:576-629).

Protocol (standard, documented divergences from the F1 path):
  * predictions and GT pass PER-CLASS NMS at the configured nms_iou,
    predictions with a ~0 confidence floor (the F1 path runs the
    reference's class-agnostic NMS and cuts at yolo.nms_threshold, which
    would suppress overlapping objects of different classes and truncate
    the PR curve);
  * matching is per-class greedy by descending score, one GT matched at
    most once, IoU > iou_threshold (the F1 path matches class-agnostically
    and lets one GT satisfy several predictions, util.py:779-787);
  * AP = area under the interpolated PR curve; mAP = mean over classes
    that appear in the GT.
"""

from __future__ import annotations

import numpy as np

from .boxes import iou, nms


def _per_class_nms(raw_boxes, nms_iou: float, score_floor: float):
    """NMS each class independently (detect.boxes.nms is class-agnostic —
    the reference quirk, util.py:691-720 — which would suppress an
    overlapping box of a *different* class)."""
    kept_all = []
    for cls in sorted({int(float(b[0])) for b in raw_boxes}):
        cls_rows = [b for b in raw_boxes if int(float(b[0])) == cls]
        kept, _, _ = nms(cls_rows, nms_iou, score_floor, allow_empty=True)
        kept_all.extend(kept)
    return kept_all


def match_image_detections(
    gt_boxes,
    pred_boxes,
    iou_threshold: float = 0.5,
):
    """Greedy per-class matching for one image.

    :param gt_boxes list of [class, score, x, y, w, h] ground-truth rows
      (already deduplicated / NMS'd)
    :param pred_boxes list of [class, score, x, y, w, h] predictions
      (already NMS'd, any confidence)
    :return list of (class, score, is_tp) for every prediction, plus a
      {class: n_gt} count dict
    """
    gt = [list(map(float, b)) for b in gt_boxes]
    preds = sorted(
        ([float(b[0]), float(b[1]), *map(float, b[2:6])] for b in pred_boxes),
        key=lambda b: -b[1],
    )
    n_gt: dict[int, int] = {}
    for b in gt:
        n_gt[int(b[0])] = n_gt.get(int(b[0]), 0) + 1

    gt_used = [False] * len(gt)
    records = []
    for p in preds:
        cls = int(p[0])
        best_iou, best_j = 0.0, -1
        for j, g in enumerate(gt):
            if gt_used[j] or int(g[0]) != cls:
                continue
            v = float(
                np.asarray(
                    iou(
                        np.asarray(p[2:6], dtype=np.float64),
                        np.asarray(g[2:6], dtype=np.float64),
                    )
                ).reshape(-1)[0]
            )
            if v > best_iou:
                best_iou, best_j = v, j
        is_tp = best_iou > iou_threshold
        if is_tp:
            gt_used[best_j] = True
        records.append((cls, p[1], is_tp))
    return records, n_gt


def average_precision(scores, tp_flags, n_gt: int) -> float:
    """All-point-interpolated AP for one class.

    :param scores (N,) prediction confidences (any order)
    :param tp_flags (N,) bools
    :param n_gt number of ground-truth boxes of this class
    """
    if n_gt == 0:
        return 0.0
    scores = np.asarray(scores, dtype=np.float64)
    tp = np.asarray(tp_flags, dtype=np.float64)
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order]
    fp = 1.0 - tp
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(fp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
    # envelope: precision at recall r = max precision at recall >= r
    mrec = np.concatenate([[0.0], recall, [recall[-1]]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def mean_average_precision(per_image_records, per_image_n_gt):
    """Aggregate per-image match records into (mAP, {class: AP}).

    :param per_image_records list (one per image) of lists of
      (class, score, is_tp)
    :param per_image_n_gt list (one per image) of {class: n_gt}
    """
    by_class: dict[int, list[tuple[float, bool]]] = {}
    gt_total: dict[int, int] = {}
    for recs in per_image_records:
        for cls, score, is_tp in recs:
            by_class.setdefault(cls, []).append((score, is_tp))
    for counts in per_image_n_gt:
        for cls, n in counts.items():
            gt_total[cls] = gt_total.get(cls, 0) + n
    aps = {}
    for cls, n in sorted(gt_total.items()):
        dets = by_class.get(cls, [])
        scores = [d[0] for d in dets]
        flags = [d[1] for d in dets]
        aps[cls] = average_precision(scores, flags, n)
    if not aps:
        return 0.0, {}
    return float(np.mean(list(aps.values()))), aps


def map_from_raw_boxes(
    per_image_gt,
    per_image_pred,
    nms_iou: float,
    iou_threshold: float = 0.5,
    nms_score_floor: float = 1e-3,
):
    """mAP@iou_threshold from raw decoded boxes (pre-NMS).

    :param per_image_gt/per_image_pred lists (one per image) of raw
      [class, score, x, y, w, h] box lists as produced by
      convert_cells_to_bboxes
    :return (mAP, {class: AP})
    """
    records, counts = [], []
    for gt_raw, pred_raw in zip(per_image_gt, per_image_pred):
        # GT decode emits one row per assigned (cell, anchor); dedup those
        # multi-anchor duplicates per class, and NMS predictions per class
        # too — a joint class-agnostic pass would undercount n_gt (or drop
        # a correct detection) whenever objects of different classes
        # overlap above nms_iou.
        gt_nms = _per_class_nms(gt_raw, nms_iou, 0.5)
        pred_nms = _per_class_nms(pred_raw, nms_iou, nms_score_floor)
        recs, n_gt = match_image_detections(
            gt_nms, pred_nms, iou_threshold
        )
        records.append(recs)
        counts.append(n_gt)
    return mean_average_precision(records, counts)
