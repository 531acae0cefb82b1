"""RPN + ROI box head of the PointRend R50-FPN detector (inference).

Semantics follow detectron2's GeneralizedRCNN configured by the reference
config stack (scripts/detectron2/configs/Base-RCNN-FPN.yaml): anchor
sizes 32..512 one per level x ratios (0.5, 1, 2), RPN pre/post-NMS topk
1000/1000 (test), NMS 0.7; ROI pooler res 7 over p2-p5 with the FPN
level-assignment rule; box head 2xFC-1024; 80 COCO classes + background,
delta weights (10, 10, 5, 5), score threshold / NMS / topk from the
predictor.

One documented deviation: ROIAlign uses a fixed 2x2 sampling grid per
output bin (detectron2's ``sampling_ratio=0`` picks ceil(roi/7) per ROI,
which equals 2 at each level's canonical box size; a fixed grid keeps
the op shape-static for XLA).

Host-side orchestration (numpy) around jitted array ops: this runs once
per photo in offline preproc — the dynamic box counts that make NMS and
level grouping ragged stay on host, exactly like the reference's
detectron2 inference path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_nhwc
from .backbone import conv

ANCHOR_SIZES = (32, 64, 128, 256, 512)  # one per p2..p6
ASPECT_RATIOS = (0.5, 1.0, 2.0)
RPN_LEVELS = ("p2", "p3", "p4", "p5", "p6")
BOX_LEVELS = ("p2", "p3", "p4", "p5")
SCALE_CLAMP = math.log(1000.0 / 16)


# -- anchors ------------------------------------------------------------------

def cell_anchors(size: float) -> np.ndarray:
    """(A, 4) xyxy anchors centered at 0 (detectron2 generate_cell_anchors)."""
    out = []
    area = size * size
    for ar in ASPECT_RATIOS:
        w = math.sqrt(area / ar)
        h = ar * w
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.array(out, np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int,
                 size: float) -> np.ndarray:
    """(H*W*A, 4) anchors in (H, W, A) order, offset 0 (detectron2)."""
    base = cell_anchors(size)
    sx = np.arange(feat_w, dtype=np.float32) * stride
    sy = np.arange(feat_h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel()] * 2, axis=1
    )  # (H*W, 4)
    return (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)


# -- box transforms -----------------------------------------------------------

def apply_deltas(deltas: np.ndarray, boxes: np.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """Box2BoxTransform.apply_deltas: (..., 4) deltas onto (N, 4) xyxy."""
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = np.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    # broadcast (N, ...) trailing dims
    shape = (-1,) + (1,) * (deltas.ndim - 2)
    pred_ctr_x = dx * widths.reshape(shape) + ctr_x.reshape(shape)
    pred_ctr_y = dy * heights.reshape(shape) + ctr_y.reshape(shape)
    pred_w = np.exp(dw) * widths.reshape(shape)
    pred_h = np.exp(dh) * heights.reshape(shape)
    return np.stack(
        [pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
         pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h], axis=-1
    )


def clip_boxes(boxes: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    out = boxes.copy()
    out[..., 0::2] = np.clip(out[..., 0::2], 0, img_w)
    out[..., 1::2] = np.clip(out[..., 1::2], 0, img_h)
    return out


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float) -> np.ndarray:
    """Greedy NMS, indices kept in descending-score order (torchvision
    semantics — distinct from detect.boxes.nms, which reproduces the
    reference's xywh training-metric quirks)."""
    order = np.argsort(-scores, kind="stable")
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def batched_nms(boxes: np.ndarray, scores: np.ndarray, ids: np.ndarray,
                iou_thresh: float) -> np.ndarray:
    """Category-aware NMS via the coordinate-offset trick."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    offs = ids.astype(np.float32) * (boxes.max() + 1.0)
    return nms_xyxy(boxes + offs[:, None], scores, iou_thresh)


# -- RPN ----------------------------------------------------------------------

def rpn_head_apply(params, feats: dict) -> dict:
    """Shared 3x3 conv + objectness/delta 1x1s per level
    (detectron2 StandardRPNHead)."""
    out = {}
    for name in RPN_LEVELS:
        t = jax.nn.relu(conv(feats[name], params["conv"]["weight"],
                             params["conv"]["bias"], padding=1))
        obj = conv(t, params["objectness_logits"]["weight"],
                   params["objectness_logits"]["bias"])
        deltas = conv(t, params["anchor_deltas"]["weight"],
                      params["anchor_deltas"]["bias"])
        out[name] = (obj, deltas)
    return out


def rpn_proposals(rpn_out: dict, img_h: int, img_w: int,
                  pre_nms_topk: int = 1000, post_nms_topk: int = 1000,
                  nms_thresh: float = 0.7) -> tuple[np.ndarray, np.ndarray]:
    """find_top_rpn_proposals (test mode): (boxes xyxy, scores)."""
    all_boxes, all_scores, all_lvl = [], [], []
    for li, name in enumerate(RPN_LEVELS):
        obj, deltas = rpn_out[name]
        A = len(ASPECT_RATIOS)
        _, _, fh, fw = obj.shape
        # (1, A, H, W) -> (H, W, A) order; deltas (1, A*4, H, W) ->
        # (H*W*A, 4) — detectron2's permute convention
        obj = np.asarray(obj)[0].transpose(1, 2, 0).reshape(-1)
        deltas = (np.asarray(deltas)[0]
                  .reshape(A, 4, fh, fw).transpose(2, 3, 0, 1)
                  .reshape(-1, 4))
        anchors = grid_anchors(fh, fw, STRIDES_RPN[name], ANCHOR_SIZES[li])
        k = min(pre_nms_topk, len(obj))
        top = np.argpartition(-obj, k - 1)[:k]
        boxes = apply_deltas(deltas[top], anchors[top])
        all_boxes.append(boxes)
        all_scores.append(obj[top])
        all_lvl.append(np.full(k, li, np.int64))
    boxes = clip_boxes(np.concatenate(all_boxes), img_h, img_w)
    scores = np.concatenate(all_scores)
    lvl = np.concatenate(all_lvl)
    wide = ((boxes[:, 2] - boxes[:, 0]) > 0) & ((boxes[:, 3] - boxes[:, 1]) > 0)
    boxes, scores, lvl = boxes[wide], scores[wide], lvl[wide]
    keep = batched_nms(boxes, scores, lvl, nms_thresh)[:post_nms_topk]
    return boxes[keep], scores[keep]


STRIDES_RPN = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


# -- ROIAlign + pooler --------------------------------------------------------

def roi_align(feat: jnp.ndarray, boxes: np.ndarray, out_size: int,
              spatial_scale: float) -> jnp.ndarray:
    """ROIAlignV2 (aligned=True) with a fixed 2x2 sample grid per bin.

    :param feat (1, C, H, W); boxes (R, 4) xyxy image coords
    :return (R, C, out_size, out_size)
    """
    R = len(boxes)
    _, C, H, W = feat.shape
    if R == 0:
        return jnp.zeros((0, C, out_size, out_size), feat.dtype)
    b = jnp.asarray(boxes) * spatial_scale - 0.5  # aligned=True shift
    x0, y0 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - b[:, 0], 1e-6)
    bh = jnp.maximum(b[:, 3] - b[:, 1], 1e-6)
    n = out_size * 2  # 2 samples per bin edge
    # sample centers: start + (k + 0.5) * roi/n, k = 0..n-1
    t = (jnp.arange(n, dtype=feat.dtype) + 0.5) / n
    px = x0[:, None] + t[None, :] * bw[:, None]  # (R, n)
    py = y0[:, None] + t[None, :] * bh[:, None]
    # to grid_sample normalized coords (align_corners=False pixel centers)
    gx = (px + 0.5) * (2.0 / W) - 1.0
    gy = (py + 0.5) * (2.0 / H) - 1.0
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (R, n, n)),
         jnp.broadcast_to(gy[:, :, None], (R, n, n))], axis=-1
    ).reshape(1, R * n * n, 2)
    flat = feat.reshape(C, H * W).T[None]  # (1, H*W, C)
    sampled = grid_sample_nhwc(
        flat, grid, H, W, padding_mode="border", align_corners=False
    ).reshape(R, n, n, C)
    # average the 2x2 samples of each bin
    pooled = sampled.reshape(R, out_size, 2, out_size, 2, C).mean((2, 4))
    return pooled.transpose(0, 3, 1, 2)  # (R, C, out, out)


def assign_levels(boxes: np.ndarray, canonical_size: int = 224,
                  canonical_level: int = 4) -> np.ndarray:
    """FPN pooler level for each box (detectron2 assign_boxes_to_levels)."""
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = np.floor(
        canonical_level + np.log2(np.sqrt(areas) / canonical_size + 1e-8)
    )
    return np.clip(lvl, 2, 5).astype(np.int64)


def pool_roi_features(feats: dict, boxes: np.ndarray,
                      out_size: int = 7) -> jnp.ndarray:
    """(R, 256, out, out) pooled from the assigned pyramid level."""
    R = len(boxes)
    lvl = assign_levels(boxes)
    out = jnp.zeros((R, FPN_CH, out_size, out_size), jnp.float32)
    for level in range(2, 6):
        idx = np.nonzero(lvl == level)[0]
        if len(idx) == 0:
            continue
        pooled = roi_align(
            feats[f"p{level}"], boxes[idx], out_size,
            1.0 / STRIDES_RPN[f"p{level}"],
        )
        out = out.at[jnp.asarray(idx)].set(pooled)
    return out


FPN_CH = 256


# -- box head + inference -----------------------------------------------------

def box_head_apply(params, pooled: jnp.ndarray):
    """2x FC-1024 (FastRCNNConvFCHead) + linear predictors:
    (scores (R, 81), deltas (R, 320))."""
    x = pooled.reshape(pooled.shape[0], -1)
    x = jax.nn.relu(x @ params["fc1"]["weight"].T + params["fc1"]["bias"])
    x = jax.nn.relu(x @ params["fc2"]["weight"].T + params["fc2"]["bias"])
    scores = x @ params["cls_score"]["weight"].T + params["cls_score"]["bias"]
    deltas = x @ params["bbox_pred"]["weight"].T + params["bbox_pred"]["bias"]
    return scores, deltas


def box_inference(scores: np.ndarray, deltas: np.ndarray,
                  proposals: np.ndarray, img_h: int, img_w: int,
                  score_thresh: float = 0.5, nms_thresh: float = 0.5,
                  topk: int = 100):
    """fast_rcnn_inference for one image: -> (boxes, scores, classes)."""
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    probs = np.asarray(probs)[:, :-1]  # drop background (last column)
    n_cls = probs.shape[1]
    boxes = apply_deltas(
        deltas.reshape(-1, n_cls, 4), proposals, weights=(10.0, 10.0, 5.0, 5.0)
    )
    boxes = clip_boxes(boxes, img_h, img_w)
    ri, ci = np.nonzero(probs > score_thresh)
    sel_boxes = boxes[ri, ci]
    sel_scores = probs[ri, ci]
    keep = batched_nms(sel_boxes, sel_scores, ci, nms_thresh)[:topk]
    return sel_boxes[keep], sel_scores[keep], ci[keep]
