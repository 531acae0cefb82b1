"""Padded, jittable greedy NMS for on-device detection serving.

The reference's NMS is host-side python-list processing
(/root/reference/src/util/util.py:691-720) — fine for eval scripts, a
bottleneck for production serving.  This version runs the full decode ->
suppress loop on TPU with static shapes: boxes are padded, suppressed by
mask, and the greedy loop is a lax.fori_loop of vectorized IoU tests.

NOTE: this implements *standard* greedy NMS.  The reference's list version
has a remove-while-iterating skip quirk that can keep extra boxes; the
metric pipelines use detect.boxes.nms for bit-parity, this kernel is the
fast path (and the quirk-free behavior is strictly more standard).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..losses.yolo import iou_xywh


@partial(jax.jit, static_argnames=("max_out",))
def nms_padded(
    boxes: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    max_out: int = 64,
):
    """Greedy NMS over padded boxes.

    :param boxes (N, 6) rows [class, score, x, y, w, h]; padding rows must
      have score <= 0
    :param max_out maximum number of kept boxes (static)
    :return (kept (max_out, 6), valid (max_out,) bool)
    """
    n = boxes.shape[0]
    scores = boxes[:, 1]
    wh_ok = (
        (boxes[:, 4] > 10e-4)
        & (boxes[:, 4] < 10e4)
        & (boxes[:, 5] > 10e-4)
        & (boxes[:, 5] < 10e4)
    )
    alive = (scores > score_threshold) & wh_ok

    # pairwise IoU (N, N) — O(N^2) vectorized, MXU/VPU friendly
    ious = iou_xywh(boxes[:, None, 2:6], boxes[None, :, 2:6])

    def body(i, state):
        alive, kept_idx, kept_valid = state
        masked_scores = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked_scores)
        valid = masked_scores[best] > -jnp.inf
        kept_idx = kept_idx.at[i].set(jnp.where(valid, best, 0))
        kept_valid = kept_valid.at[i].set(valid)
        # suppress the winner and everything overlapping it
        suppress = (ious[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        alive = alive & jnp.where(valid, ~suppress, True)
        return alive, kept_idx, kept_valid

    kept_idx = jnp.zeros((max_out,), dtype=jnp.int32)
    kept_valid = jnp.zeros((max_out,), dtype=bool)
    _, kept_idx, kept_valid = jax.lax.fori_loop(
        0, max_out, body, (alive, kept_idx, kept_valid)
    )
    return boxes[kept_idx], kept_valid


@partial(jax.jit, static_argnames=("is_predictions",))
def decode_cells(predictions: jnp.ndarray, anchors: jnp.ndarray,
                 is_predictions: bool = True) -> jnp.ndarray:
    """Grid-cell decode as a device op (convert_cells_to_bboxes semantics,
    util.py:633-687, same (h, w, a) flattening order).

    :param predictions (B, h, w, A, 6|7); anchors (A, 2)
    :return (B, h*w*A, 6) rows [class, score, x, y, w, h]
    """
    B, h, w, A = predictions.shape[:4]
    box = predictions[..., 1:5]
    if is_predictions:
        anc = anchors.reshape(1, 1, 1, A, 2)
        xy = jax.nn.sigmoid(box[..., 0:2])
        wh = jnp.exp(box[..., 2:4]) * anc
        scores = predictions[..., 0:1]
        best_class = jnp.argmax(predictions[..., 5:], axis=-1)[
            ..., None
        ].astype(predictions.dtype)
    else:
        xy = box[..., 0:2]
        wh = box[..., 2:4]
        scores = predictions[..., 0:1]
        best_class = predictions[..., 5:6]
    cell_x = jnp.arange(w, dtype=predictions.dtype)[None, None, :, None,
                                                    None]
    cell_y = jnp.arange(h, dtype=predictions.dtype)[None, :, None, None,
                                                    None]
    x = (xy[..., 0:1] + cell_x) / w
    y = (xy[..., 1:2] + cell_y) / h
    wh = wh / jnp.asarray([w, h], dtype=predictions.dtype)
    out = jnp.concatenate([best_class, scores, x, y, wh], axis=-1)
    return out.reshape(B, h * w * A, 6)


@partial(jax.jit, static_argnames=("max_out",))
def tp_fp_fn_padded(
    target_boxes: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    nms_iou: float,
    nms_t: float,
    match_iou: float,
    max_out: int = 64,
):
    """Device TP/FP/FN: NMS both padded sets, then greedy IoU matching with
    the host semantics of detect.boxes.calculate_tp_fp_fn (util.py:765-797):
    tp when a pred's best target IoU > match_iou, fn when a target's best
    pred IoU < match_iou; no-target -> all preds fp; no-pred -> all targets
    fn.  Differs from the host path only through standard (quirk-free) NMS.

    :param target_boxes/pred_boxes (N, 6) [class, score, x, y, w, h]
    :return (tp, fp, fn) int32 scalars
    """
    t_kept, t_valid = nms_padded(target_boxes, nms_iou, nms_t, max_out)
    p_kept, p_valid = nms_padded(pred_boxes, nms_iou, nms_t, max_out)
    n_t = jnp.sum(t_valid)
    n_p = jnp.sum(p_valid)

    ious = iou_xywh(p_kept[:, None, 2:6], t_kept[None, :, 2:6])  # (P, T)
    best_per_pred = jnp.max(
        jnp.where(t_valid[None, :], ious, -jnp.inf), axis=1
    )
    best_per_target = jnp.max(
        jnp.where(p_valid[:, None], ious, -jnp.inf), axis=0
    )
    tp = jnp.sum(p_valid & (best_per_pred > match_iou))
    fp = jnp.sum(p_valid & ~(best_per_pred > match_iou))
    fn = jnp.sum(t_valid & (best_per_target < match_iou))

    empty_t = n_t == 0
    empty_p = n_p == 0
    tp = jnp.where(empty_t | empty_p, 0, tp)
    fp = jnp.where(empty_t, n_p, jnp.where(empty_p, 0, fp))
    fn = jnp.where(empty_t, 0, jnp.where(empty_p, n_t, fn))
    return tp, fp, fn
