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
