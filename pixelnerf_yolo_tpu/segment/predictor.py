"""End-to-end PointRend predictor (DefaultPredictor equivalence).

Pipeline per photo (reference scripts/preproc.py:106-130 +
detectron2 DefaultPredictor / GeneralizedRCNN.inference):

  BGR uint8 -> resize shortest edge to ``min_size`` (cap ``max_size``)
  -> subtract caffe pixel means (no std) -> pad to stride-64 divisible
  -> backbone/RPN/ROI box head -> score>=0.5 detections
  -> PointRend masks -> paste at the original resolution.

Weights: ``pointrend_r50fpn.npz`` on the nn/pretrained.py search path
(written by ``scripts/port_detectron2.py`` from the published detectron2
checkpoint — the same offline porting pipeline as LPIPS / torchvision).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.pretrained import search_dirs
from ..ops.resize import resize_bilinear
from .backbone import backbone_apply
from .pointrend import mask_point_inference, paste_masks
from .port import port_detectron2_state_dict
from .rcnn import (
    box_head_apply,
    box_inference,
    pool_roi_features,
    rpn_head_apply,
    rpn_proposals,
)

# detectron2 caffe-style defaults (cfg.MODEL.PIXEL_MEAN / PIXEL_STD)
PIXEL_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)
_FILENAME = "pointrend_r50fpn.npz"
PAD_DIVISOR = 64  # backbone's deepest stride (p6)


def pointrend_npz_path() -> str | None:
    for d in search_dirs():
        p = os.path.join(d, _FILENAME)
        if os.path.exists(p):
            return p
    return None


def load_pointrend_params() -> dict:
    path = pointrend_npz_path()
    if path is None:
        raise FileNotFoundError(
            f"{_FILENAME} not found in {search_dirs()}; run "
            "scripts/port_detectron2.py on a machine with the detectron2 "
            "PointRend checkpoint to create it"
        )
    with np.load(path) as z:
        sd = {k: z[k] for k in z.files}
    return port_detectron2_state_dict(sd)


class PointRendPredictor:
    """Callable mirroring the reference's PointRendWrapper.segment
    (scripts/preproc.py:106-174): BGR image -> list of (H, W) uint8
    masks, highest-scoring instance first."""

    def __init__(self, params: dict | None = None, filter_class: int = -1,
                 score_thresh: float = 0.5, min_size: int = 800,
                 max_size: int = 1333):
        self.params = params if params is not None else load_pointrend_params()
        self.filter_class = filter_class
        self.score_thresh = score_thresh
        self.min_size = min_size
        self.max_size = max_size
        self._backbone = jax.jit(backbone_apply)
        self._rpn_head = jax.jit(rpn_head_apply)

    def _preprocess(self, img_bgr: np.ndarray):
        h, w = img_bgr.shape[:2]
        scale = self.min_size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        x = jnp.asarray(img_bgr, jnp.float32).transpose(2, 0, 1)[None]
        x = resize_bilinear(x, (nh, nw), align_corners=False)
        x = x - jnp.asarray(PIXEL_MEAN_BGR)[None, :, None, None]
        ph = -nh % PAD_DIVISOR
        pw = -nw % PAD_DIVISOR
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)))
        return x, (nh, nw)

    def detect(self, img_bgr: np.ndarray):
        """-> dict(boxes (R, 4) xyxy in ORIGINAL pixels, scores (R,),
        classes (R,), masks (R, H, W) uint8)."""
        h0, w0 = img_bgr.shape[:2]
        x, (nh, nw) = self._preprocess(img_bgr)
        feats = self._backbone(self.params["backbone"], x)
        rpn_out = self._rpn_head(self.params["rpn_head"], feats)
        proposals, _ = rpn_proposals(rpn_out, nh, nw)
        if len(proposals) == 0:
            return dict(boxes=np.zeros((0, 4), np.float32),
                        scores=np.zeros((0,), np.float32),
                        classes=np.zeros((0,), np.int64),
                        masks=np.zeros((0, h0, w0), np.uint8))
        pooled = pool_roi_features(feats, proposals)
        scores, deltas = box_head_apply(self.params["box_head"], pooled)
        boxes, det_scores, classes = box_inference(
            np.asarray(scores), np.asarray(deltas), proposals, nh, nw,
            score_thresh=self.score_thresh,
        )
        if self.filter_class >= 0:
            keep = classes == self.filter_class
            boxes, det_scores, classes = (
                boxes[keep], det_scores[keep], classes[keep]
            )
        if len(boxes) == 0:
            return dict(boxes=np.zeros((0, 4), np.float32),
                        scores=np.zeros((0,), np.float32),
                        classes=np.zeros((0,), np.int64),
                        masks=np.zeros((0, h0, w0), np.uint8))
        masks224 = mask_point_inference(
            self.params["roi_heads"], feats["p2"], boxes, classes
        )
        # detector_postprocess: rescale boxes/masks to the input resolution
        sx, sy = w0 / nw, h0 / nh
        boxes_orig = boxes * np.array([sx, sy, sx, sy], np.float32)
        masks = paste_masks(masks224, boxes_orig, h0, w0)
        return dict(boxes=boxes_orig, scores=det_scores, classes=classes,
                    masks=masks)

    def segment(self, img_bgr: np.ndarray) -> list[np.ndarray]:
        """List of (H, W) uint8 {0, 255} masks, best instance first —
        the reference wrapper's contract (scripts/preproc.py:159-174)."""
        out = self.detect(img_bgr)
        return [m * np.uint8(255) for m in out["masks"]]
