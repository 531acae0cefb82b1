"""PointRend mask heads: coarse mask + point-head adaptive subdivision.

Faithful inference re-derivation of the reference's vendored subset
(scripts/detectron2/projects/PointRend/point_rend/):

* ``point_sample`` — grid_sample over [0, 1]^2 coords, align_corners=False
  (point_features.py:19-42)
* coarse head — 14x14 regular-grid point features from p2, 2x2-stride
  conv, 2x FC-1024, 80x7x7 logits (coarse_mask_head.py:12-96,
  roi_heads.py:141-155)
* point head — 3x Conv1d-256 MLP on [fine-grained p2 feature; 80 coarse
  logits], coarse features re-concatenated at every layer
  (point_head.py:101-157)
* subdivision — 5 steps x 784 points: 2x bilinear upsample, pick the
  784 most uncertain grid points (uncertainty = -|logit of the predicted
  class|), re-predict them with the point head, scatter back
  (roi_heads.py:186-226)

All heads are pure functions over the ported detectron2 params pytree.
The ragged instance count R stays a host-side dimension (offline tool),
but every array op inside is jax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_nhwc
from ..ops.resize import resize_bilinear
from .backbone import conv
from .rcnn import STRIDES_RPN

COARSE_SIDE = 14  # ROI_MASK_HEAD.POOLER_RESOLUTION
COARSE_OUT = 7  # ROI_MASK_HEAD.OUTPUT_SIDE_RESOLUTION
NUM_CLASSES = 80
SUBDIV_STEPS = 5  # POINT_HEAD.SUBDIVISION_STEPS
SUBDIV_POINTS = 28 * 28  # POINT_HEAD.SUBDIVISION_NUM_POINTS


def point_sample(feat: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, C, H, W) at (N, P, 2) coords in [0, 1]^2 -> (N, C, P).

    point_features.point_sample: grid_sample(2 * coords - 1,
    align_corners=False), zeros padding.
    """
    N, C, H, W = feat.shape
    flat = feat.reshape(N, C, H * W).transpose(0, 2, 1)
    out = grid_sample_nhwc(
        flat, 2.0 * coords01 - 1.0, H, W,
        padding_mode="zeros", align_corners=False,
    )
    return out.transpose(0, 2, 1)  # (N, C, P)


def regular_grid_coords(side: int) -> np.ndarray:
    """(side^2, 2) xy grid at cell centers (i + 0.5)/side in [0, 1]
    (generate_regular_grid_point_coords via affine_grid)."""
    c = (np.arange(side, dtype=np.float32) + 0.5) / side
    gx, gy = np.meshgrid(c, c)  # row-major: y outer
    return np.stack([gx.ravel(), gy.ravel()], axis=1)


def sample_box_features(feat: jnp.ndarray, boxes: np.ndarray,
                        coords01: jnp.ndarray, stride: int) -> jnp.ndarray:
    """point_sample_fine_grained_features for a single level/image.

    :param feat (1, C, Hf, Wf); boxes (R, 4) xyxy image coords;
      coords01 (R, P, 2) or (P, 2) box-normalized
    :return (R, C, P)
    """
    R = len(boxes)
    b = jnp.asarray(boxes)
    if coords01.ndim == 2:
        coords01 = jnp.broadcast_to(coords01[None],
                                    (R,) + tuple(coords01.shape))
    P = coords01.shape[1]
    wh = b[:, None, 2:4] - b[:, None, 0:2]  # (R, 1, 2)
    coords_img = b[:, None, 0:2] + coords01 * wh  # image pixels
    # feature extent in image pixels is (Wf * stride, Hf * stride)
    _, C, Hf, Wf = feat.shape
    extent = jnp.asarray([Wf * stride, Hf * stride], jnp.float32)
    coords_feat01 = coords_img / extent
    # the feature map is SHARED across instances: gather all R*P points
    # against one (1, HW, C) table instead of broadcasting the map to
    # (R, C, Hf, Wf) (for an 800x1333 photo's p2 that would materialize
    # ~69 MB x R per sampling call)
    flat = feat.reshape(1, C, Hf * Wf).transpose(0, 2, 1)
    grid = (2.0 * coords_feat01 - 1.0).reshape(1, R * P, 2)
    out = grid_sample_nhwc(
        flat, grid, Hf, Wf, padding_mode="zeros", align_corners=False
    )  # (1, R*P, C)
    return out.reshape(R, P, C).transpose(0, 2, 1)


def coarse_mask_head_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """(R, 256, 14, 14) regular-grid features -> (R, 80, 7, 7) logits."""
    x = jax.nn.relu(
        conv(x, params["reduce_spatial_dim_conv"]["weight"],
             params["reduce_spatial_dim_conv"]["bias"], stride=2)
    )
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(
        x @ params["coarse_mask_fc1"]["weight"].T
        + params["coarse_mask_fc1"]["bias"]
    )
    x = jax.nn.relu(
        x @ params["coarse_mask_fc2"]["weight"].T
        + params["coarse_mask_fc2"]["bias"]
    )
    x = x @ params["prediction"]["weight"].T + params["prediction"]["bias"]
    return x.reshape(-1, NUM_CLASSES, COARSE_OUT, COARSE_OUT)


def point_head_apply(params, fine: jnp.ndarray,
                     coarse: jnp.ndarray) -> jnp.ndarray:
    """StandardPointHead: (R, C, P) + (R, 80, P) -> (R, 80, P) logits.

    Conv1d(k=1) == per-point linear; coarse features concatenated to the
    input of every layer (COARSE_PRED_EACH_LAYER=True).
    """
    x = jnp.concatenate([fine, coarse], axis=1)
    for k in (1, 2, 3):
        w = params[f"fc{k}"]["weight"]  # (out, in, 1) conv1d kernel
        x = jax.nn.relu(
            jnp.einsum("oi,rip->rop", w[:, :, 0], x)
            + params[f"fc{k}"]["bias"][None, :, None]
        )
        x = jnp.concatenate([x, coarse], axis=1)
    w = params["predictor"]["weight"]
    return (jnp.einsum("oi,rip->rop", w[:, :, 0], x)
            + params["predictor"]["bias"][None, :, None])


def uncertainty(logits: jnp.ndarray, classes: np.ndarray) -> jnp.ndarray:
    """-(|logit of the predicted class|): (R, C, ...) -> (R, 1, ...)."""
    picked = jnp.take_along_axis(
        logits, jnp.asarray(classes).reshape(-1, *([1] * (logits.ndim - 1))),
        axis=1,
    )
    return -jnp.abs(picked)


def uncertain_grid_points(unc_map: jnp.ndarray, num_points: int):
    """Top-``num_points`` uncertain cells of an (R, 1, H, W) map ->
    (indices (R, P), coords (R, P, 2) at cell centers in [0, 1])."""
    R, _, H, W = unc_map.shape
    num_points = min(H * W, num_points)
    _, idx = jax.lax.top_k(unc_map.reshape(R, H * W), num_points)
    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)
    coords = jnp.stack(
        [(xs + 0.5) / W, (ys + 0.5) / H], axis=-1
    )
    return idx, coords


def mask_point_inference(params, p2: jnp.ndarray, boxes: np.ndarray,
                         classes: np.ndarray) -> jnp.ndarray:
    """Full PointRend mask inference: (R, 1, 224, 224) sigmoid masks.

    roi_heads.PointRendROIHeads._forward_mask (inference branch):
    coarse 7x7 logits, then SUBDIV_STEPS x (2x upsample -> refine the
    SUBDIV_POINTS most uncertain points with the point head).
    """
    R = len(boxes)
    stride = STRIDES_RPN["p2"]
    grid14 = jnp.asarray(regular_grid_coords(COARSE_SIDE))
    coarse_feats = sample_box_features(p2, boxes, grid14, stride)
    coarse_logits = coarse_mask_head_apply(
        params["mask_coarse_head"],
        coarse_feats.reshape(R, -1, COARSE_SIDE, COARSE_SIDE),
    )

    mask_logits = coarse_logits
    for step in range(SUBDIV_STEPS):
        H, W = mask_logits.shape[-2:]
        mask_logits = resize_bilinear(
            mask_logits, (H * 2, W * 2), align_corners=False
        )
        H, W = H * 2, W * 2
        if SUBDIV_POINTS >= 4 * H * W and step < SUBDIV_STEPS - 1:
            continue  # refinement at the next resolution covers this one
        unc = uncertainty(mask_logits, classes)
        idx, coords = uncertain_grid_points(unc, SUBDIV_POINTS)
        fine = sample_box_features(p2, boxes, coords, stride)
        coarse_at = point_sample(coarse_logits, coords)
        point_logits = point_head_apply(
            params["mask_point_head"], fine, coarse_at
        )  # (R, 80, P)
        flat = mask_logits.reshape(R, NUM_CLASSES, H * W)
        # scatter the refined logits of every class channel at idx
        flat = jax.vmap(
            lambda f, i, v: f.at[:, i].set(v)
        )(flat, idx, point_logits)
        mask_logits = flat.reshape(R, NUM_CLASSES, H, W)

    # mask_rcnn_inference: keep the predicted class's channel, sigmoid
    picked = jnp.take_along_axis(
        mask_logits, jnp.asarray(classes).reshape(-1, 1, 1, 1), axis=1
    )
    return jax.nn.sigmoid(picked)


def paste_masks(masks: jnp.ndarray, boxes: np.ndarray, img_h: int,
                img_w: int, thresh: float = 0.5) -> np.ndarray:
    """Paste (R, 1, M, M) box masks into full-image binary masks
    (detectron2 _do_paste_mask semantics: sample the box mask at image
    pixel centers with align_corners=False).

    :return (R, img_h, img_w) uint8 in {0, 1}
    """
    R = masks.shape[0]
    if R == 0:
        return np.zeros((0, img_h, img_w), np.uint8)
    b = jnp.asarray(boxes)  # (R, 4)
    xs = jnp.arange(img_w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(img_h, dtype=jnp.float32) + 0.5
    w = jnp.maximum(b[:, 2] - b[:, 0], 1e-6)
    h = jnp.maximum(b[:, 3] - b[:, 1], 1e-6)
    gx = (xs[None, :] - b[:, 0:1]) / w[:, None] * 2.0 - 1.0  # (R, W)
    gy = (ys[None, :] - b[:, 1:2]) / h[:, None] * 2.0 - 1.0  # (R, H)
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (R, img_h, img_w)),
         jnp.broadcast_to(gy[:, :, None], (R, img_h, img_w))], axis=-1
    ).reshape(R, img_h * img_w, 2)
    M = masks.shape[-1]
    flat = masks.reshape(R, 1, M * M).transpose(0, 2, 1)
    out = grid_sample_nhwc(
        flat, grid, M, M, padding_mode="zeros", align_corners=False
    ).reshape(R, img_h, img_w)
    return np.asarray(out >= thresh, np.uint8)
