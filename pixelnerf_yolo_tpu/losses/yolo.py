"""YOLO detection loss (4 components), jit-friendly masked means.

Parity: /root/reference/src/model/loss.py:107-179.
  * no-object: BCE of predicted prob vs 0 on cells with target prob == 0
  * object: MSE of predicted prob vs IoU(decoded pred box, target box) * 1
    on cells with target prob == 1 (IoU detached)
  * box: MSE of [sigmoid(xy), raw wh] vs [target xy, log(target_wh/anchor)]
  * class: cross-entropy on target cells
The reference computes its masked means over dynamically-shaped boolean
selections and mutates pred/target in place (loss.py:145-150); here each
term is an equivalent masked mean with static shapes.  torch BCE's log
clamp at -100 is reproduced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def iou_xywh(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of center-format boxes, last dim 4.  util.py:576-611."""
    b1_x1 = box1[..., 0] - box1[..., 2] / 2
    b1_y1 = box1[..., 1] - box1[..., 3] / 2
    b1_x2 = box1[..., 0] + box1[..., 2] / 2
    b1_y2 = box1[..., 1] + box1[..., 3] / 2
    b2_x1 = box2[..., 0] - box2[..., 2] / 2
    b2_y1 = box2[..., 1] - box2[..., 3] / 2
    b2_x2 = box2[..., 0] + box2[..., 2] / 2
    b2_y2 = box2[..., 1] + box2[..., 3] / 2

    x1 = jnp.maximum(b1_x1, b2_x1)
    y1 = jnp.maximum(b1_y1, b2_y1)
    x2 = jnp.minimum(b1_x2, b2_x2)
    y2 = jnp.minimum(b1_y2, b2_y2)
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area1 = jnp.abs((b1_x2 - b1_x1) * (b1_y2 - b1_y1))
    area2 = jnp.abs((b2_x2 - b2_x1) * (b2_y2 - b2_y1))
    return inter / (area1 + area2 - inter + 1e-6)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values where mask, 0 if mask empty (the reference's
    obj.sum()>0 guards, loss.py:141-154)."""
    count = jnp.sum(mask)
    total = jnp.sum(jnp.where(mask, values, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss elementwise with log clamped at -100."""
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - p), -100.0)
    return -(t * log_p + (1.0 - t) * log_1p)


class YoloLoss:
    def __init__(self, num_anchors_per_scale, box_loss, object_loss,
                 no_object_loss, class_loss):
        self.num_anchors_per_scale = num_anchors_per_scale
        self.box_loss = box_loss
        self.object_loss = object_loss
        self.no_object_loss = no_object_loss
        self.class_loss = class_loss

    @partial(jax.jit, static_argnums=(0,))
    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 anchors: jnp.ndarray):
        """:param pred (..., A, 7) renderer output [prob, x, y, w, h, c0, c1]
        :param target (..., A, 6) grid targets [prob, x, y, w, h, cls]
        :param anchors (A, 2)
        :return (total, box, object, no_object, class) scalars
        """
        obj = target[..., 0] == 1
        no_obj = target[..., 0] == 0

        # no-object: predicted prob (already in [0,1] via the renderer's
        # max-sigmoid aggregation) vs target 0
        no_object_loss = _masked_mean(
            _bce(pred[..., 0], target[..., 0] * 0.0), no_obj
        )

        anchors_b = anchors.reshape(
            (1,) * (pred.ndim - 2) + (self.num_anchors_per_scale, 2)
        )
        box_preds = jnp.concatenate(
            [
                jax.nn.sigmoid(pred[..., 1:3]),
                jnp.exp(pred[..., 3:5]) * anchors_b,
            ],
            axis=-1,
        )
        ious = jax.lax.stop_gradient(iou_xywh(box_preds, target[..., 1:5]))
        object_loss = _masked_mean(
            (pred[..., 0] - ious * target[..., 0]) ** 2, obj
        )

        # box loss on [sigmoid(xy), raw wh] vs [xy, log(wh/anchor)]
        pred_box = jnp.concatenate(
            [jax.nn.sigmoid(pred[..., 1:3]), pred[..., 3:5]], axis=-1
        )
        target_box = jnp.concatenate(
            [
                target[..., 1:3],
                jnp.log(1e-6 + target[..., 3:5] / anchors_b),
            ],
            axis=-1,
        )
        box_loss = _masked_mean(
            jnp.mean((pred_box - target_box) ** 2, axis=-1), obj
        )

        # class cross-entropy (2 classes)
        logits = pred[..., 5:]
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        cls_idx = target[..., 5].astype(jnp.int32)
        ce = -jnp.take_along_axis(log_probs, cls_idx[..., None], axis=-1)[
            ..., 0
        ]
        class_loss = _masked_mean(ce, obj)

        total = (
            box_loss * self.box_loss
            + object_loss * self.object_loss
            + no_object_loss * self.no_object_loss
            + class_loss * self.class_loss
        )
        return total, box_loss, object_loss, no_object_loss, class_loss

    @classmethod
    def from_conf(cls, conf, num_anchors_per_scale) -> "YoloLoss":
        print("using weights for yolo loss")
        print("box_loss", conf["yolo.weights.box_loss"])
        print("object_loss", conf["yolo.weights.object_loss"])
        print("no_object_loss", conf["yolo.weights.no_object_loss"])
        print("class_loss", conf["yolo.weights.class_loss"])
        return cls(
            num_anchors_per_scale,
            conf["yolo.weights.box_loss"],
            conf["yolo.weights.object_loss"],
            conf["yolo.weights.no_object_loss"],
            conf["yolo.weights.class_loss"],
        )
