"""ResNet-50 (FrozenBN, caffe-style) + FPN feature pyramid.

Matches detectron2's ``build_resnet_fpn_backbone`` as configured by
PointRend's config stack (reference
scripts/detectron2/configs/Base-RCNN-FPN.yaml: RESNETS.OUT_FEATURES
res2-res5, FPN.IN_FEATURES res2-res5), inference only:

* MSRA/caffe R-50: stride in the FIRST 1x1 conv of each bottleneck
  (detectron2 RESNETS.STRIDE_IN_1X1=True default), FrozenBatchNorm
  (running stats folded at apply time, eps 1e-5).
* FPN: 1x1 lateral convs to 256ch, top-down nearest 2x upsample + add,
  3x3 output convs -> p2..p5; p6 = stride-2 subsample of p5
  (detectron2 LastLevelMaxPool: max_pool2d(kernel=1, stride=2)).

Params pytree keys mirror detectron2 checkpoint names (see port.py), so
the port is a reshape-free copy.  Layout NCHW / OIHW like nn/lpips.py —
weights port 1:1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (n_blocks, bottleneck_width, out_channels) per stage, ResNet-50
R50_STAGES = ((3, 64, 256), (4, 128, 512), (6, 256, 1024), (3, 512, 2048))
FPN_DIM = 256
# image-pixel stride of each pyramid level
STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


def conv(x, w, b=None, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def frozen_bn(x, p, eps=1e-5):
    """FrozenBatchNorm2d: running stats are constants at inference."""
    scale = p["weight"] / jnp.sqrt(p["running_var"] + eps)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _conv_bn(x, p, stride=1, padding=0):
    return frozen_bn(conv(x, p["weight"], stride=stride, padding=padding),
                     p["norm"])


def _bottleneck(x, p, stride):
    """conv1 1x1 (carries the stride — caffe style) -> conv2 3x3 ->
    conv3 1x1; projection shortcut when present."""
    out = jax.nn.relu(_conv_bn(x, p["conv1"], stride=stride))
    out = jax.nn.relu(_conv_bn(out, p["conv2"], stride=1, padding=1))
    out = _conv_bn(out, p["conv3"])
    sc = (_conv_bn(x, p["shortcut"], stride=stride)
          if "shortcut" in p else x)
    return jax.nn.relu(out + sc)


def _max_pool(x, window, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window),
        (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )


def resnet50_features(params, x):
    """x (B, 3, H, W) normalized BGR -> [res2, res3, res4, res5]."""
    x = jax.nn.relu(_conv_bn(x, params["stem"]["conv1"], stride=2,
                             padding=3))
    x = _max_pool(x, 3, 2, 1)
    feats = []
    for i, (n_blocks, _, _) in enumerate(R50_STAGES):
        stage = params[f"res{i + 2}"]
        for j in range(n_blocks):
            first_stride = 1 if i == 0 else 2
            x = _bottleneck(x, stage[str(j)],
                            stride=first_stride if j == 0 else 1)
        feats.append(x)
    return feats


def fpn(params, feats):
    """[res2..res5] -> {p2..p6} 256-channel pyramid."""
    laterals = [
        conv(f, params[f"fpn_lateral{i + 2}"]["weight"],
             params[f"fpn_lateral{i + 2}"]["bias"])
        for i, f in enumerate(feats)
    ]
    # top-down: nearest 2x upsample + add (detectron2 F.interpolate
    # mode="nearest")
    merged = [laterals[-1]]
    for lat in laterals[-2::-1]:
        up = jnp.repeat(jnp.repeat(merged[-1], 2, axis=2), 2, axis=3)
        up = up[:, :, : lat.shape[2], : lat.shape[3]]
        merged.append(lat + up)
    merged = merged[::-1]  # [m2, m3, m4, m5]
    out = {
        f"p{i + 2}": conv(m, params[f"fpn_output{i + 2}"]["weight"],
                          params[f"fpn_output{i + 2}"]["bias"], padding=1)
        for i, m in enumerate(merged)
    }
    out["p6"] = out["p5"][:, :, ::2, ::2]  # max_pool2d(kernel=1, stride=2)
    return out


def backbone_apply(params, x):
    return fpn(params["fpn"], resnet50_features(params["bottom_up"], x))
