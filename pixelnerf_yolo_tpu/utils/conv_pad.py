"""SAME-padding helpers for convolutions (numpy/jnp shape math).

Parity: /root/reference/src/util/util.py:428-486 (calc_same_pad_conv2d /
same_pad_conv2d / same_unpad_deconv2d) — used by ConvEncoder-style models.
On TPU we normally bake explicit padding into nn.Conv, but these helpers
are part of the reference's public utility surface.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def calc_same_pad_conv2d(t_shape, kernel_size: int = 3, stride: int = 1):
    """(pad_left, pad_right, pad_top, pad_bottom) for SAME conv output."""
    in_height, in_width = t_shape[-2:]
    out_height = math.ceil(in_height / stride)
    out_width = math.ceil(in_width / stride)

    pad_along_height = max(
        (out_height - 1) * stride + kernel_size - in_height, 0
    )
    pad_along_width = max(
        (out_width - 1) * stride + kernel_size - in_width, 0
    )
    pad_top = pad_along_height // 2
    pad_bottom = pad_along_height - pad_top
    pad_left = pad_along_width // 2
    pad_right = pad_along_width - pad_left
    return pad_left, pad_right, pad_top, pad_bottom


def same_pad_conv2d(t, padding_type: str = "reflect", kernel_size: int = 3,
                    stride: int = 1):
    """Pad (..., H, W) for SAME conv.  padding_type: constant | reflect |
    replicate (edge) | circular (wrap)."""
    mode = {
        "constant": "constant",
        "reflect": "reflect",
        "replicate": "edge",
        "circular": "wrap",
    }[padding_type]
    left, right, top, bottom = calc_same_pad_conv2d(
        t.shape, kernel_size, stride
    )
    pad = [(0, 0)] * (t.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(t, pad, mode=mode)


def get_norm_layer(norm_type: str = "instance", group_norm_groups: int = 32):
    """Normalization-layer factory (reference src/util/util.py:358-379),
    flax edition: returns a zero-arg constructor for a linen norm module.
    norm_type: batch | instance | group | none."""
    import functools

    import flax.linen as nn

    if norm_type == "batch":
        return functools.partial(
            nn.BatchNorm, use_running_average=True, momentum=0.9,
            epsilon=1e-5,
        )
    if norm_type == "instance":
        # InstanceNorm(affine=False) == GroupNorm with one group per channel
        return functools.partial(
            nn.GroupNorm, num_groups=None, group_size=1, use_bias=False,
            use_scale=False,
        )
    if norm_type == "group":
        return functools.partial(nn.GroupNorm, num_groups=group_norm_groups)
    if norm_type == "none":
        return None
    raise NotImplementedError(
        "normalization layer [%s] is not found" % norm_type
    )


def make_conv_2d(
    dim_in: int,
    dim_out: int,
    padding_type: str = "reflect",
    norm_layer=None,
    activation=None,
    kernel_size: int = 3,
    use_leaky_relu: bool = False,
    use_bias: bool = False,
    stride: int = 1,
):
    """Conv block factory (reference src/util/util.py:382-425), flax
    edition: returns a linen Sequential of [Conv, norm?, activation?]
    whose input must already be SAME-padded via same_pad_conv2d (the
    reference separates padding from the conv the same way)."""
    import flax.linen as nn

    layers = [
        nn.Conv(
            features=dim_out,
            kernel_size=(kernel_size, kernel_size),
            strides=(stride, stride),
            padding="VALID",
            use_bias=use_bias,
        )
    ]
    if norm_layer is not None:
        layers.append(norm_layer())
    if activation is not None:
        layers.append(activation)
    elif use_leaky_relu:
        layers.append(lambda x: nn.leaky_relu(x, negative_slope=0.2))
    return nn.Sequential(layers)


def same_unpad_deconv2d(t, kernel_size: int = 3, stride: int = 1):
    """Crop deconv output back to the SAME-padded shape."""
    h_scaled = (t.shape[-2] - 1) * stride
    w_scaled = (t.shape[-1] - 1) * stride
    left, right, top, bottom = calc_same_pad_conv2d(
        (h_scaled, w_scaled), kernel_size, stride
    )
    return t[
        ...,
        top : t.shape[-2] - bottom if bottom > 0 else t.shape[-2],
        left : t.shape[-1] - right if right > 0 else t.shape[-1],
    ]
