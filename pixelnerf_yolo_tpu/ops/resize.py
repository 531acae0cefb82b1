"""Bilinear resize with torch F.interpolate semantics, as matmuls.

The encoder upsamples all multi-scale latents to the scale-0 size with
``F.interpolate(mode="bilinear", align_corners=True)``
(/root/reference/src/model/encoder.py:130-136,162-168).  jax.image.resize
has no align_corners mode, so we build separable 1-D interpolation matrices
and contract them — two small dense matmuls per image, which XLA maps
straight onto the MXU (far better than gather-based resize on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(n_out: int, n_in: int, align_corners: bool) -> np.ndarray:
    """Row i holds the linear-interp weights of output sample i."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
            src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@partial(jax.jit, static_argnames=("out_hw", "align_corners"))
def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True
) -> jnp.ndarray:
    """Resize (B, C, H, W) -> (B, C, out_h, out_w), bilinear.

    align_corners=True matches torch F.interpolate(align_corners=True);
    False matches torch's default half-pixel convention.
    """
    B, C, H, W = x.shape
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix(out_h, H, align_corners))
    mw = jnp.asarray(_interp_matrix(out_w, W, align_corners))
    # (oh,H) @ (B,C,H,W) -> (B,C,oh,W) -> (B,C,oh,ow)
    y = jnp.einsum("oh,bchw->bcow", mh, x, precision="highest")
    return jnp.einsum("pw,bcow->bcop", mw, y, precision="highest")


def resize_area(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Area (adaptive-average) downsample, matching torch mode="area".

    Used for feature_scale < 1 paths (encoder.py:116-123).  Implemented via
    the same separable-matmul trick with box-integration weights.
    """
    B, C, H, W = x.shape
    out_h, out_w = out_hw

    def area_matrix(n_out, n_in):
        m = np.zeros((n_out, n_in), dtype=np.float32)
        scale = n_in / n_out
        for i in range(n_out):
            lo, hi = i * scale, (i + 1) * scale
            for j in range(int(np.floor(lo)), int(np.ceil(hi))):
                m[i, j] = min(hi, j + 1) - max(lo, j)
        return m / scale

    mh = jnp.asarray(area_matrix(out_h, H))
    mw = jnp.asarray(area_matrix(out_w, W))
    y = jnp.einsum("oh,bchw->bcow", mh, x, precision="highest")
    return jnp.einsum("pw,bcow->bcop", mw, y, precision="highest")
