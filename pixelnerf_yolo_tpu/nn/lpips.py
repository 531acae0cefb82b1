"""Native LPIPS (VGG16) perceptual metric.

The reference's calc_metrics.py reports PSNR/SSIM/LPIPS-vgg
(/root/reference/eval/calc_metrics.py:186,236-246) via the `lpips` torch
package.  This is the same metric as pure JAX: a VGG16 feature trunk with
five taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), channel-unit-
normalized feature differences, learned non-negative 1x1 heads, spatial
mean, summed over taps (Zhang et al. 2018 — the algorithm is the spec).

Weights follow the usual porting pipeline (no torchvision/lpips here):

  python scripts/port_lpips.py            # wherever `pip install lpips` works

writes ``lpips_vgg.npz`` (torchvision VGG16 `features.*` conv tensors plus
the LPIPS `lin*.model.1.weight` heads) onto nn/pretrained.py's search path.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 `features` indices of the 13 convs, grouped by the
# 5 LPIPS slices (maxpool between groups)
VGG16_SLICES = [
    [0, 2],
    [5, 7],
    [10, 12, 14],
    [17, 19, 21],
    [24, 26, 28],
]
# input scaling layer constants (the published LPIPS preprocessing)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, kernel, bias):
    """3x3 SAME conv, NCHW x OIHW (torch layout kept: weights port 1:1)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + bias[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def vgg16_taps(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """:param x (N, 3, H, W) LPIPS-scaled input -> 5 tap activations."""
    taps = []
    h = x
    for s, convs in enumerate(VGG16_SLICES):
        if s > 0:
            h = _maxpool2(h)
        for idx in convs:
            p = params[f"conv{idx}"]
            h = jax.nn.relu(_conv(h, p["kernel"], p["bias"]))
        taps.append(h)
    return taps


def _unit_normalize(h, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(h**2, axis=1, keepdims=True))
    return h / (norm + eps)


@partial(jax.jit, static_argnames=())
def lpips_distance(params: dict, a: jnp.ndarray, b: jnp.ndarray):
    """LPIPS(a, b) for images in [-1, 1].

    :param a/b (N, 3, H, W)
    :return (N,) distances
    """
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fa = vgg16_taps(params, (a - shift) / scale)
    fb = vgg16_taps(params, (b - shift) / scale)
    total = 0.0
    for i, (ha, hb) in enumerate(zip(fa, fb)):
        diff = (_unit_normalize(ha) - _unit_normalize(hb)) ** 2
        # 1x1 conv head (1, C, 1, 1), non-negative == channel-weighted sum
        w = params[f"lin{i}"]["kernel"].reshape(1, -1, 1, 1)
        val = jnp.sum(diff * w, axis=1, keepdims=True)
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


def port_lpips_state_dict(vgg_sd: dict, lin_sd: dict) -> dict:
    """torchvision vgg16 `features.*` + lpips `lin*.model.1.weight` tensors
    (numpy or torch) -> the params dict used above."""

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: dict = {}
    for convs in VGG16_SLICES:
        for idx in convs:
            params[f"conv{idx}"] = {
                "kernel": arr(vgg_sd[f"features.{idx}.weight"]),
                "bias": arr(vgg_sd[f"features.{idx}.bias"]),
            }
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        params[f"lin{i}"] = {"kernel": arr(lin_sd[key])}
    return params


def lpips_npz_path() -> str | None:
    from .pretrained import search_dirs

    for d in search_dirs():
        p = os.path.join(d, "lpips_vgg.npz")
        if os.path.exists(p):
            return p
    return None


def load_lpips() -> tuple[dict, str]:
    """(params, path) from ``lpips_vgg.npz`` on the pretrained search path,
    or raise FileNotFoundError with porting instructions."""
    path = lpips_npz_path()
    if path is None:
        from .pretrained import search_dirs

        raise FileNotFoundError(
            "No lpips_vgg.npz found. Port the weights once with "
            "`python scripts/port_lpips.py` (needs `pip install lpips` "
            "there only) and place lpips_vgg.npz in one of: "
            + ", ".join(search_dirs())
        )
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    vgg_sd = {k: v for k, v in flat.items() if k.startswith("features.")}
    lin_sd = {k: v for k, v in flat.items() if k.startswith("lin")}
    return port_lpips_state_dict(vgg_sd, lin_sd), path
