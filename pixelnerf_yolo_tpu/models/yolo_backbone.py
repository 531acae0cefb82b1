"""TPU-native multi-scale detection backbone (the "custom" encoder).

The reference wires an *external* YOLOv7 checkpoint as its custom backbone
(/root/reference/src/model/custom_encoder.py:14-26: szemenyeim/NeRF-YOLO,
``model(x, feature=True)``, total feature dim 1792).  That repo is not
vendored, so this is a from-scratch ELAN/CSP-style backbone with the same
interface contract: multi-scale feature maps whose channels sum to 1792
(256 + 512 + 1024 at strides 8/16/32 — YOLOv7's P3/P4/P5 widths).
Deviation from the reference is deliberate and documented (SURVEY.md §7
hard-part 6): the external dependency is replaced, not copied.

TPU notes: NHWC, SiLU, BatchNorm; all convs stay MXU-friendly (3x3/1x1,
channel counts multiples of 64 at the taps).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.precision import matmul_precision

YOLO_BACKBONE_DIMS = [256, 512, 1024]  # strides 8, 16, 32
YOLO_BACKBONE_LATENT = sum(YOLO_BACKBONE_DIMS)  # 1792


class ConvBnAct(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.filters,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            precision=matmul_precision(self.dtype),
            dtype=jnp.dtype(self.dtype),
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.dtype(self.dtype),
                         param_dtype=jnp.float32)(x)
        return nn.silu(x)


class ELANBlock(nn.Module):
    """Simplified ELAN: two parallel 1x1 stems, one runs a chain of 3x3
    convs with intermediate taps; all taps concatenated then fused 1x1."""

    filters: int
    depth: int = 2
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.filters // 2
        a = ConvBnAct(half, kernel=1, dtype=self.dtype)(x, train)
        b = ConvBnAct(half, kernel=1, dtype=self.dtype)(x, train)
        taps = [a, b]
        y = b
        for _ in range(self.depth):
            y = ConvBnAct(half, kernel=3, dtype=self.dtype)(y, train)
            y = ConvBnAct(half, kernel=3, dtype=self.dtype)(y, train)
            taps.append(y)
        out = jnp.concatenate(taps, axis=-1)
        return ConvBnAct(self.filters, kernel=1, dtype=self.dtype)(out, train)


class YOLOBackbone(nn.Module):
    """Emit [P3, P4, P5] NHWC feature maps (256/512/1024 ch @ /8,/16,/32)."""

    width: float = 1.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        def ch(c):
            return max(int(c * self.width), 16)

        dt = self.dtype
        # stem: /2 then /4
        x = ConvBnAct(ch(32), 3, 1, dt)(x, train)
        x = ConvBnAct(ch(64), 3, 2, dt)(x, train)
        x = ConvBnAct(ch(64), 3, 1, dt)(x, train)
        x = ConvBnAct(ch(128), 3, 2, dt)(x, train)  # /4
        x = ELANBlock(ch(128), dtype=dt)(x, train)

        x = ConvBnAct(ch(256), 3, 2, dt)(x, train)  # /8
        p3 = ELANBlock(ch(256), dtype=dt)(x, train)

        x = ConvBnAct(ch(512), 3, 2, dt)(p3, train)  # /16
        p4 = ELANBlock(ch(512), dtype=dt)(x, train)

        x = ConvBnAct(ch(1024), 3, 2, dt)(p4, train)  # /32
        p5 = ELANBlock(ch(1024), dtype=dt)(x, train)

        return [p3, p4, p5]


class ConvEncoder(nn.Module):
    """Simple U-Net-ish conv encoder with skip connections.

    Functional port of the reference's (dead-code) ConvEncoder
    (custom_encoder.py:28-114): 7x7/2 stem, 3 stride-2 down convs, global
    mid bottleneck broadcast back, 3 up-convs with skips.  128-d output at
    half resolution.
    """

    dim_in: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        from ..ops.resize import resize_bilinear

        act = nn.leaky_relu
        gn = lambda: nn.GroupNorm(num_groups=32)

        def conv(x, ch, k, s):
            pad = k // 2
            return nn.Conv(ch, (k, k), strides=(s, s),
                           padding=[(pad, pad), (pad, pad)],
                           use_bias=False, precision="highest")(x)

        x = act(gn()(conv(x, 64, 7, 2)))
        inters = []
        chnls = 64
        for _ in range(3):
            x = act(gn()(conv(x, 2 * chnls, 3, 2)))
            inters.append(x)
            chnls *= 2
        mid = jnp.mean(x, axis=(1, 2), keepdims=True)
        mid = act(gn()(nn.Conv(128, (1, 1), use_bias=False,
                               precision="highest")(mid)))
        x = jnp.broadcast_to(mid, x.shape[:3] + (128,))
        for i in reversed(range(3)):
            x = jnp.concatenate([x, inters[i]], axis=-1)
            up_hw = (
                inters[i - 1].shape[1:3]
                if i > 0
                else (inters[0].shape[1] * 2, inters[0].shape[2] * 2)
            )
            x = resize_bilinear(
                x.transpose(0, 3, 1, 2), up_hw, align_corners=True
            ).transpose(0, 2, 3, 1)
            x = act(gn()(conv(x, max(inters[i].shape[-1] // 2, 128), 3, 1)))
        x = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                    precision="highest")(x)
        return [x]
