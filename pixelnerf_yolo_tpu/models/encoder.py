"""Spatial (pixel-aligned) and global image encoders.

Parity: /root/reference/src/model/encoder.py.
  * SpatialEncoder: backbone features at multiple scales, all upsampled to
    the scale-0 size and concatenated into one latent map
    (encoder.py:139-173); latent_scaling = sz/(sz-1)*2 (encoder.py:170-172)
  * index(): uv pixel coords -> normalized grid -> bilinear grid_sample
    (encoder.py:79-108)
  * ImageEncoder: global pooled resnet vector broadcast per point
    (encoder.py:189-250)

TPU design: the encoder is a flax module returning the latent map in NHWC
plus a flattened (B, Hl*Wl, C) view for row-gather indexing; ``index`` is a
pure function so it fuses into the renderer under jit.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.resnet import ResNetFeatures, STAGE_WIDTHS
from ..ops.grid_sample import grid_sample_nhwc
from ..ops.resize import resize_area, resize_bilinear
from .yolo_backbone import (
    ConvEncoder,
    YOLOBackbone,
    YOLO_BACKBONE_LATENT,
)


def spatial_latent_size(backbone: str, num_layers: int) -> int:
    if backbone == "custom":
        return YOLO_BACKBONE_LATENT
    if backbone == "conv":
        return 128
    return int(np.cumsum([0] + STAGE_WIDTHS)[num_layers])


class SpatialEncoder(nn.Module):
    """Multi-scale pixel-aligned encoder producing one concatenated latent."""

    backbone: str = "resnet34"
    pretrained: bool = True  # kept for conf parity; weights come via porting
    num_layers: int = 4
    index_interp: str = "bilinear"
    index_padding: str = "border"
    upsample_interp: str = "bilinear"
    feature_scale: float = 1.0
    use_first_pool: bool = True
    norm_type: str = "batch"
    dtype: str = "float32"

    @property
    def latent_size(self) -> int:
        return spatial_latent_size(self.backbone, self.num_layers)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """:param x (B, H, W, 3) NHWC, values in [-1, 1]
        :return latent (B, Hl, Wl, C)
        """
        if self.feature_scale != 1.0:
            h = int(x.shape[1] * self.feature_scale)
            w = int(x.shape[2] * self.feature_scale)
            xc = x.transpose(0, 3, 1, 2)
            xc = (
                resize_bilinear(xc, (h, w), align_corners=True)
                if self.feature_scale > 1.0
                else resize_area(xc, (h, w))
            )
            x = xc.transpose(0, 2, 3, 1)

        # train-trace cut point (scripts/profile_trace.py): the conv trunk
        # is the one train-step stage outside the reference's scope set
        with jax.named_scope("encoder_trunk"):
            if self.backbone == "custom":
                latents = YOLOBackbone(dtype=self.dtype, name="model")(
                    x, train
                )
            elif self.backbone == "conv":
                latents = ConvEncoder(name="model")(x, train)
            else:
                latents = ResNetFeatures(
                    backbone=self.backbone,
                    num_layers=self.num_layers,
                    use_first_pool=self.use_first_pool,
                    norm_type=self.norm_type,
                    dtype=self.dtype,
                    name="model",
                )(x, train)

        align = None if self.index_interp == "nearest " else True
        tgt = latents[0].shape[1:3]
        ups = []
        for f in latents:
            fc = f.transpose(0, 3, 1, 2)
            fc = resize_bilinear(fc, tgt, align_corners=bool(align))
            ups.append(fc.transpose(0, 2, 3, 1))
        return jnp.concatenate(ups, axis=-1)  # (B, Hl, Wl, C)

    @classmethod
    def from_conf(cls, conf, dtype: str = "float32") -> "SpatialEncoder":
        return cls(
            backbone=conf.get_string("backbone"),
            pretrained=conf.get_bool("pretrained", True),
            num_layers=conf.get_int("num_layers", 4),
            index_interp=conf.get_string("index_interp", "bilinear"),
            index_padding=conf.get_string("index_padding", "border"),
            upsample_interp=conf.get_string("upsample_interp", "bilinear"),
            feature_scale=conf.get_float("feature_scale", 1.0),
            use_first_pool=conf.get_bool("use_first_pool", True),
            dtype=dtype,
        )


def latent_scaling_of(latent_hw: tuple[int, int]) -> jnp.ndarray:
    """latent_scaling = [Wl, Hl] / ([Wl, Hl] - 1) * 2  (encoder.py:170-172)."""
    wl_hl = jnp.asarray([latent_hw[1], latent_hw[0]], dtype=jnp.float32)
    return wl_hl / (wl_hl - 1.0) * 2.0


def index_latent(
    latent_flat: jnp.ndarray,
    latent_hw: tuple[int, int],
    uv: jnp.ndarray,
    image_size: jnp.ndarray | None,
    index_interp: str = "bilinear",
    index_padding: str = "border",
    scales: jnp.ndarray | None = None,
    nan_scrub_ok: bool = False,
) -> jnp.ndarray:
    """Pixel-aligned feature lookup (encoder.py:79-108).

    :param latent_flat (B, Hl*Wl, C) — int8 when ``scales`` is given
      (serving mode; see ops.grid_sample.grid_sample_nhwc_q8)
    :param uv (B, N, 2) pixel coords (x, y) in image space, or already in
      [-1, 1] when image_size is None
    :param image_size (W, H) of the *input images* the uv are expressed in
    :return (B, N, C)
    """
    import jax

    with jax.named_scope("encoder_index"):
        if image_size is not None:
            with jax.named_scope("encoder_index_pre"):
                scale = latent_scaling_of(latent_hw) / image_size
                uv = uv * scale - 1.0
        if scales is not None:
            if index_interp.strip() != "bilinear":
                raise NotImplementedError(
                    "model.latent_int8 serving mode only implements "
                    f"bilinear sampling; conf index_interp={index_interp!r}."
                    " Disable latent_int8 or use index_interp=bilinear."
                )
            from ..ops.grid_sample import grid_sample_nhwc_q8

            return grid_sample_nhwc_q8(
                latent_flat,
                scales,
                uv,
                latent_hw[0],
                latent_hw[1],
                padding_mode=index_padding,
                align_corners=True,
            )
        # small tables: the bilinear combine as a one-hot MXU matmul —
        # XLA's row gather measures ~6x off HBM bandwidth at these table
        # sizes (r3 trace, 256-row YOLO table) while the (N, HW) @ (HW, C)
        # FLOP cost stays below the field MLP's for HW <= ~1024.
        # nan_scrub_ok gates it to callers that scrub NaN latents anyway
        # (the YOLO path, models.py:263): the matmul form zeroes NaN table
        # rows, which would break the torch-exact NaN propagation the
        # gather path guarantees on every other path.
        interp_matmul = (
            nan_scrub_ok
            and latent_hw[0] * latent_hw[1] <= 1024
            and latent_flat.dtype == jnp.bfloat16
            and index_interp.strip() == "bilinear"
        )
        return grid_sample_nhwc(
            latent_flat,
            uv,
            latent_hw[0],
            latent_hw[1],
            # the reference's "nearest " (trailing space) conf value quirk
            # means align_corners stays True; strip so the mode still works
            mode=index_interp.strip(),
            padding_mode=index_padding,
            align_corners=True,
            interp_matmul=interp_matmul,
        )


class ImageEncoder(nn.Module):
    """Global image encoder: pooled resnet vector (+ optional fc head)."""

    backbone: str = "resnet34"
    pretrained: bool = True
    latent_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """:param x (B, H, W, 3) -> (B, latent_size)"""
        feats = ResNetFeatures(
            backbone=self.backbone, num_layers=5, use_first_pool=True,
            name="model",
        )(x, train)
        v = jnp.mean(feats[-1], axis=(1, 2))  # (B, 512) global avg pool
        if self.latent_size != 512:
            v = nn.Dense(self.latent_size, precision="highest", name="fc")(v)
        return v

    @classmethod
    def from_conf(cls, conf) -> "ImageEncoder":
        return cls(
            backbone=conf.get_string("backbone"),
            pretrained=conf.get_bool("pretrained", True),
            latent_size=conf.get_int("latent_size", 128),
        )


def index_global(latent: jnp.ndarray, n_points: int) -> jnp.ndarray:
    """Broadcast a global latent per point (encoder.py:210-216).

    :param latent (B, L) -> (B, n_points, L)
    """
    return jnp.broadcast_to(
        latent[:, None, :], (latent.shape[0], n_points, latent.shape[1])
    )


def make_encoder(conf, dtype: str = "float32") -> Any:
    """Factory parity: /root/reference/src/model/model_util.py:18-26."""
    enc_type = conf.get_string("type", "spatial")
    if enc_type == "spatial":
        return SpatialEncoder.from_conf(conf, dtype=dtype)
    if enc_type == "global":
        return ImageEncoder.from_conf(conf)
    raise NotImplementedError("Unsupported encoder type")
