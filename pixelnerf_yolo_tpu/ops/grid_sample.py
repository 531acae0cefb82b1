"""Bilinear grid sampling with exact torch.nn.functional.grid_sample semantics.

This is the pixel-aligned feature lookup at the heart of pixelNeRF: the
reference calls ``F.grid_sample(latent, uv, align_corners=True,
mode=index_interp, padding_mode=index_padding)``
(/root/reference/src/model/encoder.py:100-108).  The north-star requires
fp32 parity with that op, so the coordinate transforms below mirror torch's
GridSampler exactly for ``align_corners`` True/False and padding modes
``zeros | border | reflection``.

TPU layout: the perf path is :func:`grid_sample_nhwc` — features live as
(B, H*W, C) so each of the 4 corner lookups is a *row* gather (contiguous
lanes over C), which XLA lowers to an efficient dynamic-gather; the corner
interpolation fuses into the surrounding computation.  :func:`grid_sample`
is the NCHW torch-parity wrapper.  A Pallas variant can fold this into the
raymarch kernel later; semantics here are the contract it must match.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1, 1] -> pixel coordinates, torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord, low: float, high: float):
    """Reflect coordinates into [low, high] (torch reflect_coordinates)."""
    span = high - low
    if span <= 0:
        return jnp.zeros_like(coord)
    coord = jnp.abs(coord - low) % (2 * span)
    return low + jnp.where(coord > span, 2 * span - coord, coord)


def _torch_clip(coord, size: int):
    """torch clip_coordinates, empirically (torch CPU): +inf -> size-1,
    -inf -> 0, NaN -> 0.  (Reflection maps +-inf to NaN via fmod before
    this clip, so reflected non-finites all land on 0.)"""
    clipped = jnp.clip(coord, 0, size - 1)
    return jnp.where(jnp.isnan(coord), 0.0, clipped)


def _apply_padding(coord, size: int, padding_mode: str, align_corners: bool):
    if padding_mode == "border":
        return _torch_clip(coord, size)
    if padding_mode == "reflection":
        if align_corners:
            coord = _reflect(coord, 0.0, float(size - 1))
        else:
            coord = _reflect(coord, -0.5, size - 0.5)
        return _torch_clip(coord, size)
    return coord  # zeros: OOB/non-finite handled by per-corner masking


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "mode", "padding_mode", "align_corners",
        "interp_matmul",
    ),
)
def grid_sample_nhwc(
    flat: jnp.ndarray,
    grid: jnp.ndarray,
    height: int,
    width: int,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    interp_matmul: bool = False,
) -> jnp.ndarray:
    """Sample row-major flattened features at normalized grid locations.

    :param flat (B, H*W, C) feature rows
    :param grid (B, N, 2) in [-1, 1], last dim (x, y)
    :param interp_matmul: compute the bilinear combine as a one-hot matmul
      (B, N, HW) @ (B, HW, C) on the MXU instead of 4 row gathers — wins
      when the table is SMALL (the r3 trace measured XLA's row gather at
      ~6x off HBM bandwidth for a 256-row table, and the 4 corner outputs
      + combine all materialize); FLOP cost scales with HW, so callers
      gate on HW (see models/encoder.index_latent).  NaN table values
      poison every output through the 0-weight dot terms — callers on NaN
      -scrubbing paths must scrub the TABLE instead (models.py:263
      semantics shift documented at the call site).
    :return (B, N, C)
    """
    H, W = height, width
    gx = _unnormalize(grid[..., 0], W, align_corners)
    gy = _unnormalize(grid[..., 1], H, align_corners)
    # Non-finite coordinate semantics follow torch exactly (verified vs
    # torch CPU): zeros padding propagates NaN into the output (hence the
    # reference's YOLO NaN-latent scrub, models.py:263); border/reflection
    # clip NaN/+inf to the far border and -inf to 0 via _torch_clip.
    gx = _apply_padding(gx, W, padding_mode, align_corners)
    gy = _apply_padding(gy, H, padding_mode, align_corners)

    compute_dtype = flat.dtype

    def gather(ix, iy, valid):
        idx = (iy * W + ix).astype(jnp.int32)  # (B, N)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, C)
        return vals * valid[..., None]

    if mode == "nearest":
        ix = jnp.round(gx)
        iy = jnp.round(gy)
        valid = (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ).astype(compute_dtype)
        ix = jnp.where(jnp.isfinite(ix), ix, 0.0)
        iy = jnp.where(jnp.isfinite(iy), iy, 0.0)
        return gather(jnp.clip(ix, 0, W - 1), jnp.clip(iy, 0, H - 1), valid)

    if mode != "bilinear":
        raise NotImplementedError(f"grid_sample mode {mode!r}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    corners = (
        (x0, y0, wx0, wy0),
        (x1, y0, wx1, wy0),
        (x0, y1, wx0, wy1),
        (x1, y1, wx1, wy1),
    )

    if interp_matmul:
        # NaN table values would poison every output through 0-weight dot
        # terms; scrub them up front (the YOLO path scrubs NaN latents
        # anyway, models.py:263 — granularity divergence documented above)
        flat = jnp.where(jnp.isnan(flat), jnp.zeros_like(flat), flat)
        iota = jnp.arange(H * W, dtype=jnp.int32)
        acc = None
        for ix, iy, wx, wy in corners:
            valid = (
                (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            ).astype(compute_dtype)
            w = (wx * wy).astype(compute_dtype) * valid
            ixc = jnp.clip(jnp.where(jnp.isfinite(ix), ix, 0.0), 0, W - 1)
            iyc = jnp.clip(jnp.where(jnp.isfinite(iy), iy, 0.0), 0, H - 1)
            idx = (iyc * W + ixc).astype(jnp.int32)
            term = w[..., None] * (idx[..., None] == iota).astype(
                compute_dtype
            )
            acc = term if acc is None else acc + term
        return jnp.einsum("bnr,brc->bnc", acc, flat)

    def corner(ix, iy, wx, wy):
        valid = (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ).astype(compute_dtype)
        w = (wx * wy).astype(compute_dtype)
        ixc = jnp.clip(jnp.where(jnp.isfinite(ix), ix, 0.0), 0, W - 1)
        iyc = jnp.clip(jnp.where(jnp.isfinite(iy), iy, 0.0), 0, H - 1)
        return gather(ixc, iyc, valid) * w[..., None]

    return (
        corner(*corners[0])
        + corner(*corners[1])
        + corner(*corners[2])
        + corner(*corners[3])
    )


@partial(
    jax.jit,
    static_argnames=("height", "width", "padding_mode", "align_corners"),
)
def grid_sample_nhwc_q8(
    flat_q: jnp.ndarray,
    scales: jnp.ndarray,
    grid: jnp.ndarray,
    height: int,
    width: int,
    padding_mode: str = "zeros",
    align_corners: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Bilinear sample from a per-channel int8-quantized feature table.

    The serving-mode gather: rows are int8 (half the HBM traffic of bf16;
    the gather is bytes-bound on TPU), corners combine in ``out_dtype``,
    and the per-channel dequant scale applies once AFTER the combine
    (bilinear is linear, so scale-after == scale-before exactly).

    :param flat_q (B, H*W, C) int8; scales (C,) float32
    :param grid (B, N, 2) in [-1, 1]
    :return (B, N, C) out_dtype
    """
    H, W = height, width
    gx = _unnormalize(grid[..., 0], W, align_corners)
    gy = _unnormalize(grid[..., 1], H, align_corners)
    gx = _apply_padding(gx, W, padding_mode, align_corners)
    gy = _apply_padding(gy, H, padding_mode, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(ix, iy, wx, wy):
        valid = (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ).astype(out_dtype)
        w = (wx * wy).astype(out_dtype)
        ixc = jnp.clip(jnp.where(jnp.isfinite(ix), ix, 0.0), 0, W - 1)
        iyc = jnp.clip(jnp.where(jnp.isfinite(iy), iy, 0.0), 0, H - 1)
        idx = (iyc * W + ixc).astype(jnp.int32)
        vals = jnp.take_along_axis(flat_q, idx[..., None], axis=1)
        return vals.astype(out_dtype) * valid[..., None] * w[..., None]

    acc = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return acc * scales.astype(out_dtype)[None, None, :]


def quantize_rows_int8(flat: jnp.ndarray):
    """(B, R, C) -> per-channel symmetric int8: (values int8, scales (C,))."""
    absmax = jnp.max(jnp.abs(flat.astype(jnp.float32)), axis=(0, 1))
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(
        jnp.round(flat.astype(jnp.float32) / scales[None, None, :]),
        -127, 127,
    ).astype(jnp.int8)
    return q, scales


def grid_sample(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """NCHW torch-parity wrapper.

    :param input (B, C, H, W)
    :param grid (B, N, 2) in [-1, 1], last dim is (x, y)
    :return (B, C, N)

    (The reference passes (B, N, 1, 2) to torch and squeezes; we take the
    point list directly.)
    """
    B, C, H, W = input.shape
    flat = input.reshape(B, C, H * W).transpose(0, 2, 1)  # (B, HW, C)
    out = grid_sample_nhwc(
        flat,
        grid,
        H,
        W,
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return out.transpose(0, 2, 1)  # (B, C, N)
