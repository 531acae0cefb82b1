"""Pallas TPU kernel: fused ResnetFC field evaluation.

The hot loop of pixelNeRF evaluates a 5-block, 512-wide conditioned MLP at
millions of ray sample points (SURVEY.md §3.1 "HOT LOOP").  Under plain XLA
every Dense writes its (N, 512) activation to HBM — ~15-30 KB of traffic
per point.  This kernel keeps ALL weights (~5-7 MB bf16) and the running
activation resident in VMEM and streams point tiles, reducing traffic to
the input row + output row (~1-2 KB/point), which moves the render from
HBM-bound to MXU-bound.

Split at the multi-view combine layer (resnetfc.py:172-174):
  * fused_pre_combine:  lin_in + [lin_z + ResnetBlock] x combine_layer
      over all (SB*NS*B) rows -> h (rows, H)
  * (XLA) mean over the NS axis
  * fused_post_combine: ResnetBlock x (n_blocks - combine_layer) + lin_out

Gradients: wrapped in jax.custom_vjp whose backward recomputes the forward
with the plain flax module and differentiates that — training keeps exact
XLA gradients; inference/serving gets the fused kernel.

Weight layout: stacked (CL, dL, H) / (CL, H, H) tensors so the kernel takes
a fixed number of refs; the python loop over blocks unrolls at trace time.

STATUS: FROZEN as an opt-in reference implementation
(`model.use_fused_mlp = true`; `auto` selects the XLA path).  Decision
record (r3): the r3 profiler trace shows the plain-XLA field MLP running
at ~93% of its FLOP floor, so the kernel's remaining MXU headroom cannot
repay its (N, 512) latent-input materialization (XLA fuses the gather
into the MLP's first layers instead).  The kernel stays because it is
the only in-tree example of the full Pallas treatment (VMEM-resident
weights, in-kernel PE, custom_vjp) and remains tested for equivalence;
it is not expected to win until Mosaic grows a vector-gather primitive
that would let the latent gather move in-kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024
# scoped-VMEM budget per core; the hard limit is 16 MiB (observed in
# compile errors), kept verbatim because the row model below is already
# conservative against the two measured points:
#   bf16 dL=512  tile=2048 -> 20.75M observed OOM (model: 21.5M, reject)
#   f32  dL=1792 tile=1024 -> 25.00M observed OOM (weights alone 17.4M)
VMEM_BUDGET = 16 * 2**20


def pick_tile(d_in: int, d_latent: int, d_hidden: int, combine_layer: int,
              n_blocks: int, compute_dtype,
              candidates=(1024, 512, 256, 128)) -> int | None:
    """Largest point-tile whose pre_combine kernel fits the VMEM budget,
    or None when even the weights alone don't fit (caller must fall back
    to the XLA path).  Model: resident weights + per-row streaming cost
    (input blocks + f32 intermediates, ~12 bytes/hidden-unit slack)."""
    cl = min(combine_layer, n_blocks)
    cb = jnp.dtype(compute_dtype).itemsize
    H = d_hidden
    weights = cb * (d_in * H + cl * d_latent * H + 2 * cl * H * H)
    weights += 4 * H * (3 * cl + 1)  # f32 biases
    row = cb * (d_in + d_latent + H) + 12 * H
    for tile in candidates:
        if weights + tile * row <= VMEM_BUDGET:
            return tile
    return None


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _pre_combine_kernel(
    zfeat_ref, latent_ref, w_in_ref, b_in_ref, wz_ref, bz_ref,
    w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
):
    cl = wz_ref.shape[0]
    cdt = zfeat_ref.dtype  # residual stream in compute dtype (flax parity)
    x = (
        jnp.dot(zfeat_ref[:], w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    ).astype(cdt)
    z = latent_ref[:]
    for blk in range(cl):
        tz = (
            jnp.dot(z, wz_ref[blk], preferred_element_type=jnp.float32)
            + bz_ref[blk]
        ).astype(cdt)
        x = x + tz
        a = jnp.maximum(x, 0)
        net = (
            jnp.dot(a, w0_ref[blk], preferred_element_type=jnp.float32)
            + b0_ref[blk]
        ).astype(cdt)
        a2 = jnp.maximum(net, 0)
        dx = (
            jnp.dot(a2, w1_ref[blk], preferred_element_type=jnp.float32)
            + b1_ref[blk]
        ).astype(cdt)
        x = x + dx
    out_ref[:] = x.astype(out_ref.dtype)


def _pre_combine_pe_kernel(
    base_ref, latent_ref, pe_m_ref, pe_p_ref, pe_mask_ref, w_in_ref,
    b_in_ref, wz_ref, bz_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
):
    """pre_combine with the positional encoding fused in-kernel.

    zfeat is built as where(mask, sin(base @ M + P), base @ M + P): one tiny
    MXU matmul maps [xyz(3), viewdirs(3)] to the 42-wide PE layout
    (identity cols for include_input + viewdirs, f_i-scaled cols for the
    sin/cos bands), so the (N, 42) z-features never touch HBM.
    """
    cl = wz_ref.shape[0]
    cdt = latent_ref.dtype
    t = (
        jnp.dot(base_ref[:], pe_m_ref[:], preferred_element_type=jnp.float32)
        + pe_p_ref[:]
    )
    zfeat = jnp.where(pe_mask_ref[:] > 0.5, jnp.sin(t), t).astype(cdt)
    x = (
        jnp.dot(zfeat, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    ).astype(cdt)
    z = latent_ref[:]
    for blk in range(cl):
        tz = (
            jnp.dot(z, wz_ref[blk], preferred_element_type=jnp.float32)
            + bz_ref[blk]
        ).astype(cdt)
        x = x + tz
        a = jnp.maximum(x, 0)
        net = (
            jnp.dot(a, w0_ref[blk], preferred_element_type=jnp.float32)
            + b0_ref[blk]
        ).astype(cdt)
        a2 = jnp.maximum(net, 0)
        dx = (
            jnp.dot(a2, w1_ref[blk], preferred_element_type=jnp.float32)
            + b1_ref[blk]
        ).astype(cdt)
        x = x + dx
    out_ref[:] = x.astype(out_ref.dtype)


def _full_pe_kernel(
    base_ref, latent_ref, pe_m_ref, pe_p_ref, pe_mask_ref, w_in_ref,
    b_in_ref, wz_ref, bz_ref, w0_ref, b0_ref, w1_ref, b1_ref,
    w0p_ref, b0p_ref, w1p_ref, b1p_ref, w_out_ref, b_out_ref, out_ref,
):
    """pre_combine (PE fused) + post_combine + lin_out in ONE kernel.

    Valid when NS == 1 (no cross-view mean between the halves): the (N, H)
    hidden state never leaves VMEM, saving its HBM write+read (~4 KB per
    point at H=512 f32) and one kernel-boundary sync.
    """
    cl = wz_ref.shape[0]
    n_post = w0p_ref.shape[0]
    cdt = latent_ref.dtype
    t = (
        jnp.dot(base_ref[:], pe_m_ref[:], preferred_element_type=jnp.float32)
        + pe_p_ref[:]
    )
    zfeat = jnp.where(pe_mask_ref[:] > 0.5, jnp.sin(t), t).astype(cdt)
    x = (
        jnp.dot(zfeat, w_in_ref[:], preferred_element_type=jnp.float32)
        + b_in_ref[:]
    ).astype(cdt)
    z = latent_ref[:]
    for blk in range(cl):
        tz = (
            jnp.dot(z, wz_ref[blk], preferred_element_type=jnp.float32)
            + bz_ref[blk]
        ).astype(cdt)
        x = x + tz
        a = jnp.maximum(x, 0)
        net = (
            jnp.dot(a, w0_ref[blk], preferred_element_type=jnp.float32)
            + b0_ref[blk]
        ).astype(cdt)
        a2 = jnp.maximum(net, 0)
        dx = (
            jnp.dot(a2, w1_ref[blk], preferred_element_type=jnp.float32)
            + b1_ref[blk]
        ).astype(cdt)
        x = x + dx
    for blk in range(n_post):
        a = jnp.maximum(x, 0)
        net = (
            jnp.dot(a, w0p_ref[blk], preferred_element_type=jnp.float32)
            + b0p_ref[blk]
        ).astype(cdt)
        a2 = jnp.maximum(net, 0)
        dx = (
            jnp.dot(a2, w1p_ref[blk], preferred_element_type=jnp.float32)
            + b1p_ref[blk]
        ).astype(cdt)
        x = x + dx
    a = jnp.maximum(x, 0)
    out_ref[:] = (
        jnp.dot(a, w_out_ref[:], preferred_element_type=jnp.float32)
        + b_out_ref[:]
    ).astype(out_ref.dtype)


def pick_tile_full(d_in: int, d_latent: int, d_hidden: int,
                   combine_layer: int, n_blocks: int, compute_dtype,
                   candidates=(1024, 512, 256, 128)):
    """Point-tile for the single full kernel: ALL blocks' weights resident
    (pre with lin_z + post + lin_out) plus the streaming row cost."""
    cl = min(combine_layer, n_blocks)
    cb = jnp.dtype(compute_dtype).itemsize
    H = d_hidden
    weights = cb * (d_in * H + cl * d_latent * H + 2 * n_blocks * H * H)
    weights += 4 * H * (3 * n_blocks + 2)
    row = cb * (d_in + d_latent + H) + 12 * H
    for tile in candidates:
        if weights + tile * row <= VMEM_BUDGET:
            return tile
    return None


def make_pe_matrix(freqs, d_xyz: int = 3, d_vd: int = 3):
    """Mapping (M, P, sin_mask) realizing the reference PE layout
    [x, sin(f1 x), cos(f1 x), ..., viewdirs] (code.py:21-42) as a matmul:
    zfeat = where(mask, sin(base @ M + P), base @ M + P)."""
    F = len(freqs)
    d_in = d_xyz + 2 * F * d_xyz + d_vd
    M = np.zeros((d_xyz + d_vd, d_in), dtype=np.float32)
    P = np.zeros((d_in,), dtype=np.float32)
    mask = np.zeros((d_in,), dtype=np.float32)
    # include_input passthrough
    for j in range(d_xyz):
        M[j, j] = 1.0
    col = d_xyz
    for f in freqs:
        for j in range(d_xyz):  # sin band
            M[j, col + j] = f
            mask[col + j] = 1.0
        col += d_xyz
        for j in range(d_xyz):  # cos band: sin(x + pi/2)
            M[j, col + j] = f
            P[col + j] = np.pi * 0.5
            mask[col + j] = 1.0
        col += d_xyz
    for j in range(d_vd):  # viewdirs passthrough
        M[d_xyz + j, col + j] = 1.0
    return M, P, mask


def _post_combine_kernel(
    h_ref, w0_ref, b0_ref, w1_ref, b1_ref, w_out_ref, b_out_ref, out_ref
):
    n_post = w0_ref.shape[0]
    cdt = h_ref.dtype
    x = h_ref[:]
    for blk in range(n_post):
        a = jnp.maximum(x, 0)
        net = (
            jnp.dot(a, w0_ref[blk], preferred_element_type=jnp.float32)
            + b0_ref[blk]
        ).astype(cdt)
        a2 = jnp.maximum(net, 0)
        dx = (
            jnp.dot(a2, w1_ref[blk], preferred_element_type=jnp.float32)
            + b1_ref[blk]
        ).astype(cdt)
        x = x + dx
    a = jnp.maximum(x, 0)
    out_ref[:] = (
        jnp.dot(a, w_out_ref[:], preferred_element_type=jnp.float32)
        + b_out_ref[:]
    ).astype(out_ref.dtype)


def _full(i):  # whole-array block
    return (0, 0)


def _full3(i):
    return (0, 0, 0)


def _row_block(i):
    return (i, 0)


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return x, n


def fused_pre_combine(zfeat, latent, w_in, b_in, wz, bz, w0, b0, w1, b1,
                      tile: int | None = None):
    """(N, d_in), (N, dL) -> h (N, H) through lin_in + CL latent blocks."""
    compute = latent.dtype
    if tile is None:
        tile = pick_tile(zfeat.shape[1], latent.shape[1], w_in.shape[1],
                         wz.shape[0], wz.shape[0], compute)
        if tile is None:
            raise ValueError(
                "fused_pre_combine does not fit the VMEM budget at "
                f"d_latent={latent.shape[1]} dtype={compute}; gate with "
                "pick_tile() and fall back to the XLA path"
            )
    zfeat = zfeat.astype(compute)
    zfeat_p, n = _pad_rows(zfeat, tile)
    latent_p, _ = _pad_rows(latent, tile)
    H = w_in.shape[1]
    grid = (zfeat_p.shape[0] // tile,)
    out = pl.pallas_call(
        _pre_combine_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, zfeat.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, latent.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_in.shape[0], H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wz.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(bz.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w0.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, _full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, H), _row_block,
                               memory_space=pltpu.VMEM),
        # h leaves in the compute dtype: the in-kernel residual stream is
        # already bf16 in production mode, so a f32 roundtrip would only
        # cost HBM traffic, not precision
        out_shape=jax.ShapeDtypeStruct((zfeat_p.shape[0], H), compute),
        interpret=_interpret(),
    )(zfeat_p, latent_p, w_in, b_in.reshape(1, -1), wz, bz, w0, b0, w1, b1)
    return out[:n]


def fused_pre_combine_pe(base, latent, pe_m, pe_p, pe_mask, w_in, b_in,
                         wz, bz, w0, b0, w1, b1, tile: int | None = None):
    """(N, 6), (N, dL) -> h (N, H); PE computed in-kernel."""
    compute = latent.dtype
    if tile is None:
        tile = pick_tile(pe_m.shape[1], latent.shape[1], w_in.shape[1],
                         wz.shape[0], wz.shape[0], compute)
        if tile is None:
            raise ValueError(
                "fused_pre_combine_pe does not fit the VMEM budget at "
                f"d_latent={latent.shape[1]} dtype={compute}; gate with "
                "pick_tile() and fall back to the XLA path"
            )
    base = base.astype(jnp.float32)
    base_p, n = _pad_rows(base, tile)
    latent_p, _ = _pad_rows(latent, tile)
    H = w_in.shape[1]
    d_in = pe_m.shape[1]
    grid = (base_p.shape[0] // tile,)
    out = pl.pallas_call(
        _pre_combine_pe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, base.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, latent.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pe_m.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wz.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(bz.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w0.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, _full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, H), _row_block,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((base_p.shape[0], H), compute),
        interpret=_interpret(),
    )(
        base_p, latent_p, pe_m, pe_p.reshape(1, -1), pe_mask.reshape(1, -1),
        w_in, b_in.reshape(1, -1), wz, bz, w0, b0, w1, b1,
    )
    return out[:n]


def fused_full_pe(base, latent, pe_m, pe_p, pe_mask, w_in, b_in, wz, bz,
                  w0, b0, w1, b1, w0p, b0p, w1p, b1p, w_out, b_out,
                  tile: int):
    """(N, 6), (N, dL) -> (N, d_out): whole ResnetFC in one kernel (NS=1)."""
    base = base.astype(jnp.float32)
    base_p, n = _pad_rows(base, tile)
    latent_p, _ = _pad_rows(latent, tile)
    H = w_in.shape[1]
    d_in = pe_m.shape[1]
    d_out = w_out.shape[1]
    grid = (base_p.shape[0] // tile,)
    out = pl.pallas_call(
        _full_pe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, base.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, latent.shape[1]), _row_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pe_m.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wz.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(bz.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w0.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w0p.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0p.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1p.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d_out), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), _full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d_out), _row_block,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((base_p.shape[0], d_out),
                                       jnp.float32),
        interpret=_interpret(),
    )(
        base_p, latent_p, pe_m, pe_p.reshape(1, -1), pe_mask.reshape(1, -1),
        w_in, b_in.reshape(1, -1), wz, bz, w0, b0, w1, b1,
        w0p, b0p, w1p, b1p, w_out, b_out.reshape(1, -1),
    )
    return out[:n]


def fused_post_combine(h, w0, b0, w1, b1, w_out, b_out,
                       tile: int = DEFAULT_TILE):
    """(N, H) -> (N, d_out) through post-combine blocks + lin_out."""
    h_p, n = _pad_rows(h, tile)
    H = h.shape[1]
    d_out = w_out.shape[1]
    grid = (h_p.shape[0] // tile,)
    out = pl.pallas_call(
        _post_combine_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, H), _row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec(w0.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b0.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, _full3, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d_out), _full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), _full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d_out), _row_block,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_p.shape[0], d_out), jnp.float32),
        interpret=_interpret(),
    )(h_p, w0, b0, w1, b1, w_out, b_out.reshape(1, -1))
    return out[:n]


def _stack_params(params: dict, n_blocks: int, combine_layer: int,
                  compute_dtype):
    """Flax ResnetFC params -> stacked kernel weight tensors."""
    cl = min(combine_layer, n_blocks)

    def k(name):
        return jnp.asarray(params[name]["kernel"], compute_dtype)

    def b(name):
        return jnp.asarray(params[name]["bias"], jnp.float32)

    def blk_k(i, leaf):
        return jnp.asarray(params[f"block_{i}"][leaf]["kernel"], compute_dtype)

    def blk_b(i, leaf):
        return jnp.asarray(params[f"block_{i}"][leaf]["bias"], jnp.float32)

    w_in, b_in = k("lin_in"), b("lin_in")
    wz = jnp.stack([k(f"lin_z_{i}") for i in range(cl)])
    bz = jnp.stack([b(f"lin_z_{i}") for i in range(cl)])
    w0_pre = jnp.stack([blk_k(i, "fc_0") for i in range(cl)])
    b0_pre = jnp.stack([blk_b(i, "fc_0") for i in range(cl)])
    w1_pre = jnp.stack([blk_k(i, "fc_1") for i in range(cl)])
    b1_pre = jnp.stack([blk_b(i, "fc_1") for i in range(cl)])

    post = range(cl, n_blocks)
    w0_post = jnp.stack([blk_k(i, "fc_0") for i in post])
    b0_post = jnp.stack([blk_b(i, "fc_0") for i in post])
    w1_post = jnp.stack([blk_k(i, "fc_1") for i in post])
    b1_post = jnp.stack([blk_b(i, "fc_1") for i in post])
    w_out, b_out = k("lin_out"), b("lin_out")
    return (w_in, b_in, wz, bz, w0_pre, b0_pre, w1_pre, b1_pre,
            w0_post, b0_post, w1_post, b1_post, w_out, b_out)


def _fused_forward(params, latent, zfeat, n_blocks, combine_layer, ns,
                   inner_b, compute_dtype):
    (w_in, b_in, wz, bz, w0_pre, b0_pre, w1_pre, b1_pre,
     w0_post, b0_post, w1_post, b1_post, w_out, b_out) = _stack_params(
        params, n_blocks, combine_layer, compute_dtype
    )
    h = fused_pre_combine(
        zfeat, latent.astype(compute_dtype), w_in, b_in, wz, bz,
        w0_pre, b0_pre, w1_pre, b1_pre,
    )  # (SB*NS*B, H) f32
    if ns > 1:
        # rows ordered (sb, v, b) — the reference combine_interleaved layout
        H = h.shape[-1]
        h = h.reshape(-1, ns, inner_b, H).mean(axis=1).reshape(-1, H)
    return fused_post_combine(
        h.astype(compute_dtype), w0_post, b0_post, w1_post, b1_post,
        w_out, b_out,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_resnetfc(params, latent, zfeat, n_blocks, combine_layer, ns,
                   inner_b, compute_dtype, xla_fallback):
    """Fused ResnetFC forward with exact-XLA backward.

    :param latent (SB*NS*B, dL), rows ordered (sb, v, b)
    :param zfeat (SB*NS*B, d_in)
    :param inner_b B (rays*samples per scene) for the view mean
    :param xla_fallback callable(params, latent, zfeat) -> out — the plain
      flax forward; its VJP supplies gradients for training
    :return (SB*B, d_out) float32
    """
    return _fused_forward(
        params, latent, zfeat, n_blocks, combine_layer, ns, inner_b,
        compute_dtype,
    )


def _fused_fwd(params, latent, zfeat, n_blocks, combine_layer, ns, inner_b,
               compute_dtype, xla_fallback):
    out = _fused_forward(
        params, latent, zfeat, n_blocks, combine_layer, ns, inner_b,
        compute_dtype,
    )
    return out, (params, latent, zfeat)


def _fused_bwd(n_blocks, combine_layer, ns, inner_b, compute_dtype,
               xla_fallback, residuals, g):
    params, latent, zfeat = residuals
    _, vjp_fn = jax.vjp(xla_fallback, params, latent, zfeat)
    return vjp_fn(g)


fused_resnetfc.defvjp(_fused_fwd, _fused_bwd)


def _fused_pe_forward(params, latent, base, n_blocks, combine_layer, ns,
                      inner_b, compute_dtype, freqs):
    (w_in, b_in, wz, bz, w0_pre, b0_pre, w1_pre, b1_pre,
     w0_post, b0_post, w1_post, b1_post, w_out, b_out) = _stack_params(
        params, n_blocks, combine_layer, compute_dtype
    )
    pe_m, pe_p, pe_mask = (jnp.asarray(a) for a in make_pe_matrix(freqs))
    if ns == 1 and combine_layer < n_blocks:
        # no cross-view mean: run the whole MLP in one kernel so the (N, H)
        # hidden state never round-trips HBM
        tile = pick_tile_full(
            pe_m.shape[1], latent.shape[1], w_in.shape[1], combine_layer,
            n_blocks, compute_dtype,
        )
        if tile is not None:
            return fused_full_pe(
                base, latent.astype(compute_dtype), pe_m, pe_p, pe_mask,
                w_in, b_in, wz, bz, w0_pre, b0_pre, w1_pre, b1_pre,
                w0_post, b0_post, w1_post, b1_post, w_out, b_out, tile,
            )
    h = fused_pre_combine_pe(
        base, latent.astype(compute_dtype), pe_m, pe_p, pe_mask,
        w_in, b_in, wz, bz, w0_pre, b0_pre, w1_pre, b1_pre,
    )
    if ns > 1:
        H = h.shape[-1]
        h = h.reshape(-1, ns, inner_b, H).mean(axis=1).reshape(-1, H)
    return fused_post_combine(
        h.astype(compute_dtype), w0_post, b0_post, w1_post, b1_post,
        w_out, b_out,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_resnetfc_pe(params, latent, base, n_blocks, combine_layer, ns,
                      inner_b, compute_dtype, freqs, xla_fallback):
    """Fused ResnetFC with in-kernel positional encoding.

    :param base (SB*NS*B, 6) = [xyz_cam-rotated(3), viewdirs-rotated(3)]
    :param freqs static tuple of PE frequencies (freq_factor * 2**i)
    :param xla_fallback callable(params, latent, base) -> out (plain flax
      path incl. XLA-side PE) supplying exact training gradients
    """
    return _fused_pe_forward(
        params, latent, base, n_blocks, combine_layer, ns, inner_b,
        compute_dtype, freqs,
    )


def _fused_pe_fwd(params, latent, base, n_blocks, combine_layer, ns, inner_b,
                  compute_dtype, freqs, xla_fallback):
    out = _fused_pe_forward(
        params, latent, base, n_blocks, combine_layer, ns, inner_b,
        compute_dtype, freqs,
    )
    return out, (params, latent, base)


def _fused_pe_bwd(n_blocks, combine_layer, ns, inner_b, compute_dtype, freqs,
                  xla_fallback, residuals, g):
    params, latent, base = residuals
    _, vjp_fn = jax.vjp(xla_fallback, params, latent, base)
    return vjp_fn(g)


fused_resnetfc_pe.defvjp(_fused_pe_fwd, _fused_pe_bwd)
