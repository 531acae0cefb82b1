"""Fully-connected ResNet field MLP with per-block latent injection and
multi-view fusion at a combine layer.

Parity: /root/reference/src/model/resnetfc.py:10-205.
  * ResnetBlockFC: act->fc_0->act->fc_1 (+shortcut); fc_1 zero-initialized
  * latent injected additively (or SPADE-modulated) before blocks
    < combine_layer; at combine_layer the view axis is mean/max-reduced
    via combine_interleaved
  * init: kaiming-normal fan_in, zero bias (torch nn.init semantics)

TPU notes: all compute is dense (N, d) matmuls -> MXU.  ``dtype`` selects
the compute precision policy: float32 (default, bit-parity mode — all
matmuls precision=highest) or bfloat16 (production: params stay f32,
activations/matmul inputs cast to bf16, MXU accumulates in f32 — the
standard TPU mixed-precision recipe).  The final lin_out always runs f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.nn.initializers import variance_scaling, zeros

from ..utils.indexing import combine_interleaved
from .precision import matmul_precision

# torch kaiming_normal_(a=0, mode="fan_in") == untruncated he-normal
kaiming_fan_in = variance_scaling(2.0, "fan_in", "normal")


def _activation(beta: float):
    if beta > 0:
        return lambda x: nn.softplus(beta * x) / beta
    return nn.relu


def dense(features: int, dtype: Any, name: str, use_bias: bool = True,
          kernel_init=kaiming_fan_in):
    """Dense with the framework precision policy: f32 params; bf16 compute
    when dtype=bfloat16 (MXU-native, f32 accumulation via precision)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=zeros,
        dtype=jnp.dtype(dtype),
        param_dtype=jnp.float32,
        precision=matmul_precision(dtype),
        name=name,
    )


def apply_dense(m: nn.Dense, x: jnp.ndarray, int8: bool) -> jnp.ndarray:
    """Apply a Dense module, optionally through the dynamic-int8 MXU path
    (serving mode; see nn/quant.py).  The int8 path binds the module's
    params with a dummy call (DCE'd) and computes manually so the
    checkpoint / weight-port layout stays byte-identical."""
    if not int8:
        return m(x)
    from .quant import dot_w8a8

    m(jnp.zeros((1, x.shape[-1]), x.dtype))  # param binding only
    out = dot_w8a8(x, m.variables["params"]["kernel"])
    if m.use_bias:
        out = out + m.variables["params"]["bias"]
    return out.astype(x.dtype)


class ResnetBlockFC(nn.Module):
    """act -> fc_0 -> act -> fc_1, plus (projected) shortcut.

    fc_1 weight zero-init: a fresh block is the identity (resnetfc.py:39).
    """

    size_out: int | None = None
    size_h: int | None = None
    beta: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, int8: bool = False):
        # profiler annotation parity: resnetfc.py:54
        with jax.named_scope("resblock"):
            return self._block(x, int8)

    def _block(self, x, int8=False):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = _activation(self.beta)

        net = apply_dense(dense(size_h, self.dtype, "fc_0"), act(x), int8)
        dx = apply_dense(
            dense(size_out, self.dtype, "fc_1", kernel_init=zeros),
            act(net), int8,
        )
        if size_in == size_out:
            x_s = x
        else:
            x_s = apply_dense(
                dense(size_out, self.dtype, "shortcut", use_bias=False),
                x, int8,
            )
        return x_s + dx


class ResnetFC(nn.Module):
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, zx: jnp.ndarray, combine_inner_dims=(1,),
                 latent_projected: bool = False, int8: bool = False):
        """:param zx (..., d_latent + d_in) with latent first
        :param combine_inner_dims (NS, B): at combine_layer the tensor is
          reshaped (-1, NS, B, d) and reduced over NS (resnetfc.py:134-174)
        :param latent_projected: the latent portion of zx already holds the
          per-block injections (combine_layer * d_hidden wide, pre-projected
          through the lin_z kernels at the table level — models/pixelnerf.py
          encode); only the lin_z biases are applied here
        :param int8: dynamic W8A8 MXU matmuls for the hidden layers
          (serving only — zero gradient through the rounding; gated on
          not-train by the model, like latent_int8).  lin_out stays f32.
        :return (..., d_out) with the leading dim divided by NS if combined
        """
        # profiler annotation parity: resnetfc.py:141
        with jax.named_scope("resnetfc_infer"):
            return self._infer(zx, combine_inner_dims, latent_projected,
                               int8)

    def _infer(self, zx, combine_inner_dims, latent_projected=False,
               int8=False):
        cl_pre = min(self.combine_layer, self.n_blocks)
        d_lat_eff = (
            cl_pre * self.d_hidden if latent_projected else self.d_latent
        )
        d_in = zx.shape[-1] - d_lat_eff
        compute_dtype = jnp.dtype(self.dtype)
        zx = zx.astype(compute_dtype)
        if d_lat_eff > 0:
            z = zx[..., :d_lat_eff]
            x = zx[..., d_lat_eff:]
        else:
            z = None
            x = zx
        act = _activation(self.beta)

        if d_in > 0:
            x = dense(self.d_hidden, self.dtype, "lin_in")(x)
        else:
            x = jnp.zeros(zx.shape[:-1] + (self.d_hidden,), dtype=compute_dtype)

        # all per-block latent injections in ONE matmul: the gathered
        # latent (the render's widest activation) is read once instead of
        # combine_layer times — the lin_z stage is bytes-bound on TPU
        # (trace r3).  Same params (the per-block Dense modules own them),
        # same math (block-concatenated weights), SPADE keeps per-block.
        cl_eff = cl_pre
        tz_all = None
        # the merged form wins on big render batches (latent read once)
        # but its backward loses on small training batches (the kernel
        # concat adds fixed reassembly cost — measured 39.9 -> 28.8
        # steps/s on the 128-ray flagship train step); row count is
        # static under jit, so gate on it
        n_rows = 1
        for s in zx.shape[:-1]:
            n_rows *= int(s)
        merge = latent_projected or n_rows >= (1 << 17)
        if (
            self.d_latent > 0 and cl_eff > 0 and not self.use_spade
            and merge
        ):
            mods = [
                dense(self.d_hidden, self.dtype, f"lin_z_{b}")
                for b in range(cl_eff)
            ]
            # bind params only (outputs are DCE'd) — keeps the checkpoint
            # / weight-port layout identical to per-block application
            for m in mods:
                m(jnp.zeros((1, self.d_latent), compute_dtype))
            bs = jnp.concatenate(
                [m.variables["params"]["bias"] for m in mods]
            ).astype(compute_dtype)
            if latent_projected:
                # z already holds interp(table @ W) per block; the biases
                # apply once after interpolation (sum of bilinear weights
                # is 1 for in-range points; zeroed/OOB points get exactly
                # lin_z(0) = bias like the per-point form).  tz_all stays
                # the VIEW z — adding bs here would materialize a full
                # (rows, cl*d_hidden) intermediate just to re-read slices
                # of it (r3 yolo trace: 704 ms of bytes-bound loop fusion);
                # the bias folds into the per-block add below instead.
                tz_all = z
            else:
                ks = jnp.concatenate(
                    [m.variables["params"]["kernel"] for m in mods], axis=1
                ).astype(compute_dtype)
                if int8:
                    from .quant import dot_w8a8

                    tz_all = (dot_w8a8(z, ks) + bs).astype(compute_dtype)
                else:
                    tz_all = (
                        jnp.dot(
                            z, ks, precision=matmul_precision(self.dtype)
                        )
                        + bs
                    )

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)

            if self.d_latent > 0 and blkid < self.combine_layer:
                if tz_all is not None:
                    sl = slice(
                        blkid * self.d_hidden, (blkid + 1) * self.d_hidden
                    )
                    tz = tz_all[..., sl]
                    if latent_projected:
                        # deferred bias (see tz_all above): fuses into
                        # this elementwise add instead of a full-width
                        # intermediate
                        tz = tz + bs[sl]
                    x = x + tz
                else:
                    tz = apply_dense(
                        dense(self.d_hidden, self.dtype, f"lin_z_{blkid}"),
                        z, int8,
                    )
                    if self.use_spade:
                        sz = apply_dense(
                            dense(self.d_hidden, self.dtype,
                                  f"scale_z_{blkid}"),
                            z, int8,
                        )
                        x = sz * x + tz
                    else:
                        x = x + tz

            x = ResnetBlockFC(beta=self.beta, dtype=self.dtype,
                              name=f"block_{blkid}")(x, int8)
            # Named residual for selective rematerialization
            # (model.remat_policy = "block"): a save_only_these_names
            # policy keeps ONE (rows, d_hidden) tensor per block live and
            # recomputes only the intra-block fc_0/fc_1 activations in
            # the backward — between full remat (save nothing) and plain
            # backward (save every matmul operand).  No-op without remat.
            x = checkpoint_name(x, "block_out")

        # head in f32 for stable sigmoid/relu/sigma downstream
        return dense(self.d_out, "float32", "lin_out")(
            act(x).astype(jnp.float32)
        )

    @classmethod
    def from_conf(cls, conf, d_in: int, d_latent: int = 0, **kwargs) -> "ResnetFC":
        """Mirror of resnetfc.py:188-205 (d_in kept for interface parity;
        the module infers it from input shape)."""
        if not conf.get_bool("yolo", False):
            d_out = conf.get_int("d_out", 4)
        else:
            d_out = conf.get_int("d_out", 7) * conf.get_int(
                "num_anchors_per_scale", 3
            )
        return cls(
            d_out=d_out,
            n_blocks=conf.get_int("n_blocks", 5),
            d_latent=d_latent,
            d_hidden=conf.get_int("d_hidden", 128),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            use_spade=conf.get_bool("use_spade", False),
            **kwargs,
        )
