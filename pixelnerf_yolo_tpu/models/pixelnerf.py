"""PixelNeRF: image-conditioned radiance/detection field (functional).

Parity: /root/reference/src/model/models.py:15-318.  The torch version is
stateful (encode() stores poses/focal/latent on the module); here encoding
returns an immutable :class:`CondState` pytree and the field is a pure
function of (params, cond, points) — the natural jit/shard_map shape.

Mode quirks reproduced deliberately (SURVEY.md §7):
  * NeRF: world->cam built as [R^T, -R^T t] from c2w poses; fy negated
    (models.py:116-118,136-137); uv = (-x/z, -y/z)
  * YOLO: poses used as-is (already extrinsics); uv = (+x/z, +y/z);
    latents zeroed where cam-z >= 0 and where NaN (models.py:119-120,
    219-264)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..nn.code import PositionalEncoding
from ..nn.mlp import ImplicitNet
from ..nn.precision import matmul_precision
from ..nn.resnetfc import ResnetFC
from ..utils.indexing import repeat_interleave
from .encoder import (
    ImageEncoder,
    SpatialEncoder,
    index_global,
    index_latent,
    latent_scaling_of,
    make_encoder,
)


def _resolve_remat_policy(name: str):
    """Map model.remat_policy to a jax.checkpoint saveable-policy.

    None (the jax default) = save nothing = full rematerialization.
    "block" saves the checkpoint_name'd per-block outputs of ResnetFC
    (nn/resnetfc.py) — the middle ground between full remat and plain
    backward.  "dots" saves every dot output (memory ~= plain).
    """
    if name in ("", "full"):
        return None
    if name == "block":
        return jax.checkpoint_policies.save_only_these_names("block_out")
    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    raise ValueError(
        f"Unknown model.remat_policy {name!r} (expected '', 'full', "
        "'block' or 'dots')"
    )


def make_mlp(conf, d_in: int, d_latent: int = 0, allow_empty: bool = False,
             dtype: str = "float32"):
    """Factory parity: /root/reference/src/model/model_util.py:5-15."""
    mlp_type = conf.get_string("type", "mlp")
    if mlp_type == "mlp":
        return ImplicitNet.from_conf(conf, d_in + d_latent, d_latent=d_latent)
    if mlp_type == "resnet":
        return ResnetFC.from_conf(conf, d_in, d_latent=d_latent, dtype=dtype)
    if mlp_type == "empty" and allow_empty:
        return None
    raise NotImplementedError("Unsupported MLP type")


@flax.struct.dataclass
class CondState:
    """Everything encode() produces that forward() consumes."""

    latent_flat: jnp.ndarray  # (SB*NS, Hl*Wl, C)
    latent_hw: tuple[int, int] = flax.struct.field(pytree_node=False)
    poses: jnp.ndarray  # (SB*NS, 3, 4) world->camera
    focal: jnp.ndarray  # (F, 2), F in {1, SB*?}
    c: jnp.ndarray  # (F, 2)
    image_size: jnp.ndarray  # (2,) = (W, H) of encoder input images
    num_views_per_obj: int = flax.struct.field(pytree_node=False)
    global_latent: Optional[jnp.ndarray] = None  # (SB*NS, Lg)
    # serving mode: latent_flat is int8 and these are its per-channel
    # dequant scales (model.latent_int8 = True, eval only)
    latent_scales: Optional[jnp.ndarray] = None  # (C,)
    # bf16 single-MLP mode: latent_flat holds the TABLE pre-projected
    # through the mlp's lin_z weights (C = combine_layer * d_hidden);
    # bilinear interp commutes with the linear projection, so gathering
    # from the projected table + adding the lin_z biases afterwards is
    # exact — see PixelNeRF.encode
    latent_projected: bool = flax.struct.field(
        pytree_node=False, default=False
    )
    # serving mode: hidden field-MLP matmuls run dynamic W8A8 on the MXU
    # (model.mlp_int8 = True, eval only — nn/quant.py)
    mlp_int8: bool = flax.struct.field(pytree_node=False, default=False)


class PixelNeRF:
    """Config-driven model: owns the flax modules + pure encode/field fns.

    Usage:
      model = PixelNeRF.from_conf(conf["model"])
      variables = model.init(rng, sample_images)
      cond = model.encode(variables, images, poses, focal, c=c)
      out = model.forward(variables, cond, xyz, viewdirs=dirs, coarse=True)
    """

    def __init__(self, conf, stop_encoder_grad: bool = False):
        self.conf = conf
        # precision policy: float32 = reference-parity mode (all matmuls
        # precision=highest); bfloat16 = production TPU mode (f32 params,
        # bf16 compute, f32 MXU accumulation)
        self.compute_dtype = conf.get_string("compute_dtype", "float32")
        self.encoder: SpatialEncoder = make_encoder(
            conf.get_config("encoder"), dtype=self.compute_dtype
        )
        self.use_encoder = conf.get_bool("use_encoder", True)
        self.use_xyz = conf.get_bool("use_xyz", False)
        # model.remat = True: rematerialize the field under AD —
        # activations of the conditioned MLP (the widest tensors of a
        # training step, ~rays x samples x d_hidden per block) are
        # recomputed in the backward pass instead of stored, trading ~1/3
        # more field FLOPs for O(blocks) less live memory.  The standard
        # TPU lever for training with much larger ray batches per chip.
        self.remat = conf.get_bool("remat", False)
        # model.remat_policy selects WHAT the checkpointed field saves:
        #   ""/"full"  — save nothing, recompute everything (max memory
        #                savings, ~+1/3 field FLOPs in backward)
        #   "block"    — save one (rows, d_hidden) tensor per ResnetFC
        #                block (the checkpoint_name'd block outputs) and
        #                recompute only intra-block activations: most of
        #                full remat's memory win at a fraction of its
        #                recompute cost
        #   "dots"     — save every matmul output (XLA-side
        #                dots_saveable); memory ~= plain backward, kept
        #                for A/B measurement
        self.remat_policy = conf.get_string("remat_policy", "")
        # model.remat_gather = True (requires remat): re-gather the
        # pixel-aligned latents inside the checkpointed field instead of
        # saving them as checkpoint inputs.  The per-chunk saved residual
        # shrinks from (N_samples, NS*C) gathered latents — the term that
        # OOMs the 65k-ray NeRF remat point (~21 GB across chunks) — to
        # the (N_samples, 3) points; the backward re-runs the gather
        # (bytes-bound, ~15% of a render pass).  Side effect: the
        # renderer's coarse->fine latent-reuse input is ignored (XLA DCEs
        # the dead renderer-side gathers), so the forward re-gathers the
        # union's coarse samples too — train-only lever, leave off for
        # serving.
        self.remat_gather = conf.get_bool("remat_gather", False)
        if self.remat_gather and not self.remat:
            # the re-gather only exists inside the checkpointed field —
            # without remat the flag is silently inert, so fail loudly
            raise ValueError(
                "model.remat_gather requires model.remat = true "
                "(it moves the latent gather inside the checkpoint; "
                "there is no checkpoint without remat)"
            )
        assert self.use_encoder or self.use_xyz
        self.normalize_z = conf.get_bool("normalize_z", True)
        self.stop_encoder_grad = stop_encoder_grad
        self.use_code = conf.get_bool("use_code", False)
        self.use_code_viewdirs = conf.get_bool("use_code_viewdirs", True)
        self.use_viewdirs = conf.get_bool("use_viewdirs", False)
        self.use_global_encoder = conf.get_bool("use_global_encoder", False)

        d_latent = self.encoder.latent_size if self.use_encoder else 0
        d_in = 3 if self.use_xyz else 1
        if self.use_viewdirs and self.use_code_viewdirs:
            d_in += 3
        self.code = None
        if self.use_code and d_in > 0:
            self.code = PositionalEncoding.from_conf(
                conf.get_config("code"), d_in=d_in
            )
            d_in = self.code.d_out
        if self.use_viewdirs and not self.use_code_viewdirs:
            d_in += 3

        self.global_encoder = None
        if self.use_global_encoder:
            self.global_encoder = ImageEncoder.from_conf(
                conf.get_config("global_encoder")
            )
            d_latent += self.global_encoder.latent_size

        self.latent_size = self.encoder.latent_size
        self.mlp_coarse = make_mlp(
            conf.get_config("mlp_coarse"), d_in, d_latent,
            dtype=self.compute_dtype,
        )
        self.mlp_fine = make_mlp(
            conf.get_config("mlp_fine"), d_in, d_latent, allow_empty=True,
            dtype=self.compute_dtype,
        )
        self.yolo = conf.get_bool("mlp_coarse.yolo", False)
        # fused Pallas MLP: true | false | auto.  auto = OFF since the
        # bf16 matmul-precision fix: plain XLA fuses the latent gather
        # into the field MLP (no kernel-input materialization) and now
        # beats or ties the Pallas kernel on every measured config
        # (PERF.md "fused vs XLA"); the kernel remains opt-in.
        self.use_fused_mlp = conf.get("use_fused_mlp", "auto")
        # serving mode: per-channel int8 latent table (halves the
        # bytes-bound gather traffic; ~quantization-level approximation).
        # Inference only — encode(train=True) keeps the exact path.
        self.latent_int8 = conf.get_bool("latent_int8", False)
        # serving mode: dynamic W8A8 int8 matmuls for the field MLP's
        # hidden layers (~quantization-level approximation, lin_out stays
        # f32).  Inference only — the rounding has zero gradient, so
        # encode(train=True) disables it exactly like latent_int8.
        # Chip-measured SLOWER than bf16 on this stack (PERF.md r4
        # rejected levers); kept as a measurable option.
        self.mlp_int8 = conf.get_bool("mlp_int8", False)
        if self.mlp_int8 and not (
            isinstance(self.mlp_coarse, ResnetFC)
            and (self.mlp_fine is None or isinstance(self.mlp_fine,
                                                     ResnetFC))
        ):
            # only the ResnetFC forward accepts int8=; fail at
            # construction instead of a TypeError at first render
            raise ValueError(
                "model.mlp_int8 requires ResnetFC MLPs "
                "(mlp_coarse/mlp_fine type 'resnet')"
            )
        # lin_z table pre-projection: the latent is consumed ONLY by the
        # per-block lin_z injections (resnetfc.py:176-182), and bilinear
        # interpolation commutes with linear maps — so in bf16 production
        # mode with a single MLP the (HW, dL) latent TABLE is projected
        # through the concatenated lin_z weights once at encode time and
        # the per-point gather fetches (cl*H)-wide injections directly.
        # For the 1792-d YOLO backbone this narrows the bytes-bound gather
        # (1792 -> cl*H = 1536) AND removes the dominant per-point
        # (N, 1792) @ (1792, 1536) injection matmul.  Restricted to
        # mlp_fine=None because coarse/fine MLPs have different lin_z
        # weights (the NeRF coarse+fine path reuses raw latents instead).
        self.preproject = bool(
            jnp.dtype(self.compute_dtype) == jnp.bfloat16
            and self.use_encoder
            and self.mlp_fine is None
            and isinstance(self.mlp_coarse, ResnetFC)
            and self.mlp_coarse.d_latent > 0
            and min(self.mlp_coarse.combine_layer, self.mlp_coarse.n_blocks)
            > 0
            and not self.mlp_coarse.use_spade
            and not self.latent_int8
            and not self.use_global_encoder
            # the Pallas fused-MLP kernels take the raw latent
            and str(self.use_fused_mlp).lower()
            not in ("true", "1", "yes", "on")
            and conf.get_bool("latent_preproject", True)
        )
        self.d_in = d_in
        if not self.yolo:
            self.d_out = conf.get_int("mlp_coarse.d_out", 4)
        else:
            self.d_out = conf.get_int("mlp_coarse.d_out", 7) * conf.get_int(
                "mlp_coarse.num_anchors_per_scale", 3
            )
        self.d_latent = d_latent

    @classmethod
    def from_conf(cls, conf, stop_encoder_grad: bool = False) -> "PixelNeRF":
        return cls(conf, stop_encoder_grad=stop_encoder_grad)

    # -- initialization ------------------------------------------------------

    def init(self, rng: jax.Array, sample_images: jnp.ndarray,
             load_pretrained: bool = True) -> dict:
        """Initialize all parameter collections.

        When ``encoder.pretrained`` is set (the reference loads torchvision
        ImageNet weights, encoder.py:60-66), the backbone init is grafted
        from the ported checkpoint cache — see nn/pretrained.py.  Callers
        that immediately overwrite the init with a trained checkpoint (eval
        scripts, --resume) pass load_pretrained=False.

        :param sample_images (NS, 3, H, W) in [-1, 1] (CHW, dataset layout)
        """
        r_enc, r_genc, r_coarse, r_fine = jax.random.split(rng, 4)
        x = jnp.transpose(sample_images, (0, 2, 3, 1))
        variables: dict = {"params": {}, "batch_stats": {}}

        enc_vars = self.encoder.init(r_enc, x)
        variables["params"]["encoder"] = enc_vars["params"]
        variables["batch_stats"]["encoder"] = enc_vars.get("batch_stats", {})
        if load_pretrained:
            self._maybe_load_pretrained(variables, "encoder", self.encoder)

        if self.global_encoder is not None:
            g_vars = self.global_encoder.init(r_genc, x)
            variables["params"]["global_encoder"] = g_vars["params"]
            variables["batch_stats"]["global_encoder"] = g_vars.get(
                "batch_stats", {}
            )
            if load_pretrained:
                self._maybe_load_pretrained(
                    variables, "global_encoder", self.global_encoder
                )

        zx = jnp.zeros((2, self.d_latent + self.d_in))
        variables["params"]["mlp_coarse"] = self.mlp_coarse.init(r_coarse, zx)[
            "params"
        ]
        if self.mlp_fine is not None:
            variables["params"]["mlp_fine"] = self.mlp_fine.init(r_fine, zx)[
                "params"
            ]
        return variables

    def _maybe_load_pretrained(self, variables: dict, key: str, encoder):
        """Graft ported torchvision ImageNet weights over the random init
        when the conf asks for pretrained (encoder.py:60-66 parity).

        Missing weights warn + fall back to random init (logged) so the
        canonical train commands work out of the box on machines without
        the ported npz; set PNY_PRETRAINED_STRICT=1 to raise instead
        (for runs where silent random init would waste a convergence
        experiment)."""
        import os
        import warnings

        if not getattr(encoder, "pretrained", False):
            return
        backbone = getattr(encoder, "backbone", "")
        if not backbone.startswith("resnet"):
            print(
                f"{key} init: random (no pretrained source for backbone "
                f"{backbone!r}; the reference's external yolov7.pt has no "
                "correspondence to the built-in ELAN backbone)"
            )
            return
        from ..nn.pretrained import graft, load_pretrained_backbone

        try:
            ported, path = load_pretrained_backbone(backbone)
        except FileNotFoundError as e:
            if os.environ.get("PNY_PRETRAINED_STRICT"):
                raise
            warnings.warn(
                f"{e}\nProceeding with RANDOM encoder init "
                "(encoder.pretrained=True requested; run "
                "scripts/port_torchvision.py to ship the npz, or set "
                "PNY_PRETRAINED_STRICT=1 to make this an error)."
            )
            print(f"{key} init: random (pretrained weights not found)")
            return
        p, n_p = graft(
            variables["params"][key]["model"], ported["params"]
        )
        s, n_s = graft(
            variables["batch_stats"][key]["model"], ported["batch_stats"]
        )
        variables["params"][key]["model"] = p
        variables["batch_stats"][key]["model"] = s
        print(
            f"{key} init: ported torchvision ImageNet {backbone} from "
            f"{path} ({n_p} param + {n_s} stat tensors)"
        )

    # -- encoding ------------------------------------------------------------

    def encode(
        self,
        variables: dict,
        images: jnp.ndarray,
        poses: jnp.ndarray,
        focal: jnp.ndarray,
        z_bounds=None,
        c: jnp.ndarray | None = None,
        train: bool = False,
    ):
        """Encode source views into a CondState.

        :param images (NS, 3, H, W) or (SB, NS, 3, H, W), values [-1, 1]
        :param poses (NS, 4, 4) or (SB, NS, 4, 4) — camera-to-world in NeRF
          mode, world-to-camera extrinsics in YOLO mode (models.py:115-120)
        :param focal () or (2,) or (SB, 2)
        :param c None or (2,) or (SB, 2)
        :return CondState, or (CondState, mutated_batch_stats) when train
        """
        if images.ndim == 5:
            num_views_per_obj = images.shape[1]
            images = images.reshape((-1,) + images.shape[2:])
            poses = poses.reshape(-1, 4, 4)
        else:
            num_views_per_obj = 1

        x = jnp.transpose(images, (0, 2, 3, 1))  # NHWC
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"].get("encoder", {}),
        }
        mutated = None
        if train:
            latent, mut = self.encoder.apply(
                enc_vars, x, train=True, mutable=["batch_stats"]
            )
            mutated = {"encoder": mut["batch_stats"]}
        else:
            latent = self.encoder.apply(enc_vars, x, train=False)
        B, Hl, Wl, C = latent.shape
        latent_flat = latent.reshape(B, Hl * Wl, C).astype(
            jnp.dtype(self.compute_dtype)
        )
        latent_scales = None
        if self.latent_int8 and not train:
            from ..ops.grid_sample import quantize_rows_int8

            latent_flat, latent_scales = quantize_rows_int8(latent_flat)

        latent_projected = False
        if self.preproject and latent_scales is None:
            mlp = self.mlp_coarse
            cl = min(mlp.combine_layer, mlp.n_blocks)
            p = variables["params"]["mlp_coarse"]
            w_cat = jnp.concatenate(
                [p[f"lin_z_{i}"]["kernel"] for i in range(cl)], axis=1
            )  # (dL, cl*H)
            lat = latent_flat
            if self.stop_encoder_grad:
                # same semantics as stopping the gathered latent: lin_z
                # weight grads still flow (through the table values)
                lat = jax.lax.stop_gradient(lat)
            cdt = jnp.dtype(self.compute_dtype)
            latent_flat = jnp.einsum(
                "brc,ch->brh", lat.astype(cdt), w_cat.astype(cdt),
                precision=matmul_precision(self.compute_dtype),
            )
            latent_projected = True

        if not self.yolo:
            rot = jnp.swapaxes(poses[:, :3, :3], 1, 2)  # R^T
            trans = -jnp.einsum(
                "bij,bj->bi", rot, poses[:, :3, 3], precision="highest"
            )
            w2c = jnp.concatenate([rot, trans[..., None]], axis=-1)
        else:
            w2c = poses[:, :3, :4]

        # image_shape = (W, H)  (models.py:122-123)
        image_size = jnp.asarray(
            [images.shape[-1], images.shape[-2]], dtype=jnp.float32
        )

        focal = jnp.asarray(focal, dtype=jnp.float32)
        if focal.ndim == 0:
            focal = jnp.broadcast_to(focal[None, None], (1, 2))
        elif focal.ndim == 1:
            focal = jnp.broadcast_to(focal[:, None], (focal.shape[0], 2))
        if not self.yolo:
            focal = focal * jnp.asarray([1.0, -1.0], dtype=jnp.float32)

        if c is None:
            c = (image_size * 0.5)[None]
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
            if c.ndim == 0:
                c = jnp.broadcast_to(c[None, None], (1, 2))
            elif c.ndim == 1:
                c = c[None] if c.shape[0] == 2 else jnp.broadcast_to(
                    c[:, None], (c.shape[0], 2)
                )

        global_latent = None
        if self.global_encoder is not None:
            g_vars = {
                "params": variables["params"]["global_encoder"],
                "batch_stats": variables["batch_stats"].get(
                    "global_encoder", {}
                ),
            }
            if train:
                global_latent, g_mut = self.global_encoder.apply(
                    g_vars, x, train=True, mutable=["batch_stats"]
                )
                mutated["global_encoder"] = g_mut["batch_stats"]
            else:
                global_latent = self.global_encoder.apply(g_vars, x, train=False)

        cond = CondState(
            latent_flat=latent_flat,
            latent_hw=(Hl, Wl),
            poses=w2c,
            focal=focal,
            c=c,
            image_size=image_size,
            num_views_per_obj=num_views_per_obj,
            global_latent=global_latent,
            latent_scales=latent_scales,
            latent_projected=latent_projected,
            mlp_int8=self.mlp_int8 and not train,
        )
        if train:
            return cond, mutated
        return cond

    # -- the field -----------------------------------------------------------

    def _can_fuse(self, mlp, ns: int) -> bool:
        """Whether the Pallas fused-MLP path applies (semantics identical to
        the flax path; gradients fall back to XLA via custom_vjp)."""
        enabled = self.use_fused_mlp
        if enabled == "auto":
            enabled = False  # measured: XLA path >= kernel on all configs
        elif isinstance(enabled, str):
            enabled = enabled.lower() in ("true", "1", "yes", "on")
        ok = bool(
            enabled
            and not self.mlp_int8  # fused kernel has no int8 path
            and isinstance(mlp, ResnetFC)
            and mlp.beta == 0
            and not mlp.use_spade
            and mlp.combine_type == "average"
            and mlp.d_latent > 0
            and self.use_encoder
            and self.d_in > 0
            and self.global_encoder is None
            and (ns == 1 or mlp.combine_layer < mlp.n_blocks)
        )
        if not ok:
            return False
        # VMEM feasibility: wide latents (e.g. the 1792-d YOLO backbone) in
        # f32 exceed the 16 MiB scoped budget at any tile — fall back to XLA
        from ..ops.pallas.fused_mlp import pick_tile

        return (
            pick_tile(
                self.d_in, mlp.d_latent, mlp.d_hidden, mlp.combine_layer,
                mlp.n_blocks, jnp.dtype(self.compute_dtype),
            )
            is not None
        )

    def _pe_fusible(self) -> bool:
        """Whether the positional encoding can be computed inside the Pallas
        kernel (the flagship flag combination: xyz z-feature, PE without
        viewdirs in the code, viewdirs appended)."""
        return bool(
            self.use_xyz
            and self.normalize_z
            and self.use_code
            and not self.use_code_viewdirs
            and self.use_viewdirs
            and self.code is not None
            and self.code.include_input
            and self.code.num_freqs > 0
        )

    def forward(
        self,
        variables: dict,
        cond: CondState,
        xyz: jnp.ndarray,
        coarse: bool = True,
        viewdirs: jnp.ndarray | None = None,
        latent: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Evaluate the conditioned field at world points.

        :param xyz (SB, B, 3); viewdirs (SB, B, 3) if use_viewdirs
        :param latent optional precomputed project_latent(xyz) result
          (renderer fine-pass reuse); must correspond to these xyz
        :return (SB, B, d_out) — NeRF: [sigmoid rgb, relu sigma]; YOLO: raw
        Parity: models.py:153-318.  Wrapped in jax.named_scope
        "model_inference" (the reference's profiler scope, models.py:163);
        shows up in jax.profiler / xprof traces.
        """
        with jax.named_scope("model_inference"):
            if not self.remat:
                return self._forward_impl(
                    variables, cond, xyz, coarse=coarse, viewdirs=viewdirs,
                    latent=latent,
                )

            # model.remat: recompute the field in the backward pass
            # instead of storing its activations (see __init__)
            if self.remat_gather:
                # ignore the renderer-precomputed latents so the gather
                # runs INSIDE the checkpoint: the saved residual is the
                # (N, 3) points, not the (N, NS*C) latents (see __init__)
                latent = None

            def _field(variables, cond, xyz, viewdirs, latent):
                return self._forward_impl(
                    variables, cond, xyz, coarse=coarse, viewdirs=viewdirs,
                    latent=latent,
                )

            return jax.checkpoint(
                _field, policy=_resolve_remat_policy(self.remat_policy)
            )(variables, cond, xyz, viewdirs, latent)

    def project_latent(
        self,
        variables: dict,
        cond: CondState,
        xyz: jnp.ndarray,
    ) -> jnp.ndarray | None:
        """Per-point conditioning: project xyz into each source camera and
        sample the pixel-aligned latent (models.py:168-264).

        :param xyz (SB, B, 3) world points
        :return (SB*NS, B, C) latents (stop-grad / YOLO-zeroing applied),
          or None when the model has no spatial encoder

        Exposed separately from the field so renderers can reuse latents
        for fine samples that coincide with coarse ones (the z-union
        contains all coarse z's, render/nerf.py) — the gather is the
        bytes-bound stage of the render.
        """
        if not self.use_encoder:
            return None
        NS = cond.num_views_per_obj
        xyz_rep = repeat_interleave(xyz, NS)  # (SB*NS, B, 3)
        xyz_rot = jnp.einsum(
            "bij,bkj->bki", cond.poses[:, :3, :3], xyz_rep,
            precision="highest",
        )
        xyz_cam = xyz_rot + cond.poses[:, None, :3, 3]

        if not self.yolo:
            uv = -xyz_cam[:, :, :2] / xyz_cam[:, :, 2:]
            positive_z = None
        else:
            uv = xyz_cam[:, :, :2] / xyz_cam[:, :, 2:]
            positive_z = xyz_cam[:, :, 2] >= 0  # (SB*NS, B)

        focal = cond.focal
        cc = cond.c
        if focal.shape[0] > 1:
            focal = repeat_interleave(focal, NS)
        if cc.shape[0] > 1:
            cc = repeat_interleave(cc, NS)
        uv = uv * focal[:, None, :] + cc[:, None, :]

        latent = index_latent(
            cond.latent_flat,
            cond.latent_hw,
            uv,
            cond.image_size,
            index_interp=self.encoder.index_interp,
            index_padding=self.encoder.index_padding,
            scales=cond.latent_scales,
            # YOLO scrubs NaN latents right below, so the one-hot-matmul
            # interp's NaN-row zeroing is admissible there (and only there)
            nan_scrub_ok=self.yolo,
        )  # (SB*NS, B, C) — C = cl*d_hidden when cond.latent_projected

        if self.stop_encoder_grad and not cond.latent_projected:
            # projected tables are already stop-gradded at encode time
            latent = jax.lax.stop_gradient(latent)

        if self.yolo:
            # zero behind-camera and NaN latents (models.py:254-264).
            # In projected mode zeroing the injection == zeroing the
            # latent (lin_z biases are added after zeroing, so zeroed
            # points get exactly lin_z(0) = bias like the reference); the
            # NaN scrub zeroes whole projected rows instead of single
            # latent elements — identical whenever no NaNs occur.
            latent = jnp.where(positive_z[..., None], 0.0, latent)
            latent = jnp.where(jnp.isnan(latent), 0.0, latent)
        return latent

    def _forward_impl(
        self,
        variables: dict,
        cond: CondState,
        xyz: jnp.ndarray,
        coarse: bool = True,
        viewdirs: jnp.ndarray | None = None,
        latent: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        SB, B, _ = xyz.shape
        NS = cond.num_views_per_obj

        mlp = (
            self.mlp_coarse if (coarse or self.mlp_fine is None)
            else self.mlp_fine
        )
        name = (
            "mlp_coarse" if (coarse or self.mlp_fine is None) else "mlp_fine"
        )
        fuse = self._can_fuse(mlp, NS)
        fuse_pe = fuse and self._pe_fusible()

        xyz_rep = repeat_interleave(xyz, NS)  # (SB*NS, B, 3)
        xyz_rot = jnp.einsum(
            "bij,bkj->bki", cond.poses[:, :3, :3], xyz_rep, precision="highest"
        )
        xyz_cam = xyz_rot + cond.poses[:, None, :3, 3]

        z_feature = None
        pe_base = None
        if self.d_in > 0 and fuse_pe:
            # PE is computed inside the fused kernel: ship only the raw
            # [xyz_rot, viewdirs_rot] base (42-wide z-features never hit HBM)
            assert viewdirs is not None
            vd = repeat_interleave(viewdirs.reshape(SB, B, 3), NS)
            vd = jnp.einsum(
                "bij,bkj->bki", cond.poses[:, :3, :3], vd,
                precision="highest",
            )
            pe_base = jnp.concatenate(
                [xyz_rot.reshape(-1, 3), vd.reshape(-1, 3)], axis=1
            )
        elif self.d_in > 0:
            if self.use_xyz:
                z_feature = xyz_rot if self.normalize_z else xyz_cam
                z_feature = z_feature.reshape(-1, 3)
            else:
                src = xyz_rot if self.normalize_z else xyz_cam
                z_feature = -src[..., 2].reshape(-1, 1)

            if self.use_code and not self.use_code_viewdirs:
                z_feature = self.code(z_feature)

            if self.use_viewdirs:
                assert viewdirs is not None
                vd = repeat_interleave(viewdirs.reshape(SB, B, 3), NS)
                vd = jnp.einsum(
                    "bij,bkj->bki", cond.poses[:, :3, :3], vd,
                    precision="highest",
                )
                z_feature = jnp.concatenate(
                    [z_feature, vd.reshape(-1, 3)], axis=1
                )

            if self.use_code and self.use_code_viewdirs:
                z_feature = self.code(z_feature)

            mlp_input = z_feature

        if self.use_encoder:
            if latent is None:
                latent = self.project_latent(variables, cond, xyz)

            latent = latent.reshape(-1, latent.shape[-1])
            if self.d_in == 0:
                mlp_input = latent
            elif not fuse_pe:
                mlp_input = jnp.concatenate([latent, z_feature], axis=-1)

        if self.global_encoder is not None:
            num_repeats = mlp_input.shape[0] // cond.global_latent.shape[0]
            glob = repeat_interleave(cond.global_latent, num_repeats)
            mlp_input = jnp.concatenate([glob, mlp_input], axis=-1)

        if fuse_pe:
            from ..ops.pallas.fused_mlp import fused_resnetfc_pe

            freqs = tuple(
                float(self.code.freq_factor * 2.0**i)
                for i in range(self.code.num_freqs)
            )

            def xla_fallback_pe(p, lt, base):
                zf = jnp.concatenate(
                    [self.code(base[:, :3]), base[:, 3:]], axis=-1
                )
                zx = jnp.concatenate(
                    [lt.astype(jnp.float32), zf.astype(jnp.float32)], axis=-1
                )
                return mlp.apply(
                    {"params": p}, zx, combine_inner_dims=(NS, B)
                ).reshape(-1, self.d_out)

            mlp_output = fused_resnetfc_pe(
                variables["params"][name],
                latent,
                pe_base,
                mlp.n_blocks,
                min(mlp.combine_layer, mlp.n_blocks),
                NS,
                B,
                jnp.dtype(self.compute_dtype),
                freqs,
                xla_fallback_pe,
            )
        elif fuse:
            from ..ops.pallas.fused_mlp import fused_resnetfc

            def xla_fallback(p, lt, zf):
                zx = jnp.concatenate(
                    [lt.astype(jnp.float32), zf.astype(jnp.float32)], axis=-1
                )
                return mlp.apply(
                    {"params": p}, zx, combine_inner_dims=(NS, B)
                ).reshape(-1, self.d_out)

            mlp_output = fused_resnetfc(
                variables["params"][name],
                latent,
                z_feature,
                mlp.n_blocks,
                min(mlp.combine_layer, mlp.n_blocks),
                NS,
                B,
                jnp.dtype(self.compute_dtype),
                xla_fallback,
            )
        elif cond.latent_projected:
            mlp_output = mlp.apply(
                {"params": variables["params"][name]},
                mlp_input,
                combine_inner_dims=(NS, B),
                latent_projected=True,
                # only ResnetFC takes int8; pass it only when on so the
                # ImplicitNet path keeps its signature
                **({"int8": True} if cond.mlp_int8 else {}),
            )
        else:
            mlp_output = mlp.apply(
                {"params": variables["params"][name]},
                mlp_input,
                combine_inner_dims=(NS, B),
                **({"int8": True} if cond.mlp_int8 else {}),
            )
        mlp_output = mlp_output.reshape(-1, B, self.d_out)

        if self.yolo:
            return mlp_output

        rgb = jax.nn.sigmoid(mlp_output[..., :3])
        sigma = jax.nn.relu(mlp_output[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1).reshape(SB, B, -1)
