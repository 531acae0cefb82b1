"""YOLO ray renderer: coarse sampling + probability-weighted aggregation.

Parity: /root/reference/src/render/yolo.py:3-121.  Stratified coarse
sampling identical to NeRF's; the field emits (K, anchors, 7) per ray and
the aggregation (ops/composite.yolo_aggregate) reduces over K:
max-probability + sigmoid-probability-weighted means of the box values.

The reference's eval_batch_size chunk loop and NaN debug prints
(yolo.py:40-93) become: one fused evaluation under jit, with NaN scrubbing
in the model's YOLO path and optional jax.debug checks in the trainer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.composite import yolo_aggregate
from ..ops.ray_sampling import sample_coarse


@dataclasses.dataclass(frozen=True)
class YoloRenderer:
    n_coarse: int = 128
    eval_batch_size: int = 1024
    num_scales: int = 1
    num_anchors_per_scale: int = 3

    @classmethod
    def from_conf(cls, conf) -> "YoloRenderer":
        """Takes the ROOT config (yolo.py:28-35 reads renderer.* and
        model.mlp_coarse.*)."""
        return cls(
            n_coarse=conf.get_int("renderer.n_coarse", 128),
            eval_batch_size=conf.get_int("renderer.eval_batch_size", 1024),
            num_scales=conf.get_int("model.mlp_coarse.num_scales", 1),
            num_anchors_per_scale=conf.get_int(
                "model.mlp_coarse.num_anchors_per_scale", 3
            ),
        )

    def __call__(
        self,
        model,
        variables: dict,
        cond,
        rays: jnp.ndarray,
        rng: jax.Array,
    ) -> jnp.ndarray:
        """Render detections along rays.

        :param rays (..., 8) — flattened to (B, 8) like yolo.py:38
        :return (B, num_anchors_per_scale, 7) = [max_prob, x, y, w, h, c0, c1]
        """
        rays = rays.reshape(-1, 8)
        z_samp = sample_coarse(rays, self.n_coarse, rng=rng)  # (B, K)
        B, K = z_samp.shape

        points = rays[:, None, :3] + z_samp[..., None] * rays[:, None, 3:6]
        viewdirs = jnp.broadcast_to(rays[:, None, 3:6], (B, K, 3))

        # eval_batch_size is a (GPU-era) memory knob (yolo.py:63); on TPU
        # chunk by a ~2M-row budget at 512-wide latents (rows = points x
        # source views), scaled down for wider latents (the 1792-wide
        # custom backbone would otherwise gather ~7.5 GB per chunk)
        ns = max(getattr(cond, "num_views_per_obj", 1), 1)
        lat_w = (
            cond.latent_flat.shape[-1]
            if getattr(cond, "latent_flat", None) is not None
            else 512
        )
        budget = (1 << 21) * 512 // max(lat_w, 512)
        rows_budget = max(self.eval_batch_size * ns * K, budget)
        cb = max(1, rows_budget // max(K * ns, 1))
        if B > cb:
            nc = -(-B // cb)
            cb = -(-B // nc)
            pad = nc * cb - B
            if pad:
                points = jnp.concatenate(
                    [points, jnp.broadcast_to(points[:1], (pad, K, 3))], 0
                )
                viewdirs = jnp.concatenate(
                    [viewdirs, jnp.broadcast_to(viewdirs[:1], (pad, K, 3))], 0
                )
        if B <= cb:
            out = model.forward(
                variables, cond, points.reshape(1, B * K, 3), coarse=True,
                viewdirs=viewdirs.reshape(1, B * K, 3),
            )  # SB=1 (yolo.py:81)
        else:
            pts = points.reshape(nc, 1, cb * K, 3)
            vds = viewdirs.reshape(nc, 1, cb * K, 3)
            out = jax.lax.map(
                lambda a: model.forward(
                    variables, cond, a[0], coarse=True, viewdirs=a[1]
                ),
                (pts, vds),
            )
        out = out.reshape(-1, K, self.num_anchors_per_scale, 7)[:B]
        return yolo_aggregate(out)  # (B, A, 7)

    def bind_parallel(self, *args, **kwargs):
        from ..parallel import bind_parallel

        return bind_parallel(self, *args, **kwargs)


def make_renderer(conf, lindisp: bool = False):
    """Factory parity: /root/reference/src/render/render_util.py:5-12."""
    from .nerf import NeRFRenderer

    renderer_type = conf.get_string("renderer.type", "nerf")
    if renderer_type == "nerf":
        return NeRFRenderer.from_conf(conf.get_config("renderer"), lindisp=lindisp)
    if renderer_type == "yolo":
        return YoloRenderer.from_conf(conf)
    raise NotImplementedError("Unsupported renderer type")
