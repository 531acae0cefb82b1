"""NeRF volume renderer (functional, jit-friendly).

Parity: /root/reference/src/render/nerf.py:51-377.
  * stratified coarse -> composite -> (optional) fine pass over the sorted
    union of coarse + importance + depth samples (nerf.py:257-309)
  * composite math in ops/composite.py (delta_inf = far - z_last)
  * sample-count schedule (sched) kept as explicit state (nerf.py:324-344)

TPU design: one renderer call evaluates ALL sample points of the ray batch
in a single fused model invocation — the reference's eval_batch_size python
chunk loop (nerf.py:196-226) disappears under jit; memory is controlled by
the caller's ray chunking and by optional field rematerialization
(``model.remat = True`` — jax.checkpoint in models/pixelnerf.py forward).
Returns plain nested dicts (the DotMap equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.composite import composite
from ..ops.ray_sampling import sample_coarse, sample_fine, sample_fine_depth


@dataclasses.dataclass(frozen=True)
class NeRFRenderer:
    n_coarse: int = 128
    n_fine: int = 0
    n_fine_depth: int = 0
    noise_std: float = 0.0
    depth_std: float = 0.01
    eval_batch_size: int = 100000
    white_bkgd: bool = False
    lindisp: bool = False
    sched: Optional[tuple] = None  # (iters, n_coarse list, n_fine list)
    # early ray termination (serving lever, opt-in, DOCUMENTED
    # APPROXIMATION): fraction of each ray chunk given fine-pass
    # capacity.  The fine pass runs only on the top-⌈chunk·f⌉ rays by
    # coarse weight-sum (static-capacity compaction gather — the
    # XLA-friendly form of "skip rays whose coarse transmittance says
    # background"); skipped rays keep their coarse rgb/depth as the fine
    # output.  In white_bkgd scenes the coarse pass already renders
    # background pixels to within noise of the fine pass (the reference's
    # weights vanish there, nerf.py:234-250), so f at or above the
    # scene's foreground fraction loses ~nothing while cutting fine-MLP
    # FLOPs by (1-f)·96/160 at the headline config.  Inference-only
    # (ignored under train=True); requires the latent-reuse path.
    early_terminate: float = 0.0

    @property
    def using_fine(self) -> bool:
        return self.n_fine > 0

    @classmethod
    def from_conf(
        cls, conf, white_bkgd=False, lindisp=False, eval_batch_size=100000
    ) -> "NeRFRenderer":
        sched = conf.get_list("sched", None)
        if sched is not None and len(sched) == 0:
            sched = None
        return cls(
            n_coarse=conf.get_int("n_coarse", 128),
            n_fine=conf.get_int("n_fine", 0),
            n_fine_depth=conf.get_int("n_fine_depth", 0),
            noise_std=conf.get_float("noise_std", 0.0),
            depth_std=conf.get_float("depth_std", 0.01),
            white_bkgd=bool(conf.get_float("white_bkgd", white_bkgd)),
            lindisp=lindisp,
            eval_batch_size=conf.get_int("eval_batch_size", eval_batch_size),
            sched=tuple(map(tuple, sched)) if sched is not None else None,
            early_terminate=conf.get_float("early_terminate", 0.0),
        )

    def _gated_capacity(self, cb: int) -> int:
        """Static fine-pass ray capacity for a cb-ray chunk: ⌈cb·f⌉
        rounded up to a multiple of 8 (sublane tiling), capped at cb."""
        import math

        c0 = max(1, math.ceil(cb * float(self.early_terminate)))
        return min(cb, ((c0 + 7) // 8) * 8)

    # -- internals -------------------------------------------------------

    def _chunk_rays(self, n_rays_per_scene: int, n_views: int = 1,
                    latent_width: int = 512,
                    grad_remat: bool = False) -> int:
        """Rays per evaluation chunk: the conf's eval_batch_size is a
        (GPU-era) memory knob, floored at ~2M rows so chunks stay
        MXU-sized; sized by the largest per-pass sample count times the
        number of source views (pre-combine rows scale with NS), scaled
        down for latents wider than 512.

        grad_remat (training with model.remat): the checkpointed field's
        backward recomputes ALL block activations of a chunk and holds
        them live while transposing — ~12KB/row (2 per block x 5 blocks
        bf16 512-wide + flowing grads) vs ~4KB/row at inference.  A
        measured 32768-ray remat step OOM'd at the inference budget
        (27.4G needed of 15.75G HBM, 11 x 1.5G block activations live,
        35% fragmentation); a 4x smaller row budget bounds the remat
        backward at ~6GB."""
        k_max = self.n_coarse + (self.n_fine if self.using_fine else 0)
        rows_per_ray = max(k_max, 1) * max(n_views, 1)
        # ~2M rows/chunk: each row holds ~4KB of live tensors (gathered
        # 512-wide latents + field activations) -> ~8GB peak of 16GB HBM
        budget = (1 << (19 if grad_remat else 21)) * 512 // max(
            latent_width, 512
        )
        # eval_batch_size is an inference knob — ignored under grad+remat
        effective_ebs = (
            budget if grad_remat else max(self.eval_batch_size, budget)
        )
        cap = max(1, effective_ebs // rows_per_ray)
        if n_rays_per_scene <= cap:
            return n_rays_per_scene
        # even split: minimizes padding (at most nc-1 dummy rays)
        nc = -(-n_rays_per_scene // cap)
        return -(-n_rays_per_scene // nc)

    def chunk_rays_for(self, n_rays_per_scene: int, n_views: int = 1,
                       latent_width: int = 512,
                       grad_remat: bool = False) -> int:
        """Public probe of the ray-chunk size the renderer will pick (the
        bench uses it to lower a single-chunk program for executed-FLOPs
        cost analysis — XLA counts a while/map body once, so a chunked
        program's cost_analysis() underreports by the chunk count)."""
        return self._chunk_rays(
            n_rays_per_scene, n_views, latent_width=latent_width,
            grad_remat=grad_remat,
        )

    def _eval_model(
        self, model, variables, cond, rays, z_samp, coarse: bool, sb: int,
        chunk_rays: int, return_latent: bool = False,
    ):
        """Evaluate the field at all ray sample points.

        rays (B, 8) flat; z_samp (B, K); sb = superbatch size.
        Returns (B, K, d_out); with return_latent (unchunked path only)
        also the (SB*NS, B*K, C) projected latents for fine-pass reuse.

        eval_batch_size (the reference's point-eval chunk, nerf.py:196-226)
        becomes a lax.map over per-scene ray blocks: memory stays bounded,
        everything remains one jitted program (no host chunk loop).
        """
        assert not return_latent or z_samp.shape[0] // sb <= chunk_rays
        B, K = z_samp.shape
        Bp = B // sb  # rays per scene
        points = rays[:, None, :3] + z_samp[..., None] * rays[:, None, 3:6]

        use_viewdirs = model.use_viewdirs
        viewdirs = None
        if use_viewdirs:
            viewdirs = jnp.broadcast_to(rays[:, None, 3:6], (B, K, 3))

        cb = chunk_rays
        if Bp <= cb:
            pts = points.reshape(sb, -1, 3)
            vd = viewdirs.reshape(sb, -1, 3) if use_viewdirs else None
            lat = None
            if return_latent:
                lat = model.project_latent(variables, cond, pts)
                out = model.forward(
                    variables, cond, pts, coarse=coarse, viewdirs=vd,
                    latent=lat,
                )
            else:
                out = model.forward(
                    variables, cond, pts, coarse=coarse, viewdirs=vd
                )
            out = out.reshape(B, K, -1)
            return (out, lat) if return_latent else out

        assert Bp % cb == 0, (Bp, cb)  # __call__ pads to a chunk multiple
        nc = Bp // cb
        pts = points.reshape(sb, nc, cb * K, 3).transpose(1, 0, 2, 3)
        if use_viewdirs:
            vds = viewdirs.reshape(sb, nc, cb * K, 3).transpose(1, 0, 2, 3)

            def chunk_fn(args):
                p, d = args
                return model.forward(
                    variables, cond, p, coarse=coarse, viewdirs=d
                )

            out = jax.lax.map(chunk_fn, (pts, vds))
        else:

            def chunk_fn(p):
                return model.forward(variables, cond, p, coarse=coarse)

            out = jax.lax.map(chunk_fn, pts)
        # (nc, sb, cb*K, d_out) -> (B, K, d_out)
        out = out.transpose(1, 0, 2, 3).reshape(B, K, -1)
        return out

    def _composite_pass(
        self, model, variables, cond, rays, z_samp, coarse, sb, rng, train,
        chunk_rays, return_latent: bool = False,
    ):
        with jax.named_scope("renderer_composite"):
            out = self._eval_model(
                model, variables, cond, rays, z_samp, coarse, sb,
                chunk_rays, return_latent=return_latent,
            )
        latent = None
        if return_latent:
            out, latent = out
        sigma_noise = None
        if train and self.noise_std > 0.0 and rng is not None:
            sigma_noise = (
                jax.random.normal(rng, z_samp.shape, dtype=z_samp.dtype)
                * self.noise_std
            )
        comp = composite(
            out,
            z_samp,
            rays[:, -1:],
            white_bkgd=self.white_bkgd,
            sigma_noise=sigma_noise,
        )
        return (comp + (latent,)) if return_latent else comp

    # -- public API --------------------------------------------------------

    def __call__(
        self,
        model,
        variables: dict,
        cond,
        rays: jnp.ndarray,
        rng: jax.Array,
        want_weights: bool = False,
        train: bool = False,
    ) -> dict:
        """Render a ray batch.

        :param rays (SB, B, 8)
        :return {"coarse": {"rgb" (SB,B,3), "depth" (SB,B), ["weights"]},
                 ["fine": {...}]}
        """
        assert rays.ndim == 3
        with jax.named_scope("renderer_forward"):
            return self._render(
                model, variables, cond, rays, rng, want_weights, train
            )

    def _render(self, model, variables, cond, rays, rng, want_weights,
                train):
        sb = rays.shape[0]
        n_rays = rays.shape[1]
        lat_w = (
            cond.latent_flat.shape[-1]
            if getattr(cond, "latent_flat", None) is not None
            else 512
        )
        chunk_rays = self._chunk_rays(
            n_rays, cond.num_views_per_obj, latent_width=lat_w,
            grad_remat=train and getattr(model, "remat", False),
        )
        pad = (-n_rays) % chunk_rays
        if pad:
            rays = jnp.concatenate(
                [rays, jnp.broadcast_to(rays[:, :1], (sb, pad, 8))], axis=1
            )
        rays_flat = rays.reshape(-1, 8)

        k_coarse, k_fine, k_fdepth, k_noise_c, k_noise_f = jax.random.split(
            rng, 5
        )
        z_coarse = sample_coarse(
            rays_flat, self.n_coarse, rng=k_coarse, lindisp=self.lindisp
        )
        # fine-pass latent reuse: the z-union contains every coarse z, so
        # those samples' pixel-aligned latents are identical across passes
        # — keep the coarse gathers (the render's bytes-bound stage) and
        # re-gather only the new importance/depth samples.
        can_reuse = getattr(model, "use_encoder", False) and callable(
            getattr(model, "project_latent", None)
        )
        chunked = (rays_flat.shape[0] // sb) > chunk_rays
        reuse = self.using_fine and not chunked and can_reuse
        if self.using_fine and chunked and can_reuse:
            # chunked regime (the 65k-ray operating point): run coarse +
            # fine for each ray chunk inside ONE lax.map body, so the
            # latent reuse works per chunk and the inter-pass (B, K)
            # intermediates never round-trip HBM.  r2 ran coarse and fine
            # as two sequential chunked passes here, which silently
            # disabled the reuse and re-gathered all 96 fine samples
            # (profiler trace: gather+interp was ~32% of the iteration).
            # Sigma noise (train + noise_std > 0) is pre-drawn over the
            # full batch with the two-pass keys and sliced per chunk, so
            # the fused path stays active for noisy training configs.
            return self._render_chunked_fused(
                model, variables, cond, rays_flat, z_coarse, k_fine,
                k_fdepth, k_noise_c, k_noise_f, sb, chunk_rays,
                want_weights, n_rays, train,
            )
        coarse_pass = self._composite_pass(
            model, variables, cond, rays_flat, z_coarse, True, sb, k_noise_c,
            train, chunk_rays, return_latent=reuse,
        )
        if reuse:
            weights_c, rgb_c, depth_c, latent_c = coarse_pass
        else:
            weights_c, rgb_c, depth_c = coarse_pass
            latent_c = None

        outputs = {
            "coarse": self._format(
                weights_c, rgb_c, depth_c, sb, want_weights, n_rays
            )
        }

        if self.using_fine and (
            self.early_terminate > 0.0 and not train and latent_c is not None
        ):
            # early ray termination (unchunked path): draw the sample
            # randomness over the full batch with the chunked path's
            # shapes/keys, then gate (capacity = one chunk here)
            B = rays_flat.shape[0]
            n_imp = self.n_fine - self.n_fine_depth
            u = u_jitter = noise_d = None
            if n_imp > 0:
                u = jax.random.uniform(
                    k_fine, (B, n_imp), dtype=rays_flat.dtype
                )
                k2, _ = jax.random.split(k_fine)
                u_jitter = jax.random.uniform(
                    k2, (B, n_imp), dtype=rays_flat.dtype
                )
            if self.n_fine_depth > 0:
                noise_d = jax.random.normal(
                    k_fdepth, (B, self.n_fine_depth), dtype=rays_flat.dtype
                )
            weights_f, rgb_f, depth_f = self._fine_gated(
                model, variables, cond, rays_flat, z_coarse, weights_c,
                rgb_c, depth_c, latent_c, sb,
                u=u, u_jitter=u_jitter, noise_d=noise_d,
            )
            outputs["fine"] = self._format(
                weights_f, rgb_f, depth_f, sb, want_weights, n_rays
            )
        elif self.using_fine:
            all_samps = [z_coarse]
            if self.n_fine - self.n_fine_depth > 0:
                all_samps.append(
                    sample_fine(
                        rays_flat,
                        jax.lax.stop_gradient(weights_c),
                        self.n_fine - self.n_fine_depth,
                        self.n_coarse,
                        rng=k_fine,
                        lindisp=self.lindisp,
                    )
                )
            if self.n_fine_depth > 0:
                all_samps.append(
                    sample_fine_depth(
                        rays_flat,
                        depth_c,
                        self.n_fine_depth,
                        rng=k_fdepth,
                        depth_std=self.depth_std,
                    )
                )
            if latent_c is not None and len(all_samps) > 1:
                weights_f, rgb_f, depth_f = self._fine_pass_reuse(
                    model, variables, cond, rays_flat,
                    jnp.concatenate(all_samps, axis=-1), z_coarse.shape[1],
                    latent_c, sb, k_noise_f, train,
                )
            else:
                z_combine = jnp.sort(
                    jnp.concatenate(all_samps, axis=-1), axis=-1
                )
                weights_f, rgb_f, depth_f = self._composite_pass(
                    model, variables, cond, rays_flat, z_combine, False, sb,
                    k_noise_f, train, chunk_rays,
                )
            outputs["fine"] = self._format(
                weights_f, rgb_f, depth_f, sb, want_weights, n_rays
            )

        return outputs

    def _render_chunked_fused(
        self, model, variables, cond, rays_flat, z_coarse, k_fine,
        k_fdepth, k_noise_c, k_noise_f, sb, chunk_rays, want_weights,
        n_rays, train,
    ):
        """Coarse + fine for each ray chunk in one lax.map body.

        All randomness is pre-drawn over the FULL ray batch with exactly
        the draw shapes/keys of the two-pass path, then sliced per chunk —
        so outputs are invariant to the chunk size and bitwise-comparable
        to the unchunked reuse path (up to reduction order).
        """
        B = rays_flat.shape[0]
        Bp = B // sb
        cb = chunk_rays
        nc = Bp // cb
        assert Bp % cb == 0
        Kc = self.n_coarse
        n_imp = self.n_fine - self.n_fine_depth
        n_d = self.n_fine_depth
        noisy = train and self.noise_std > 0.0

        xs = {
            "rays": rays_flat,
            "z": z_coarse,
        }
        if noisy:
            xs["noise_c"] = (
                jax.random.normal(k_noise_c, z_coarse.shape,
                                  dtype=z_coarse.dtype) * self.noise_std
            )
            xs["noise_f"] = (
                jax.random.normal(k_noise_f, (B, Kc + self.n_fine),
                                  dtype=z_coarse.dtype) * self.noise_std
            )
        if n_imp > 0:
            xs["u"] = jax.random.uniform(
                k_fine, (B, n_imp), dtype=rays_flat.dtype
            )
            k2, _ = jax.random.split(k_fine)
            xs["u_jitter"] = jax.random.uniform(
                k2, (B, n_imp), dtype=rays_flat.dtype
            )
        if n_d > 0:
            xs["noise_d"] = jax.random.normal(
                k_fdepth, (B, n_d), dtype=rays_flat.dtype
            )

        def to_chunks(x):
            # (sb*Bp, ...) -> (nc, sb*cb, ...) keeping (sb, cb) row order
            x = x.reshape(sb, nc, cb, *x.shape[1:])
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape(nc, sb * cb, *x.shape[3:])

        xs = {k: to_chunks(v) for k, v in xs.items()}

        def body(c):
            r2 = c["rays"]
            zc = c["z"]
            pts = r2[:, None, :3] + zc[..., None] * r2[:, None, 3:6]
            pts_sb = pts.reshape(sb, -1, 3)
            vd = None
            if model.use_viewdirs:
                vd = jnp.broadcast_to(
                    r2[:, None, 3:6], (r2.shape[0], Kc, 3)
                ).reshape(sb, -1, 3)
            with jax.named_scope("renderer_composite"):
                lat = model.project_latent(variables, cond, pts_sb)
                out_c = model.forward(
                    variables, cond, pts_sb, coarse=True, viewdirs=vd,
                    latent=lat,
                ).reshape(sb * cb, Kc, -1)
            w_c, rgb_c, depth_c = composite(
                out_c, zc, r2[:, -1:], white_bkgd=self.white_bkgd,
                sigma_noise=c.get("noise_c"),
            )
            if self.early_terminate > 0.0 and not train:
                # early ray termination: fine pass on the top-C rays by
                # coarse weight-sum only (serving lever, see the field
                # docstring); capacity applies per chunk
                w_f, rgb_f, depth_f = self._fine_gated(
                    model, variables, cond, r2, zc, w_c, rgb_c, depth_c,
                    lat, sb, u=c.get("u"), u_jitter=c.get("u_jitter"),
                    noise_d=c.get("noise_d"),
                )
            else:
                samps = [zc]
                if n_imp > 0:
                    samps.append(
                        sample_fine(
                            r2, jax.lax.stop_gradient(w_c), n_imp, Kc,
                            lindisp=self.lindisp, u=c["u"],
                            u_jitter=c["u_jitter"],
                        )
                    )
                if n_d > 0:
                    samps.append(
                        sample_fine_depth(
                            r2, depth_c, n_d, depth_std=self.depth_std,
                            noise=c["noise_d"],
                        )
                    )
                w_f, rgb_f, depth_f = self._fine_pass_reuse(
                    model, variables, cond, r2,
                    jnp.concatenate(samps, axis=-1), Kc, lat, sb, None,
                    False, sigma_noise=c.get("noise_f"),
                )
            return {
                "w_c": w_c, "rgb_c": rgb_c, "depth_c": depth_c,
                "w_f": w_f, "rgb_f": rgb_f, "depth_f": depth_f,
            }

        outs = jax.lax.map(body, xs)

        def from_chunks(x):
            # (nc, sb*cb, ...) -> (sb*Bp, ...)
            x = x.reshape(nc, sb, cb, *x.shape[2:])
            x = jnp.moveaxis(x, 0, 1)
            return x.reshape(B, *x.shape[3:])

        outs = {k: from_chunks(v) for k, v in outs.items()}
        return {
            "coarse": self._format(
                outs["w_c"], outs["rgb_c"], outs["depth_c"], sb,
                want_weights, n_rays,
            ),
            "fine": self._format(
                outs["w_f"], outs["rgb_f"], outs["depth_f"], sb,
                want_weights, n_rays,
            ),
        }

    def _fine_gated(
        self, model, variables, cond, r2, zc, w_c, rgb_c, depth_c, lat, sb,
        u=None, u_jitter=None, noise_d=None,
    ):
        """Early-ray-termination fine pass (see ``early_terminate``).

        Compaction gather: top-C rays per scene by coarse weight-sum get
        the full fine pass (importance + depth samples, latent reuse);
        the rest keep their coarse rgb/depth, with fine weights = coarse
        weights zero-padded to the union width (the padded columns carry
        no z semantics — weight sums stay exact, per-column consumers
        should not mix gated rows; want_weights callers are the trainers,
        where gating is off).

        r2 (sb*cb, 8) rays; zc (sb*cb, Kc); w_c (sb*cb, Kc) coarse
        weights; depth_c (sb*cb,); lat (sb*NS, cb*Kc, C) coarse latents
        (scene-major axis 0, ray-major axis 1 — repeat_interleave layout,
        models/pixelnerf.py:615).  u/u_jitter/noise_d: pre-drawn sample
        randomness over the FULL chunk (compacted here so results don't
        depend on which rays the gate keeps).
        """
        cb = r2.shape[0] // sb
        Kc = zc.shape[1]
        n_imp = self.n_fine - self.n_fine_depth
        n_d = self.n_fine_depth
        NS = cond.num_views_per_obj
        Cc = self._gated_capacity(cb)

        wsum = w_c.sum(-1).reshape(sb, cb)
        _, idx = jax.lax.top_k(wsum, Cc)  # (sb, Cc) per-scene ray ids

        def take(x):
            xs = x.reshape(sb, cb, *x.shape[1:])
            ix = idx.reshape(sb, Cc, *([1] * (xs.ndim - 2)))
            return jnp.take_along_axis(xs, ix, axis=1).reshape(
                sb * Cc, *x.shape[1:]
            )

        r2c = take(r2)
        samps = [take(zc)]
        if n_imp > 0:
            samps.append(
                sample_fine(
                    r2c, jax.lax.stop_gradient(take(w_c)), n_imp, Kc,
                    lindisp=self.lindisp, u=take(u), u_jitter=take(u_jitter),
                )
            )
        if n_d > 0:
            samps.append(
                sample_fine_depth(
                    r2c, take(depth_c), n_d, depth_std=self.depth_std,
                    noise=take(noise_d),
                )
            )
        C_lat = lat.shape[-1]
        latc = lat.reshape(sb, NS, cb, Kc, C_lat)
        latc = jnp.take_along_axis(
            latc, idx[:, None, :, None, None], axis=2
        ).reshape(sb * NS, Cc * Kc, C_lat)

        w_g, rgb_g, depth_g = self._fine_pass_reuse(
            model, variables, cond, r2c,
            jnp.concatenate(samps, axis=-1), Kc, latc, sb, None, False,
        )

        def put(base, upd):
            b = base.reshape(sb, cb, *base.shape[1:])
            up = upd.reshape(sb, Cc, *upd.shape[1:])
            return b.at[jnp.arange(sb)[:, None], idx].set(up).reshape(
                base.shape
            )

        w_base = jnp.pad(w_c, ((0, 0), (0, self.n_fine)))
        return put(w_base, w_g), put(rgb_c, rgb_g), put(depth_c, depth_g)

    def _fine_pass_reuse(
        self, model, variables, cond, rays, z_union, k_coarse: int,
        latent_c, sb, rng, train, sigma_noise=None,
    ):
        """Fine pass evaluated in UNSORTED union order so the first
        k_coarse samples can reuse the coarse pass's latents; outputs are
        permuted into sorted-z order before compositing, which makes the
        result bitwise identical to evaluating on sorted z (per-point math
        is order-independent, and stable argsort matches jnp.sort)."""
        B, Ku = z_union.shape
        Kn = Ku - k_coarse
        Bp = B // sb
        z_new = z_union[:, k_coarse:]
        pts_new = rays[:, None, :3] + z_new[..., None] * rays[:, None, 3:6]
        lat_new = model.project_latent(
            variables, cond, pts_new.reshape(sb, -1, 3)
        )  # (SB*NS, Bp*Kn, C)
        C = lat_new.shape[-1]
        lat_u = jnp.concatenate(
            [
                latent_c.reshape(-1, Bp, k_coarse, C),
                lat_new.reshape(-1, Bp, Kn, C),
            ],
            axis=2,
        ).reshape(-1, Bp * Ku, C)

        pts_u = rays[:, None, :3] + z_union[..., None] * rays[:, None, 3:6]
        vd = None
        if model.use_viewdirs:
            vd = jnp.broadcast_to(rays[:, None, 3:6], (B, Ku, 3))
            vd = vd.reshape(sb, -1, 3)
        with jax.named_scope("renderer_composite"):
            out = model.forward(
                variables, cond, pts_u.reshape(sb, -1, 3), coarse=False,
                viewdirs=vd, latent=lat_u,
            ).reshape(B, Ku, -1)

        # multi-operand stable sort: z is the key, the d_out output
        # channels ride along.  (argsort + take_along_axis lowers the
        # permutation to scalar-unit gathers — measured 26 ms/chunk-step
        # at the 65k-ray operating point, ~14% of the whole iteration;
        # lax.sort keeps it on the VPU.)  The model head always emits f32
        # (lin_out runs f32 under every compute policy), so the channels
        # sort as f32 operands directly.
        d_out = out.shape[-1]
        ops = (z_union,) + tuple(
            out[..., i].astype(jnp.float32) for i in range(d_out)
        )
        sorted_ops = jax.lax.sort(
            ops, dimension=-1, num_keys=1, is_stable=True
        )
        z_sorted = sorted_ops[0]
        out_sorted = jnp.stack(sorted_ops[1:], axis=-1)
        if (
            sigma_noise is None
            and train
            and self.noise_std > 0.0
            and rng is not None
        ):
            sigma_noise = (
                jax.random.normal(rng, z_sorted.shape, dtype=z_sorted.dtype)
                * self.noise_std
            )
        return composite(
            out_sorted,
            z_sorted,
            rays[:, -1:],
            white_bkgd=self.white_bkgd,
            sigma_noise=sigma_noise,
        )

    @staticmethod
    def _format(weights, rgb, depth, sb: int, want_weights: bool,
                n_rays: int) -> dict:
        ret = {
            "rgb": rgb.reshape(sb, -1, 3)[:, :n_rays],
            "depth": depth.reshape(sb, -1)[:, :n_rays],
        }
        if want_weights:
            ret["weights"] = weights.reshape(sb, -1, weights.shape[-1])[
                :, :n_rays
            ]
        return ret

    # -- sample schedule (nerf.py:324-344) ----------------------------------

    def sched_step(self, state: dict, steps: int = 1):
        """Advance the sampling schedule.

        :param state {"iter_idx": int, "last_sched": int}
        :return (new_renderer, new_state)
        """
        if self.sched is None:
            return self, state
        state = dict(state)
        state["iter_idx"] = state.get("iter_idx", 0) + steps
        renderer = self
        while (
            state.get("last_sched", 0) < len(self.sched[0])
            and state["iter_idx"] >= self.sched[0][state.get("last_sched", 0)]
        ):
            idx = state.get("last_sched", 0)
            renderer = dataclasses.replace(
                renderer,
                n_coarse=self.sched[1][idx],
                n_fine=self.sched[2][idx],
            )
            print(
                "INFO: NeRF sampling resolution changed on schedule ==> c",
                renderer.n_coarse,
                "f",
                renderer.n_fine,
            )
            state["last_sched"] = idx + 1
        return renderer, state

    def bind_parallel(self, *args, **kwargs):
        """See pixelnerf_yolo_tpu.parallel.bind_parallel — kept as a method
        for reference API parity (nerf.py:360-377)."""
        from ..parallel import bind_parallel

        return bind_parallel(self, *args, **kwargs)
