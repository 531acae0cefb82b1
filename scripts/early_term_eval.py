"""Quality measurement for early ray termination (renderer.early_terminate).

Trains the synthetic-SRN overfit recipe (tests/test_convergence.py) on
whatever backend jax exposes, then renders a NOVEL view of the trained
scene at a sweep of gating fractions and reports, per fraction:
  * full-image PSNR vs ground truth
  * PSNR of the gated render vs the UNGATED render (the direct
    approximation error of the lever)
  * the fraction of pixels whose fine pass actually ran

The synthetic scene is white-background with a centered object covering
~25% of pixels (tests/synth_data.py make_srn_dataset) — the shape the
lever targets (reference weights vanish on background, nerf.py:234-250).

Usage:  python scripts/early_term_eval.py [--steps 300] [--size 64]
        [--fracs 0.5,0.375,0.25,0.125]
Results recorded in PERF.md ("Early ray termination").
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--rays", type=int, default=1024,
                    help="train ray batch")
    ap.add_argument("--fracs", default="0.5,0.375,0.25,0.125")
    args = ap.parse_args()

    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from synth_data import make_srn_dataset
    from test_train_integration import NERF_TRAIN_CONF, make_args
    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from pixelnerf_yolo_tpu.utils.metrics import psnr

    with tempfile.TemporaryDirectory() as tmp:
        root = str(Path(tmp) / "data" / "cars")
        for stage in ("train", "val", "test"):
            make_srn_dataset(root, stage=stage, n_objs=1, n_views=8,
                             img_size=args.size)

        conf = parse_string(
            NERF_TRAIN_CONF.replace("d_hidden = 64", "d_hidden = 128")
        )
        conf.put("model.compute_dtype", "bfloat16")
        targs = make_args(Path(tmp), "et_eval",
                          extra={"nviews": "2",
                                 "ray_batch_size": args.rays,
                                 "lr": 5e-4, "no_bbox_step": 0})
        dset, val_dset, _ = get_split_dataset("srn", root)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=[0],
                                   want_weights=True)
        trainer = make_trainer(targs, conf, dset, val_dset, model,
                               renderer, render_par, [2])
        batch = next(iter(DataLoader(dset, batch_size=1)))

        t0 = time.perf_counter()
        for step in range(args.steps):
            losses = trainer.train_step(batch, step)
        print(f"trained {args.steps} steps @ {args.rays} rays in "
              f"{time.perf_counter() - t0:.1f}s, loss "
              f"{float(losses['t']):.4f}", flush=True)
        variables = trainer.variables

        # novel view 4 conditioned on views (0, 1)
        images = np.asarray(batch["images"][0])
        poses = np.asarray(batch["poses"][0])
        focal = np.asarray(batch["focal"][0])
        H, W = images.shape[-2:]  # loader may resize from --size
        src = jnp.asarray(images[None, (0, 1)])
        src_poses = jnp.asarray(poses[None, (0, 1)])
        cond = model.encode(variables, src, src_poses, jnp.asarray(focal))
        tgt = 4
        rays = gen_rays(
            jnp.asarray(poses[tgt:tgt + 1]), W, H, jnp.asarray(focal),
            0.8, 1.8,
        ).reshape(1, -1, 8)
        gt = images[tgt].transpose(1, 2, 0) * 0.5 + 0.5
        key = jax.random.PRNGKey(7)

        def render_with(r):
            fn = jax.jit(
                lambda v, c, ra, k: r(model, v, c, ra, k,
                                      want_weights=True)
            )
            out = fn(variables, cond, rays, key)
            rgb = np.asarray(out["fine"]["rgb"][0], np.float32)
            w = np.asarray(out["coarse"]["weights"][0], np.float32)
            return rgb.reshape(H, W, 3), w

        rgb0, w_c = render_with(renderer)
        base_psnr = float(psnr(rgb0, gt))
        print(f"ungated: PSNR vs gt {base_psnr:.2f} dB")
        wsum = w_c.sum(-1)
        fg = float((wsum > 0.5).mean())
        print(f"coarse weight-sum>0.5 fraction (foreground): {fg:.3f}")

        for f in [float(x) for x in args.fracs.split(",")]:
            r = dataclasses.replace(renderer, early_terminate=f)
            rgb, _ = render_with(r)
            p_gt = float(psnr(rgb, gt))
            mse = float(np.mean((rgb - rgb0) ** 2))
            p_ref = (
                float("inf") if mse == 0 else -10.0 * np.log10(mse)
            )
            n_kept = r._gated_capacity(
                r.chunk_rays_for(
                    rays.shape[1], cond.num_views_per_obj,
                    latent_width=(
                        cond.latent_flat.shape[-1]
                        if getattr(cond, "latent_flat", None) is not None
                        else 512
                    ),
                )
            )
            print(
                f"f={f:<6} PSNR vs gt {p_gt:.2f} dB "
                f"(delta {p_gt - base_psnr:+.3f}), "
                f"PSNR vs ungated {p_ref:.1f} dB, "
                f"fine rays/chunk {n_kept}"
            )


if __name__ == "__main__":
    main()
