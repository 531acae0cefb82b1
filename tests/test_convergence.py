"""Slow opt-in convergence tests: the full train->render loop must learn
novel-view synthesis on synthetic scenes.

Run with PNY_RUN_SLOW=1.  Budget: each test is sized to finish in well
under 10 minutes on a single CPU core at its defaults (r4 measured
wall-clock per test is recorded in CONVERGENCE.md, next to the chip
recipes); PNY_STEPS scales the step counts up for hardware validation
runs (PNY_TPU=1).

NOTE no_bbox_step=0 is essential here: with the default bbox-biased ray
sampling (reference parity, PixelNerfTrainer.py:69-112) only bbox-interior
pixels are supervised, so full-frame novel-view PSNR stays poor until the
no_bbox_step switch — by design, not a bug.
"""

import os
from pathlib import Path

import pytest

from synth_data import make_srn_dataset
from test_train_integration import NERF_TRAIN_CONF, make_args

pytestmark = pytest.mark.skipif(
    not os.environ.get("PNY_RUN_SLOW"),
    reason="slow convergence test; set PNY_RUN_SLOW=1",
)


def test_nerf_overfit_novel_view_psnr(tmp_path):
    """Single-scene overfit (PNY_STEPS, default 200 @ ray_batch 512 —
    sized for <10 min on one CPU core; the r2/r3 chip validations used
    300+ steps @ 1024 rays, reaching 21.6-26.4 dB)."""
    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer

    steps = int(os.environ.get("PNY_STEPS", 200))

    root = str(tmp_path / "data" / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=1, n_views=8, img_size=32)

    conf = parse_string(NERF_TRAIN_CONF.replace("d_hidden = 64",
                                                "d_hidden = 128"))
    args = make_args(Path(tmp_path), "overfit",
                     extra={"nviews": "2", "ray_batch_size": 512,
                            "lr": 5e-4, "no_bbox_step": 0})
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    render_par = bind_parallel(renderer, model, gpus=[0], want_weights=True)
    trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                           render_par, [2])
    batch = next(iter(DataLoader(dset, batch_size=1)))

    _, vals0 = trainer.vis_step(batch, 0, idx=0)
    for step in range(steps):
        losses = trainer.train_step(batch, step)
    _, vals = trainer.vis_step(batch, steps, idx=0)

    print(f"overfit PSNR {vals0['psnr']:.2f} -> {vals['psnr']:.2f} "
          f"loss {float(losses['t']):.4f} ({steps} steps)")
    # r4: passes in ~4 min on one CPU core at the 200-step/512-ray
    # default (measured values in CONVERGENCE.md; margins loose below)
    assert losses["t"] < 0.04
    assert vals["psnr"] > vals0["psnr"] + 5, (vals0, vals)
    assert vals["psnr"] > 17.0


def test_nerf_multiscene_generalizes(tmp_path):
    """The GENERALIZING pixelNeRF path (several scenes, val-view PSNR on
    held-out scenes) converges with the bf16 production policy + sharded
    update — the r2 chip validation was single-scene overfit only
    (VERDICT r2 weak/next #6).

    Recipe knobs: PNY_STEPS (default 250 for a <10-min single-core CPU
    budget; the chip validation run uses 2000), PNY_DTYPE (default
    bfloat16 — the production path).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from pixelnerf_yolo_tpu.utils.metrics import psnr

    # r5 right-sizing (VERDICT r4 #5): the 250-step/512-ray recipe
    # measured 31-37 min on this box's single core — 100 steps @ 256
    # rays preserves the generalization signal (held-out PSNR +4 dB+)
    # inside the <10-min bar; thresholds re-pinned below at the smaller
    # recipe's measured value
    steps = int(os.environ.get("PNY_STEPS", 80))
    rays_per_step = int(os.environ.get("PNY_RAYS", 256))
    dtype = os.environ.get("PNY_DTYPE", "bfloat16")

    root = str(tmp_path / "data" / "cars")
    make_srn_dataset(root, stage="train", n_objs=6, n_views=8, img_size=32)
    make_srn_dataset(root, stage="val", n_objs=2, n_views=8, img_size=32,
                     seed=77)
    make_srn_dataset(root, stage="test", n_objs=1, n_views=8, img_size=32,
                     seed=88)

    conf = parse_string(
        NERF_TRAIN_CONF.replace("d_hidden = 64", "d_hidden = 128")
    )
    conf.put("model.compute_dtype", dtype)
    args = make_args(Path(tmp_path), "multiscene",
                     extra={"nviews": "2", "ray_batch_size": rays_per_step,
                            "lr": 5e-4, "no_bbox_step": 0,
                            "batch_size": 2})
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    render_par = bind_parallel(renderer, model, gpus=[0],
                               want_weights=False)
    trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                           render_par, [2])

    def val_psnr():
        """Held-out-scene novel-view PSNR: condition on views (0, 1),
        render view 4, average over the val scenes."""
        vals = []
        for data in DataLoader(val_dset, batch_size=1, shuffle=False):
            images = np.asarray(data["images"][0])  # (NV, 3, H, W)
            poses = np.asarray(data["poses"][0])
            focal = np.asarray(data["focal"][0])
            NV, _, H, W = images.shape
            cond = model.encode(
                trainer.variables,
                jnp.asarray(images[[0, 1]][None]),
                jnp.asarray(poses[[0, 1]][None]),
                jnp.asarray(focal),
            )
            rays = gen_rays(
                jnp.asarray(poses[4:5]), W, H, jnp.asarray(focal),
                dset.z_near, dset.z_far,
            ).reshape(1, -1, 8)
            out = renderer(
                model, trainer.variables, cond, rays,
                jax.random.PRNGKey(0), want_weights=False,
            )
            branch = "fine" if "fine" in out else "coarse"
            pred = np.asarray(out[branch]["rgb"], np.float32).reshape(
                H, W, 3
            )
            gt = images[4].transpose(1, 2, 0) * 0.5 + 0.5
            vals.append(float(psnr(pred, gt)))
        return float(np.mean(vals))

    psnr0 = val_psnr()
    loader = DataLoader(dset, batch_size=2, shuffle=True, seed=3)
    it = iter(loader)
    step = 0
    while step < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        losses = trainer.train_step(batch, step)
        step += 1
        if step % 50 == 0:
            # bound the async dispatch queue (on remote-relay TPU setups
            # thousands of un-materialized steps can outlive the client)
            float(losses["t"])
    psnr1 = val_psnr()
    print(f"multiscene val PSNR {psnr0:.2f} -> {psnr1:.2f} "
          f"({steps} steps, {dtype})")

    # r5: sized for <10 min on one CPU core at the 80-step/256-ray
    # default — measured 16.16/16.12 dB, 10 m 54 s cold-cache contended
    # and 7 m 48 s warm-cache contended (CONVERGENCE.md r5; r4's
    # 250-step/512-ray recipe ran 31-37 min).  Margins kept loose.
    assert np.isfinite(float(losses["t"]))
    assert psnr1 > psnr0 + 4.0, (psnr0, psnr1)
    assert psnr1 > 14.0
