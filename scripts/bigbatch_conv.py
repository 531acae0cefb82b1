"""Large-batch time-to-quality on the chip (CONVERGENCE.md row).

The reference trains at ray_batch 128 — a GPU-memory workaround
(/root/reference/train/trainlib/YoloTrainer.py:154-194).  PERF.md's r4
sweep shows the chip's THROUGHPUT operating point is ~8192 rays/step;
this experiment asks whether the large batch also wins on wall-clock to
QUALITY, not just rays/s: train the multiscene NeRF recipe at the
TPU-sized batch vs the GPU-era small batch with the SAME total rays
seen, and compare held-out novel-view PSNR and wall time.

Usage: python scripts/bigbatch_conv.py <ray_batch> <steps> <lr>
Env:   BB_REMAT=1 / BB_GATHER=1 toggle model.remat / model.remat_gather.
       BB_WARMUP=<N> linear lr warmup over the first N steps
       (train.warmup_steps) — the large-batch arms diverge without it.
       BB_F32=1 trains in f32 (default bf16) to attribute instability.

Runs on whatever backend jax exposes (the chip, under axon).
"""

import os
import sys
import time
import tempfile
from pathlib import Path

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

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

from synth_data import make_srn_dataset
from test_train_integration import NERF_TRAIN_CONF, make_args

ray_batch = int(sys.argv[1])
steps = int(sys.argv[2])
lr = float(sys.argv[3])
remat = os.environ.get("BB_REMAT", "") == "1"
gather = os.environ.get("BB_GATHER", "") == "1"
warmup = int(os.environ.get("BB_WARMUP", "0"))
f32 = os.environ.get("BB_F32", "") == "1"

tmp_path = Path(tempfile.mkdtemp())
root = str(tmp_path / "data" / "cars")
make_srn_dataset(root, stage="train", n_objs=6, n_views=8, img_size=32)
make_srn_dataset(root, stage="val", n_objs=2, n_views=8, img_size=32,
                 seed=77)
make_srn_dataset(root, stage="test", n_objs=1, n_views=8, img_size=32,
                 seed=88)

conf = parse_string(NERF_TRAIN_CONF.replace("d_hidden = 64",
                                            "d_hidden = 128"))
if not f32:
    conf.put("model.compute_dtype", "bfloat16")
if warmup:
    conf.put("train.warmup_steps", warmup)
if remat:
    conf.put("model.remat", True)
if gather:
    conf.put("model.remat_gather", True)
args = make_args(tmp_path, f"bigbatch_{ray_batch}",
                 extra={"nviews": "2", "ray_batch_size": ray_batch,
                        "lr": lr, "no_bbox_step": 0, "batch_size": 2})
dset, val_dset, _ = get_split_dataset("srn", root)
model = make_model(conf.get_config("model"))
renderer = make_renderer(conf)
render_par = bind_parallel(renderer, model, gpus=[0], want_weights=False)
trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                       render_par, [2])


def val_psnr():
    vals = []
    for data in DataLoader(val_dset, batch_size=1, shuffle=False):
        images = np.asarray(data["images"][0])
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
        out = renderer(model, trainer.variables, cond, rays,
                       jax.random.PRNGKey(0), want_weights=False)
        branch = "fine" if "fine" in out else "coarse"
        pred = np.asarray(out[branch]["rgb"], np.float32).reshape(H, W, 3)
        gt = images[4].transpose(1, 2, 0) * 0.5 + 0.5
        vals.append(float(psnr(pred, gt)))
    return float(np.mean(vals))


psnr0 = val_psnr()
loader = DataLoader(dset, batch_size=2, shuffle=True, seed=3)
it = iter(loader)
step = 0
# warm/compile step outside the timer — it is a REAL update, so it must
# run at the warmup schedule's step-0 lr, not the full lr (an un-warmed
# first step on random init is exactly what warmup exists to soften)
if warmup:
    trainer.set_lr(trainer.lr_at(0, 0))
batch0 = next(it)
losses = trainer.train_step(batch0, 0)
float(losses["t"])
t0 = time.perf_counter()
while step < steps:
    try:
        batch = next(it)
    except StopIteration:
        it = iter(loader)
        continue
    if warmup and step <= warmup:
        trainer.set_lr(trainer.lr_at(0, step))
    losses = trainer.train_step(batch, step)
    step += 1
    if step % 25 == 0:
        float(losses["t"])
float(losses["t"])
wall = time.perf_counter() - t0
psnr1 = val_psnr()
print(
    f"RESULT ray_batch={ray_batch} steps={steps} lr={lr} remat={remat} "
    f"gather={gather} warmup={warmup} f32={f32} "
    f"rays_seen={ray_batch * steps} "
    f"wall={wall:.1f}s psnr {psnr0:.2f} -> {psnr1:.2f}"
)
