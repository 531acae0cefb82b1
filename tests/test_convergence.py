"""Slow opt-in convergence test: the full train->render loop must learn
novel-view synthesis on a synthetic scene.

Run with PNY_RUN_SLOW=1 (about 7 minutes on CPU at 300 steps, which reach
PSNR 11.1 -> 21.6; on the real chip 800 steps at this recipe reached
PSNR 11.1 -> 26.4).

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
    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer

    root = str(tmp_path / "data" / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=1, n_views=8, img_size=32)

    conf = parse_string(NERF_TRAIN_CONF.replace("d_hidden = 64",
                                                "d_hidden = 128"))
    args = make_args(Path(tmp_path), "overfit",
                     extra={"nviews": "2", "ray_batch_size": 1024,
                            "lr": 5e-4, "no_bbox_step": 0})
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    render_par = bind_parallel(renderer, model, gpus=[0], want_weights=True)
    trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                           render_par, [2])
    batch = next(iter(DataLoader(dset, batch_size=1)))

    _, vals0 = trainer.vis_step(batch, 0, idx=0)
    for step in range(300):
        losses = trainer.train_step(batch, step)
    _, vals = trainer.vis_step(batch, 300, idx=0)

    # measured: loss 0.0099, psnr 11.15 -> 21.63 (comfortable margins below)
    assert losses["t"] < 0.03
    assert vals["psnr"] > vals0["psnr"] + 6, (vals0, vals)
    assert vals["psnr"] > 18.0
