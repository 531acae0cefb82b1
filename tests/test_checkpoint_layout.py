"""Pin the checkpoint FILE-NAME contract (reference layout).

The on-disk names are API surface shared by the trainer, the resume path,
and the convergence scripts: the reference's `save_weights(epochNum=...)`
writes `pixel_nerf_backup<epochNum>` as a COPY of the existing latest
(/root/reference/src/model/models.py:351-370), so the best-F1 save
(`epochNum="_best"`, train/trainlib/trainer.py:242-246) lands at
`pixel_nerf_backup_best` — NOT `pixel_nerf_best`.  A silent drift here
made the convergence scripts skip their best-checkpoint eval branch; this
module binds code and scripts to one name.
"""

import os
import os.path as osp
import types

import numpy as np
import pytest

from pixelnerf_yolo_tpu.train import checkpoints

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))


def _args(tmp_path):
    return types.SimpleNamespace(
        checkpoints_path=str(tmp_path / "checkpoints"),
        name="exp",
        resume=True,
    )


def _vars(seed=0):
    rng = np.random.RandomState(seed)
    return {"params": {"w": rng.randn(3, 2).astype(np.float32)}}


def test_latest_backup_and_best_names(tmp_path):
    args = _args(tmp_path)
    v1 = _vars(1)
    d = checkpoints.ckpt_dir(args)

    checkpoints.save_weights(args, v1)
    assert osp.exists(osp.join(d, "pixel_nerf_latest"))
    # atomic write: no .tmp residue
    assert not os.listdir(d) == [] and not any(
        f.endswith(".tmp") for f in os.listdir(d)
    )

    # a second plain save rolls the previous latest into pixel_nerf_backup
    v2 = _vars(2)
    checkpoints.save_weights(args, v2)
    assert osp.exists(osp.join(d, "pixel_nerf_backup"))

    # epoch-numbered backup: copy-only, latest untouched
    before = open(osp.join(d, "pixel_nerf_latest"), "rb").read()
    checkpoints.save_weights(args, _vars(3), epochNum="7")
    assert osp.exists(osp.join(d, "pixel_nerf_backup7"))
    assert open(osp.join(d, "pixel_nerf_latest"), "rb").read() == before
    assert (
        open(osp.join(d, "pixel_nerf_backup7"), "rb").read() == before
    ), "backup<N> must be a copy of the existing latest (reference semantics)"

    # the best-F1 save name the trainer uses (epochNum='_best')
    checkpoints.save_weights(args, _vars(4), epochNum="_best")
    assert osp.exists(osp.join(d, "pixel_nerf_backup_best"))
    assert not osp.exists(osp.join(d, "pixel_nerf_best"))


def test_init_names(tmp_path):
    args = _args(tmp_path)
    d = checkpoints.ckpt_dir(args)
    os.makedirs(d, exist_ok=True)
    # opt_init with no existing init: nothing saved (reference: only the
    # copy branch runs for epochNum == "" via torch.save gating)
    checkpoints.save_weights(args, _vars(), opt_init=True)
    assert osp.exists(osp.join(d, "pixel_nerf_init"))


def test_load_roundtrip(tmp_path):
    args = _args(tmp_path)
    v = _vars(5)
    checkpoints.save_weights(args, v)
    loaded = checkpoints.load_weights(args, _vars(0))
    np.testing.assert_array_equal(loaded["params"]["w"], v["params"]["w"])
    assert checkpoints.has_weights(args)


@pytest.mark.parametrize(
    "script",
    ["convergence_yolo.sh", "convergence_yolo2s.sh", "convergence_yolo3s.sh"],
)
def test_scripts_use_the_trainer_best_name(script):
    """The convergence scripts' best-F1 eval branch must key on the file
    the trainer actually writes."""
    text = open(osp.join(REPO, "scripts", script)).read()
    assert "pixel_nerf_backup_best" in text
    # no stale reference to the wrong name (word-boundary via quote/space)
    assert "pixel_nerf_best" not in text.replace("pixel_nerf_backup_best", "")
