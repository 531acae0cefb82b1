"""Mesh-sharded trainer updates: invariance across device counts.

The real trainers' jitted updates are sharded over a ('data', 'rays') mesh
(scenes/chunks on 'data', rays on 'rays') — the TPU-native replacement for
the reference's DataParallel-covered training forward
(/root/reference/src/render/nerf.py:360-377 used from YoloTrainer.py:157).
These tests verify the SAME update math on 1 vs 8 virtual devices: equal
losses and equal post-step parameters (up to reduction-order rounding).
"""

import argparse
import math

import numpy as np
import pytest

import jax

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel, make_train_mesh
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer

from synth_data import make_srn_dataset, make_yolo_dataset
from test_train_integration import (
    NERF_TRAIN_CONF,
    YOLO_TRAIN_CONF,
    make_args,
)


def _tree_allclose(a, b, rtol=1e-3, atol=2.5e-4):
    """Post-Adam-step parameter comparison.  The first Adam step moves each
    param by ~±lr (direction g/(|g|+eps)); reduction-order rounding across
    device counts can flip that direction where g ~ 0, so the bound is
    ~2*lr=2e-4 — gross sharding bugs show up as O(1) relative error."""
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol
        )


def _build_nerf_trainer(tmp, root, n_devices, batch_size):
    conf = parse_string(NERF_TRAIN_CONF)
    args = make_args(
        tmp, f"nerf_shard_{n_devices}", extra={"nviews": "2",
                                               "batch_size": batch_size},
    )
    dset, val_dset, _ = get_split_dataset("srn", root)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    mesh = make_train_mesh(n_devices=n_devices, batch_size=batch_size)
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [2]
    )
    return trainer, dset


def _build_yolo_trainer(tmp, root, n_devices, batch_size=1):
    conf = parse_string(YOLO_TRAIN_CONF)
    args = make_args(
        tmp, f"yolo_shard_{n_devices}_{batch_size}",
        extra={"batch_size": batch_size},
    )
    dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    mesh = make_train_mesh(n_devices=n_devices, batch_size=batch_size)
    render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
    trainer = make_trainer(
        args, conf, dset, val_dset, model, renderer, render_par, [3]
    )
    return trainer, dset


class TestNeRFShardingInvariance:
    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("nerf_shard")
        root = str(tmp / "data" / "cars")
        for stage in ("train", "val", "test"):
            make_srn_dataset(root, stage=stage, n_objs=2, n_views=6,
                             img_size=32)
        return tmp, root

    def test_loss_and_params_match_1_vs_8_devices(self, data_root):
        tmp, root = data_root
        assert len(jax.devices()) >= 8
        t1, dset = _build_nerf_trainer(tmp, root, 1, batch_size=2)
        t8, _ = _build_nerf_trainer(tmp, root, 8, batch_size=2)
        assert dict(t8.mesh.shape) == {"data": 2, "rays": 4}
        batch = next(iter(DataLoader(dset, batch_size=2, shuffle=False)))

        l1 = {k: float(v) for k, v in t1.train_step(batch, 0).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch, 0).items()}
        assert set(l1) == set(l8) == {"rc", "rf", "t"}
        for k in l1:
            assert math.isfinite(l1[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5)
        # post-Adam-step parameters identical up to reduction-order rounding
        _tree_allclose(t1.variables["params"], t8.variables["params"])

    def test_ragged_batch_pads_and_runs(self, data_root):
        """SB=1 batch on a data=2 mesh: scene padding + zero-weight rays."""
        tmp, root = data_root
        t8, dset = _build_nerf_trainer(tmp, root, 8, batch_size=2)
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))
        losses = t8.train_step(batch, 0)
        assert math.isfinite(float(losses["t"]))

    def test_pad_exceeding_ray_count_wraps(self, data_root):
        """ray_batch_size smaller than the pad multiple (ragged SB=1 on a
        (2,4) mesh raises the multiple to rays_n*data_n=8): pad indices
        must wrap instead of silently producing a short concat (r3
        advisor finding)."""
        tmp, root = data_root
        conf = parse_string(NERF_TRAIN_CONF)
        args = make_args(tmp, "nerf_shard_tinyray",
                         extra={"nviews": "2", "batch_size": 2,
                                "ray_batch_size": 3})
        dset, val_dset, _ = get_split_dataset("srn", root)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        mesh = make_train_mesh(n_devices=8, batch_size=2)
        render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, [2]
        )
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))
        losses = trainer.train_step(batch, 0)
        assert math.isfinite(float(losses["t"]))


class TestYOLOShardingInvariance:
    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("yolo_shard")
        root = make_yolo_dataset(str(tmp / "data"), n_scenes=2, n_views=4,
                                 img_size=64)
        return tmp, root

    def test_loss_and_params_match_1_vs_8_devices(self, data_root):
        tmp, root = data_root
        t1, dset = _build_yolo_trainer(tmp, root, 1)
        t8, _ = _build_yolo_trainer(tmp, root, 8)
        # batch_size=1 -> all 8 devices shard the ray axis
        assert dict(t8.mesh.shape) == {"data": 1, "rays": 8}
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))

        l1 = {k: float(v) for k, v in t1.train_step(batch).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch).items()}
        keys = {"t", "box_loss", "object_loss", "no_object_loss",
                "class_loss"}
        assert set(l1) == set(l8) == keys
        for k in keys:
            assert math.isfinite(l1[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5, atol=1e-7)
        _tree_allclose(t1.variables["params"], t8.variables["params"])

    def test_sharded_training_reduces_loss(self, data_root):
        tmp, root = data_root
        t8, dset = _build_yolo_trainer(tmp, root, 8)
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))
        losses0 = t8.train_step(batch)
        for _ in range(4):
            losses = t8.train_step(batch)
        assert float(losses["t"]) < float(losses0["t"])

    def test_scene_batch_2_matches_on_2x4_mesh(self, data_root):
        """SB=2 on a (2, 4) mesh: scenes shard the 'data' axis (the path
        the r2 driver artifact never executed with data > 1) and the
        update matches a single device bit-for-rounding."""
        tmp, root = data_root
        t1, dset = _build_yolo_trainer(tmp, root, 1, batch_size=2)
        t8, _ = _build_yolo_trainer(tmp, root, 8, batch_size=2)
        assert dict(t8.mesh.shape) == {"data": 2, "rays": 4}
        batch = next(iter(DataLoader(dset, batch_size=2, shuffle=False)))

        l1 = {k: float(v) for k, v in t1.train_step(batch).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch).items()}
        for k in l1:
            assert math.isfinite(l1[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5, atol=1e-7)
        _tree_allclose(t1.variables["params"], t8.variables["params"])

    def test_ragged_scene_batch_pads_and_runs(self, data_root):
        """SB=1 batch on a data=2 mesh: scene padding with all-ignore
        targets must keep the loss identical to the data=1 mesh."""
        tmp, root = data_root
        t1, dset = _build_yolo_trainer(tmp, root, 1)
        t8, _ = _build_yolo_trainer(tmp, root, 8, batch_size=2)
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))
        l1 = {k: float(v) for k, v in t1.train_step(batch).items()}
        l8 = {k: float(v) for k, v in t8.train_step(batch).items()}
        for k in l1:
            assert math.isfinite(l8[k])
            np.testing.assert_allclose(l1[k], l8[k], rtol=2e-5, atol=1e-7)
