"""End-to-end trainer integration on synthetic datasets (hermetic)."""

import argparse
import math
import os
import textwrap

import numpy as np
import pytest

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel, make_mesh
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.train import make_trainer

from synth_data import make_srn_dataset, make_yolo_dataset

YOLO_TRAIN_CONF = textwrap.dedent(
    """
    model {
        use_encoder = True
        use_xyz = True
        use_code = True
        code { num_freqs = 6
               freq_factor = 1.5
               include_input = True }
        use_viewdirs = True
        use_code_viewdirs = False
        mlp_coarse { type = resnet
                     n_blocks = 5
                     d_hidden = 64
                     combine_layer = 3
                     combine_type = average
                     d_out = 7
                     num_scales = 1
                     num_anchors_per_scale = 3
                     yolo = True }
        mlp_fine { type = empty }
        encoder { backbone = resnet18
                  pretrained = False
                  num_layers = 2
                  index_padding = zeros }
    }
    renderer { type = yolo
               n_coarse = 16
               n_fine = 0
               white_bkgd = False
               eval_batch_size = 128 }
    loss { lambda_coarse = 1.0 }
    train { print_interval = 2
            save_interval = 50
            backup_interval = 1000
            vis_interval = 100
            eval_interval = 50
            metric_interval = 20
            accu_grad = 1
            num_epoch_repeats = 1 }
    yolo {
        image_scale = [0.5, 0.5]
        cell_sizes = [32]
        anchors = [
            [[0.02, 0.03], [0.04, 0.07], [0.08, 0.06]],
            [[0.07, 0.15], [0.15, 0.11], [0.14, 0.29]],
            [[0.28, 0.22], [0.38, 0.48], [0.9, 0.78]]
        ]
        ignore_iou_thresh = 0.5
        ray_batch_size = 4
        weights { box_loss = 1
                  object_loss = 20
                  no_object_loss = 1
                  class_loss = 1 }
        early_restart = False
        nms_iou_threshold = 0.75
        nms_threshold = 0.45
        metric_views = [[0,2,3]]
        match_iou_threshold = 0.2
    }
    """
)

NERF_TRAIN_CONF = textwrap.dedent(
    """
    model {
        use_encoder = True
        use_xyz = True
        use_code = True
        code { num_freqs = 6
               freq_factor = 1.5
               include_input = True }
        use_viewdirs = True
        use_code_viewdirs = False
        mlp_coarse { type = resnet
                     n_blocks = 5
                     d_hidden = 64
                     combine_layer = 3
                     combine_type = average }
        mlp_fine { type = resnet
                   n_blocks = 5
                   d_hidden = 64
                   combine_layer = 3
                   combine_type = average }
        encoder { backbone = resnet18
                  pretrained = False
                  num_layers = 2
                  index_padding = zeros }
    }
    renderer { type = nerf
               n_coarse = 8
               n_fine = 4
               n_fine_depth = 2
               depth_std = 0.01
               sched = []
               white_bkgd = True }
    loss {
        rgb { use_l1 = False }
        rgb_fine { use_l1 = False }
        alpha { lambda_alpha = 0.0
                clamp_alpha = 100
                init_epoch = 5 }
        lambda_coarse = 1.0
        lambda_fine = 1.0
    }
    train { print_interval = 2
            save_interval = 50
            backup_interval = 1000
            vis_interval = 100
            eval_interval = 50
            metric_interval = 20
            accu_grad = 1
            num_epoch_repeats = 1 }
    """
)


def make_args(tmp_path, name, extra=None):
    args = argparse.Namespace(
        name=name,
        resume=False,
        gpu_id=[0],
        logs_path=str(tmp_path / "logs"),
        checkpoints_path=str(tmp_path / "checkpoints"),
        visual_path=str(tmp_path / "visuals"),
        epochs=1,
        lr=1e-4,
        gamma=1.0,
        ray_batch_size=32,
        batch_size=1,
        nviews="3",
        freeze_enc=None,
        no_bbox_step=100000,
        fixed_test=None,
        seed=0,
    )
    os.makedirs(os.path.join(args.checkpoints_path, name), exist_ok=True)
    os.makedirs(os.path.join(args.visual_path, name), exist_ok=True)
    os.makedirs(args.logs_path, exist_ok=True)
    if extra:
        for k, v in extra.items():
            setattr(args, k, v)
    return args


class TestYoloTraining:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("yolo_train")
        root = make_yolo_dataset(str(tmp / "data"), n_scenes=2, n_views=4,
                                 img_size=64)
        conf = parse_string(YOLO_TRAIN_CONF)
        args = make_args(tmp, "yolo_test")
        dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=args.gpu_id)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, [3]
        )
        loader = DataLoader(dset, batch_size=1, shuffle=False)
        return trainer, loader, args

    def test_train_steps_decrease_loss(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        losses0 = trainer.train_step(batch)
        assert set(losses0.keys()) == {
            "t", "box_loss", "object_loss", "no_object_loss", "class_loss"
        }
        assert math.isfinite(losses0["t"])
        for _ in range(4):
            losses = trainer.train_step(batch)
        assert math.isfinite(losses["t"])
        # same batch repeatedly: loss must drop
        assert losses["t"] < losses0["t"]

    def test_eval_step_does_not_change_params(self, setup):
        import jax

        trainer, loader, args = setup
        batch = next(iter(loader))
        params_before = jax.tree.map(
            lambda x: np.asarray(x).copy(), trainer.variables["params"]
        )
        losses = trainer.eval_step(batch)
        assert math.isfinite(losses["t"])
        leaves_b = jax.tree.leaves(params_before)
        leaves_a = jax.tree.leaves(trainer.variables["params"])
        for b, a in zip(leaves_b, leaves_a):
            np.testing.assert_array_equal(b, np.asarray(a))

    def test_vis_and_metric_steps(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        gt, pred = trainer.vis_step(batch, idx=0, srcs=np.array([0, 2, 3]),
                                    dest=0, only_bbox=True)
        assert isinstance(gt, list) and isinstance(pred, list)
        assert len(gt) > 0 and len(pred) > 0
        assert len(gt[0]) == 6

        vis, _ = trainer.vis_step(batch, idx=0, srcs=np.array([0, 2, 3]),
                                  dest=0)
        assert vis is not None and vis.ndim == 3  # hstacked panel

        p, r, f1 = trainer.metric_step(loader)
        assert 0 <= p <= 1 and 0 <= r <= 1 and 0 <= f1 <= 1

    def test_metric_and_map_step_matches_separate_calls(self, setup):
        """The single-render combined step must report exactly what the
        two separate (double-rendering) steps report."""
        trainer, loader, args = setup
        f1_sep = trainer.metric_step(loader)
        map_sep = trainer.map_step(loader, iou_threshold=0.5)
        f1_comb, map_comb = trainer.metric_and_map_step(
            loader, iou_threshold=0.5
        )
        assert f1_comb == f1_sep
        np.testing.assert_allclose(map_comb[0], map_sep[0], atol=1e-12)
        assert map_comb[1].keys() == map_sep[1].keys()

    def test_calibrate_scales_identity_combo_matches_metric_step(self, setup):
        """A single-combo grid at the global nms_threshold is the
        identity calibration: the pre-filter drops exactly the boxes NMS
        would drop anyway, so F1 and mAP must equal the standard steps'
        (host matching; host==device is asserted separately)."""
        trainer, loader, args = setup
        results, best = trainer.calibrate_scales(loader, [0.45])
        assert len(results) == 1 and best is results[0]
        assert best["taus"] == (0.45,)
        trainer.use_host_nms = True
        try:
            p, r, f1 = trainer.metric_step(loader)
        finally:
            trainer.use_host_nms = False
        map50, per_class = trainer.map_step(loader, iou_threshold=0.5)
        assert best["f1"] == f1
        assert best["precision"] == p and best["recall"] == r
        np.testing.assert_allclose(best["map50"], map50, atol=1e-12)

    def test_per_scale_threshold_filters_decodes(self, setup):
        """yolo.nms_threshold_per_scale prunes each scale's boxes before
        NMS: tau=1.01 must leave no predicted boxes."""
        trainer, loader, args = setup
        batch = next(iter(loader))
        kw = dict(idx=0, srcs=np.array([0, 2, 3]), dest=0, only_bbox=True)
        _, pred_before = trainer.vis_step(batch, **kw)
        assert len(pred_before) > 0
        assert trainer.nms_threshold_per_scale is None
        trainer.nms_threshold_per_scale = [1.01]
        try:
            _, pred_after = trainer.vis_step(batch, **kw)
        finally:
            trainer.nms_threshold_per_scale = None
        assert pred_after == []

    def test_metric_step_device_nms_matches_host(self, setup):
        """Default device NMS metric path == --host_nms reference path on
        the synthetic protocol thresholds."""
        trainer, loader, args = setup
        assert not trainer.use_host_nms  # device path is the default
        dev = trainer.metric_step(loader)
        trainer.use_host_nms = True
        try:
            host = trainer.metric_step(loader)
        finally:
            trainer.use_host_nms = False
        assert dev == host

    def test_checkpoint_roundtrip(self, setup):
        import jax

        trainer, loader, args = setup
        trainer.save_model_state()
        from pixelnerf_yolo_tpu.train import checkpoints

        args2 = argparse.Namespace(**vars(args))
        args2.resume = True
        loaded = checkpoints.load_weights(args2, trainer.variables)
        for a, b in zip(
            jax.tree.leaves(loaded), jax.tree.leaves(trainer.variables)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNeRFTraining:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("nerf_train")
        root = str(tmp / "data" / "cars")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        for stage in ("train", "val", "test"):
            make_srn_dataset(root, stage=stage, n_objs=2, n_views=6,
                             img_size=32)
        conf = parse_string(NERF_TRAIN_CONF)
        args = make_args(tmp, "nerf_test", extra={"nviews": "2"})
        dset, val_dset, _ = get_split_dataset("srn", root)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=args.gpu_id,
                                   want_weights=True)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, [2]
        )
        loader = DataLoader(dset, batch_size=1, shuffle=False)
        return trainer, loader, args

    def test_train_steps_decrease_loss(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        losses0 = trainer.train_step(batch, 0)
        assert {"rc", "rf", "t"} == set(losses0.keys())
        assert math.isfinite(losses0["t"])
        for i in range(4):
            losses = trainer.train_step(batch, i + 1)
        assert losses["t"] < losses0["t"]

    def test_vis_step(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        vis, vals = trainer.vis_step(batch, 0, idx=0)
        assert vis is not None
        assert "psnr" in vals and math.isfinite(vals["psnr"])

    def test_dtu_principal_point_path(self, tmp_path):
        """DTU-format data carries focal (fx, fy) and a principal point c.
        A squeezed (2,) focal must not be misread as two per-scene scalars
        in vis_step (regression: broadcast crash at pixelnerf.py uv scale).
        """
        from synth_data import make_dvr_dataset

        root = str(tmp_path / "data" / "dtu")
        for stage in ("train", "val", "test"):
            make_dvr_dataset(root, stage=stage, sub_format="dtu", n_cats=1,
                             n_objs=2, n_views=6, img_size=32)
        conf = parse_string(NERF_TRAIN_CONF)
        args = make_args(tmp_path, "dtu", extra={"nviews": "2",
                                                 "no_bbox_step": 0})
        dset, val_dset, _ = get_split_dataset("dvr_dtu", root)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=[0],
                                   want_weights=True)
        trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                               render_par, [2])
        batch = next(iter(DataLoader(dset, batch_size=2)))
        losses = trainer.train_step(batch, 0)
        assert math.isfinite(float(losses["t"]))
        vis, vals = trainer.vis_step(batch, 0, idx=0)
        assert vis is not None and math.isfinite(vals["psnr"])

    def test_freeze_enc_freezes_encoder(self, tmp_path):
        """--freeze_enc parity (reference train/train.py:70-72): encoder
        params AND BN running stats must not change; field params must."""
        import jax

        root = str(tmp_path / "data" / "cars")
        for stage in ("train", "val", "test"):
            make_srn_dataset(root, stage=stage, n_objs=1, n_views=4,
                             img_size=32)
        conf = parse_string(NERF_TRAIN_CONF)
        args = make_args(tmp_path, "frozen", extra={"nviews": "2"})
        dset, val_dset, _ = get_split_dataset("srn", root)
        model = make_model(conf.get_config("model"), stop_encoder_grad=True)
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=[0])
        trainer = make_trainer(args, conf, dset, val_dset, model, renderer,
                               render_par, [2])
        batch = next(iter(DataLoader(dset, batch_size=1)))
        enc0 = jax.tree.map(np.array, trainer.variables["params"]["encoder"])
        bn0 = jax.tree.map(
            np.array, trainer.variables["batch_stats"]["encoder"]
        )
        mlp0 = jax.tree.map(
            np.array, trainer.variables["params"]["mlp_coarse"]
        )
        for step in range(3):
            trainer.train_step(batch, step)
        for a, b in zip(
            jax.tree.leaves(enc0),
            jax.tree.leaves(trainer.variables["params"]["encoder"]),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(bn0),
            jax.tree.leaves(trainer.variables["batch_stats"]["encoder"]),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))
        mlp_changed = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(mlp0),
                jax.tree.leaves(trainer.variables["params"]["mlp_coarse"]),
            )
        )
        assert mlp_changed


class TestYoloMultiScale:
    """2-scale YOLO end-to-end (the reference supports cell_sizes lists,
    conf/exp/yolo.conf ships 3 anchor scales; everything above num_scales=1
    — per-scale ray gen, chunk_anchors indexing, per-scale grid targets,
    scale-looped metric decode — was previously untested)."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("yolo_ms")
        root = make_yolo_dataset(str(tmp / "data"), n_scenes=2, n_views=4,
                                 img_size=64)
        conf = parse_string(YOLO_TRAIN_CONF)
        conf.put("model.mlp_coarse.num_scales", 2)
        conf.put("yolo.cell_sizes", [32, 16])
        conf.put("yolo.image_scale", [1.0, 1.0])  # grids 2x2 and 4x4
        args = make_args(tmp, "yolo_ms_test")
        dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=args.gpu_id)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, [3]
        )
        loader = DataLoader(dset, batch_size=1, shuffle=False)
        return trainer, loader, args

    def test_dataset_emits_two_scales(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        bboxes = batch["bboxes"]
        # per view: one target tensor per scale with the scaled grids
        assert len(bboxes[0]) == 2
        assert bboxes[0][0].shape[1:3] == (2, 2)   # 64 / 32
        assert bboxes[0][1].shape[1:3] == (4, 4)   # 64 / 16
        assert bboxes[0][0].shape[3:] == (3, 6)

    def test_train_step_decreases_loss_across_scales(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        losses0 = trainer.train_step(batch)
        assert math.isfinite(losses0["t"])
        for _ in range(4):
            losses = trainer.train_step(batch)
        assert losses["t"] < losses0["t"]

    def test_metric_and_map_run_on_two_scales(self, setup):
        trainer, loader, args = setup
        (p, r, f1), (map50, per_class) = trainer.metric_and_map_step(
            loader, iou_threshold=0.5
        )
        assert 0 <= p <= 1 and 0 <= r <= 1 and 0 <= f1 <= 1
        assert 0.0 <= map50 <= 1.0

    def test_cross_scale_nms_knob(self, setup):
        """yolo.cross_scale_nms_iou: off by default; when set, the
        prediction box list out of vis_step is the suppressed one (never
        longer than the plain flatten)."""
        trainer, loader, args = setup
        assert trainer.cross_scale_nms_iou == 0.0  # default off
        batch = next(iter(loader))
        old = trainer.cross_scale_nms_iou
        try:
            trainer.cross_scale_nms_iou = 0.0
            _, pred_off = trainer.vis_step(
                batch, idx=0, srcs=[0, 1, 2], dest=0, only_bbox=True
            )
            trainer.cross_scale_nms_iou = 0.35
            _, pred_on = trainer.vis_step(
                batch, idx=0, srcs=[0, 1, 2], dest=0, only_bbox=True
            )
        finally:
            trainer.cross_scale_nms_iou = old
        assert len(pred_on) <= len(pred_off)
        # the shipped 2-scale conf carries the knob
        import os

        from pixelnerf_yolo_tpu.config.hocon import parse_file

        conf_path = os.path.join(
            os.path.dirname(__file__), "..", "conf", "exp", "yolo_2scale.conf"
        )
        conf2s = parse_file(conf_path)
        assert conf2s.get_float("yolo.cross_scale_nms_iou", 0.0) == 0.35


class TestYolo3Scale:
    """Full 3-scale YOLO (every row of the reference anchor table,
    conf/exp/yolo_3scale.conf): per-scale targets at 32/16/8px cells,
    train step, and the scale-looped metric all run end-to-end."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("yolo_3s")
        root = make_yolo_dataset(str(tmp / "data"), n_scenes=2, n_views=4,
                                 img_size=64)
        conf = parse_string(YOLO_TRAIN_CONF)
        conf.put("model.mlp_coarse.num_scales", 3)
        conf.put("yolo.cell_sizes", [32, 16, 8])
        conf.put("yolo.image_scale", [1.0, 1.0])  # grids 2x2, 4x4, 8x8
        args = make_args(tmp, "yolo_3s_test")
        dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        render_par = bind_parallel(renderer, model, gpus=args.gpu_id)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, [3]
        )
        loader = DataLoader(dset, batch_size=1, shuffle=False)
        return trainer, loader, args

    def test_dataset_emits_three_scales(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        bboxes = batch["bboxes"]
        assert len(bboxes[0]) == 3
        assert bboxes[0][0].shape[1:3] == (2, 2)   # 64 / 32
        assert bboxes[0][1].shape[1:3] == (4, 4)   # 64 / 16
        assert bboxes[0][2].shape[1:3] == (8, 8)   # 64 / 8
        assert all(b.shape[3:] == (3, 6) for b in bboxes[0])

    def test_train_step_decreases_loss(self, setup):
        trainer, loader, args = setup
        batch = next(iter(loader))
        losses0 = trainer.train_step(batch)
        assert math.isfinite(losses0["t"])
        for _ in range(4):
            losses = trainer.train_step(batch)
        assert losses["t"] < losses0["t"]

    def test_metric_runs_on_three_scales(self, setup):
        trainer, loader, args = setup
        (p, r, f1), (map50, per_class) = trainer.metric_and_map_step(
            loader, iou_threshold=0.5
        )
        assert 0 <= p <= 1 and 0 <= r <= 1 and 0 <= f1 <= 1
        assert 0.0 <= map50 <= 1.0

    def test_shipped_conf_parses(self):
        import os

        from pixelnerf_yolo_tpu.config.hocon import parse_file

        conf_path = os.path.join(
            os.path.dirname(__file__), "..", "conf", "exp", "yolo_3scale.conf"
        )
        conf3s = parse_file(conf_path)
        assert conf3s.get_list("yolo.cell_sizes") == [32, 16, 8]
        assert conf3s.get_int("model.mlp_coarse.num_scales") == 3
        assert len(conf3s.get_list("yolo.anchors")) == 3
        assert conf3s.get_float("yolo.cross_scale_nms_iou", 0.0) == 0.35
