"""End-to-end drives of the remaining eval CLIs on synthetic data.

Covers eval_approx.py (fast dev eval), gen_video.py (orbit trajectory),
gen_images_yolo.py (interactive threshold loop), and eval_real.py (single
real photo orbit, using the shipped input/ samples) — SURVEY.md §2.7.
"""

import builtins
import importlib.util
import os
import sys

import numpy as np
import pytest

from synth_data import make_srn_dataset, make_yolo_dataset
from test_eval_cli import EVAL_CONF
from test_train_integration import YOLO_TRAIN_CONF

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load(script):
    spec = importlib.util.spec_from_file_location(
        "cli_" + script.replace("/", "_").replace(".py", ""),
        os.path.join(REPO, script),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def srn_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_more")
    root = str(tmp / "data" / "cars")
    for stage in ("train", "val", "test"):
        make_srn_dataset(root, stage=stage, n_objs=2, n_views=5, img_size=16)
    conf_path = str(tmp / "eval.conf")
    with open(conf_path, "w") as f:
        f.write(EVAL_CONF)
    return tmp, root, conf_path


class TestEvalApprox:
    def test_runs_and_reports_metrics(self, srn_root, monkeypatch, capsys):
        tmp, root, conf_path = srn_root
        monkeypatch.chdir(tmp)
        monkeypatch.setattr(sys, "argv", [
            "eval_approx.py", "-n", "approx", "-c", conf_path, "-D", root,
            "-F", "srn", "--split", "val", "-P", "0",
            "--ray_batch_size", "256", "--batch_size", "2",
        ])
        _load("eval/eval_approx.py").main()
        out = capsys.readouterr().out
        assert "psnr" in out.lower()


class TestGenVideo:
    def test_writes_orbit_video_and_contact_sheet(self, srn_root,
                                                  monkeypatch):
        tmp, root, conf_path = srn_root
        monkeypatch.chdir(tmp)
        monkeypatch.setattr(sys, "argv", [
            "gen_video.py", "-n", "vid", "-c", conf_path, "-D", root,
            "-F", "srn", "-P", "0", "--num_views", "4",
            "--ray_batch_size", "512", "--radius", "1.3",
        ])
        _load("eval/gen_video.py").main()
        vis_dir = os.path.join(str(tmp), "visuals", "vid")
        files = os.listdir(vis_dir)
        assert any(f.endswith((".mp4", ".gif")) for f in files)
        assert any(f.endswith("_view.jpg") for f in files)


class TestGenImagesYolo:
    def test_threshold_loop_writes_panels(self, tmp_path, monkeypatch):
        from pixelnerf_yolo_tpu.config.hocon import parse_string  # noqa: F401

        root = make_yolo_dataset(str(tmp_path / "data"), n_scenes=2,
                                 n_views=4, img_size=64)
        conf_path = str(tmp_path / "yolo.conf")
        with open(conf_path, "w") as f:
            f.write(YOLO_TRAIN_CONF)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "gen_images_yolo.py", "-n", "giy", "-c", conf_path, "-D", root,
            "-F", "yolo", "-V", "3", "-P", "0 2 3", "--dest", "0",
        ])
        answers = iter(["0.45", "0.75", "q"])  # one round, then clean exit
        monkeypatch.setattr(builtins, "input", lambda *a: next(answers))
        _load("eval/gen_images_yolo.py").main()
        vis_dir = os.path.join(str(tmp_path), "visuals", "yolo_vis")
        pngs = [f for f in os.listdir(vis_dir) if f.endswith(".png")]
        assert len(pngs) == 1


class TestEvalReal:
    def test_shipped_input_sample_renders_orbit(self, srn_root, monkeypatch):
        tmp, root, conf_path = srn_root
        sample = os.path.join(REPO, "input", "toyota_normalize.png")
        assert os.path.exists(sample), "shipped eval_real input missing"
        monkeypatch.chdir(tmp)
        out_dir = str(tmp / "real_out")
        monkeypatch.setattr(sys, "argv", [
            "eval_real.py", "-n", "real", "-c", conf_path,
            "--input", sample, "--output", out_dir, "--size", "16",
            "--out_size", "16", "--num_views", "3", "--gif",
            "--ray_batch_size", "512",
        ])
        _load("eval/eval_real.py").main()
        files = os.listdir(out_dir)
        assert any("toyota" in f for f in files)


class TestGenVideoDTU:
    """BASELINE config 5: DTU-format trajectory render (principal point +
    (fx, fy) focal path through gen_video)."""

    def test_dtu_orbit(self, tmp_path, monkeypatch):
        from synth_data import make_dvr_dataset

        root = str(tmp_path / "dtu")
        for stage in ("train", "val", "test"):
            make_dvr_dataset(root, stage=stage, sub_format="dtu", n_cats=1,
                             n_objs=1, n_views=5, img_size=16)
        conf_path = str(tmp_path / "eval.conf")
        with open(conf_path, "w") as f:
            f.write(EVAL_CONF)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "gen_video.py", "-n", "dtuvid", "-c", conf_path, "-D", root,
            "-F", "dvr_dtu", "-P", "0", "--num_views", "3",
            "--ray_batch_size", "512", "--radius", "1.0", "--split", "test",
        ])
        _load("eval/gen_video.py").main()
        vis_dir = os.path.join(str(tmp_path), "visuals", "dtuvid")
        assert any(f.endswith((".mp4", ".gif"))
                   for f in os.listdir(vis_dir))

    def test_dtu_spline_trajectory(self, tmp_path, monkeypatch):
        """--dtu_trajectory: the IDR fly-through the reference ships dead
        (/root/reference/eval/gen_video.py:131-169 under `if False:`),
        live here.  5 requested views -> 6 spline frames."""
        from synth_data import make_dvr_dataset

        root = str(tmp_path / "dtu")
        for stage in ("train", "val", "test"):
            make_dvr_dataset(root, stage=stage, sub_format="dtu", n_cats=1,
                             n_objs=1, n_views=5, img_size=16)
        conf_path = str(tmp_path / "eval.conf")
        with open(conf_path, "w") as f:
            f.write(EVAL_CONF)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "gen_video.py", "-n", "dtuspline", "-c", conf_path, "-D", root,
            "-F", "dvr_dtu", "-P", "0", "--num_views", "5",
            "--ray_batch_size", "512", "--split", "test",
            "--dtu_trajectory",
        ])
        _load("eval/gen_video.py").main()
        vis_dir = os.path.join(str(tmp_path), "visuals", "dtuspline")
        assert any(f.endswith((".mp4", ".gif"))
                   for f in os.listdir(vis_dir))


class TestEvalYolo:
    def test_prints_metric_table_with_map(self, tmp_path, monkeypatch,
                                          capsys):
        """eval_yolo.py end-to-end on a synthetic set with fresh weights:
        must report the reference's P/R/F1 protocol plus the mAP@0.5
        extension from one rendering pass (SURVEY.md §2.7, §3.4)."""
        root = make_yolo_dataset(str(tmp_path / "data"), n_scenes=2,
                                 n_views=4, img_size=64)
        conf_path = str(tmp_path / "yolo.conf")
        with open(conf_path, "w") as f:
            f.write(YOLO_TRAIN_CONF)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "eval_yolo.py", "-n", "evy", "-c", conf_path, "-D", root,
            "-F", "yolo", "-V", "3",
        ])
        _load("eval/eval_yolo.py").main()
        out = capsys.readouterr().out
        assert "Precision\tRecall\tF1\tmAP@0.5" in out
        table_line = out.split("Precision\tRecall\tF1\tmAP@0.5\n")[1]
        vals = table_line.split("\n")[0].split("\t")
        assert len(vals) == 4
        for v in vals:
            v = float(v)
            assert np.isfinite(v) and 0.0 <= v <= 1.0

    def test_calibrate_scales_prints_grid(self, tmp_path, monkeypatch,
                                          capsys):
        """--calibrate_scales renders once and reports per-combo F1/mAP
        plus the best per-scale thresholds (r5 calibration path)."""
        root = make_yolo_dataset(str(tmp_path / "data"), n_scenes=2,
                                 n_views=4, img_size=64)
        conf_path = str(tmp_path / "yolo.conf")
        with open(conf_path, "w") as f:
            f.write(YOLO_TRAIN_CONF)
        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "eval_yolo.py", "-n", "evycal", "-c", conf_path, "-D", root,
            "-F", "yolo", "-V", "3",
            "--calibrate_scales", "0.45,0.7",
        ])
        _load("eval/eval_yolo.py").main()
        out = capsys.readouterr().out
        lines = out.splitlines()
        hdr = next(
            i for i, ln in enumerate(lines) if ln.startswith("taus\t")
        )
        # single-scale conf x 2 grid values = 2 combos
        rows = []
        for ln in lines[hdr + 1:]:
            if not ln or "\t" not in ln:
                break
            rows.append(ln)
        assert len(rows) == 2, rows
        assert "best per-scale thresholds:" in out
        assert "yolo.nms_threshold_per_scale" in out
