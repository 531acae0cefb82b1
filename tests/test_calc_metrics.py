"""Hermetic map-reduce test for eval/calc_metrics.py (SURVEY.md §2.7).

Synthesizes an SRN test split plus a fake renders directory holding
known perturbations of the GT views, then checks that the map phase's
per-object metrics.txt and the reduce phase's all_metrics.txt equal the
same PSNR/SSIM computed directly with the package metric functions
(reference calc_metrics.py:186-251 map and :257-340 reduce).
"""

import importlib.util
import os
import sys

import imageio.v2 as imageio
import numpy as np
import pytest

from synth_data import make_srn_dataset

from pixelnerf_yolo_tpu.utils.metrics import psnr, ssim

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_calc_metrics(argv):
    sys.argv = ["calc_metrics.py"] + argv
    spec = importlib.util.spec_from_file_location(
        "cli_calc_metrics", os.path.join(REPO, "eval", "calc_metrics.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _read_kv(path):
    out = {}
    with open(path) as f:
        for line in f:
            k, v = line.strip().split()
            out[k] = float(v)
    return out


class TestCalcMetrics:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("calc_metrics")
        root = str(tmp / "spheres")
        make_srn_dataset(root, stage="test", n_objs=2, n_views=4,
                         img_size=16)
        data_root = root + "_test"
        render_root = str(tmp / "eval_out")
        rng = np.random.default_rng(5)
        expected = {}
        for obj in ("obj_000", "obj_001"):
            odir = os.path.join(render_root, obj)
            os.makedirs(odir)
            psnrs, ssims = [], []
            for v in (1, 2):
                gt = imageio.imread(
                    os.path.join(data_root, obj, "rgb", f"{v:06d}.png")
                )[..., :3]
                rend = np.clip(
                    gt.astype(np.int32)
                    + rng.integers(-12, 12, gt.shape), 0, 255
                ).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(odir, "{:06}.png".format(v)), rend
                )
                # a depth/compare variant that the map phase must skip
                imageio.imwrite(
                    os.path.join(odir, "{:06}_compare.png".format(v)),
                    np.concatenate([rend, gt], axis=1),
                )
                a = rend[..., :3] / 255.0
                b = gt[..., :3] / 255.0
                psnrs.append(psnr(a, b))
                ssims.append(ssim(a, b, multichannel=True, data_range=1))
            expected[obj] = (float(np.mean(psnrs)), float(np.mean(ssims)))
        return data_root, render_root, expected

    def test_map_writes_per_object_metrics(self, setup):
        data_root, render_root, expected = setup
        mod = _load_calc_metrics(
            ["-D", data_root, "-O", render_root, "-F", "srn", "--overwrite"]
        )
        mod.run_map()
        for obj, (e_psnr, e_ssim) in expected.items():
            got = _read_kv(os.path.join(render_root, obj, "metrics.txt"))
            assert got["psnr"] == pytest.approx(e_psnr, abs=1e-6)
            assert got["ssim"] == pytest.approx(e_ssim, abs=1e-6)
            assert "lpips" not in got  # no weights in this environment

    def test_reduce_aggregates(self, setup):
        data_root, render_root, expected = setup
        mod = _load_calc_metrics(
            ["-D", data_root, "-O", render_root, "-F", "srn",
             "--reduce_only"]
        )
        mod.run_reduce()
        got = _read_kv(os.path.join(render_root, "all_metrics.txt"))
        e_psnr = np.mean([v[0] for v in expected.values()])
        e_ssim = np.mean([v[1] for v in expected.values()])
        assert got["psnr"] == pytest.approx(e_psnr, abs=1e-6)
        assert got["ssim"] == pytest.approx(e_ssim, abs=1e-6)


class TestCalcMetricsMulticat:
    def test_multicat_reduce_per_category(self, tmp_path):
        """--multicat: renders named <cat>_<obj> match GT at
        <data>/<cat>/<obj>/rgb and all_metrics.txt gains per-category
        means (reference calc_metrics.py:257-340)."""
        rng = np.random.default_rng(9)
        data_root = str(tmp_path / "data")
        render_root = str(tmp_path / "eval_out")
        expected = {}
        for cat, obj in (("car", "obj_a"), ("car", "obj_b"),
                         ("chair", "obj_c")):
            gdir = os.path.join(data_root, cat, obj, "rgb")
            os.makedirs(gdir)
            rdir = os.path.join(render_root, f"{cat}_{obj}")
            os.makedirs(rdir)
            psnrs = []
            for v in range(2):
                gt = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
                imageio.imwrite(os.path.join(gdir, f"{v:06d}.png"), gt)
                rend = np.clip(
                    gt.astype(np.int32) + rng.integers(-10, 10, gt.shape),
                    0, 255,
                ).astype(np.uint8)
                imageio.imwrite(
                    os.path.join(rdir, "{:06}.png".format(v)), rend
                )
                psnrs.append(psnr(rend / 255.0, gt / 255.0))
            expected[(cat, obj)] = float(np.mean(psnrs))

        mod = _load_calc_metrics(
            ["-D", data_root, "-O", render_root, "-F", "srn",
             "--multicat", "--overwrite"]
        )
        mod.run_map()
        mod.run_reduce()
        got = _read_kv(os.path.join(render_root, "all_metrics.txt"))
        assert got["psnr"] == pytest.approx(
            np.mean(list(expected.values())), abs=1e-6
        )
        assert got["car.psnr"] == pytest.approx(
            np.mean([expected[("car", "obj_a")],
                     expected[("car", "obj_b")]]), abs=1e-6
        )
        assert got["chair.psnr"] == pytest.approx(
            expected[("chair", "obj_c")], abs=1e-6
        )
