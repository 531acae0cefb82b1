"""End-to-end eval.py CLI drives (hermetic, synthetic DVR data).

Covers the viewlist protocol (eval.py -L viewlist/src_dvr.txt semantics,
reference eval.py:155-165) and the --scale flag (GT resized consistently
with rays — deliberate divergence; the reference would shape-crash).
"""

import importlib.util
import math
import os
import sys
import textwrap

import numpy as np
import pytest

from synth_data import make_dvr_dataset

EVAL_CONF = textwrap.dedent(
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
                     n_blocks = 2
                     d_hidden = 32
                     combine_layer = 3
                     combine_type = average }
        mlp_fine { type = empty }
        encoder { backbone = resnet18
                  pretrained = False
                  num_layers = 2
                  index_padding = zeros }
    }
    renderer { type = nerf
               n_coarse = 64
               n_fine = 0
               n_fine_depth = 0
               depth_std = 0.01
               sched = []
               white_bkgd = True }
    loss { lambda_coarse = 1.0 }
    """
)


def _load_eval_main():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    spec = importlib.util.spec_from_file_location(
        "eval_cli_under_test", os.path.join(repo, "eval", "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dvr_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_cli")
    root = str(tmp / "dvr")
    for stage in ("train", "val", "test"):
        make_dvr_dataset(root, stage=stage, n_cats=1, n_objs=2, n_views=5,
                         img_size=16)
    conf_path = str(tmp / "eval.conf")
    with open(conf_path, "w") as f:
        f.write(EVAL_CONF)
    return tmp, root, conf_path


def _run_eval(tmp, root, conf_path, monkeypatch, extra, name):
    out_dir = str(tmp / ("out_" + name))
    monkeypatch.chdir(tmp)
    argv = [
        "eval.py", "-n", name, "-c", conf_path, "-D", root, "-F", "dvr",
        "--split", "test", "-O", out_dir, "--ray_batch_size", "512",
    ] + extra
    monkeypatch.setattr(sys, "argv", argv)
    _load_eval_main().main()
    return out_dir


class TestEvalCLI:
    def test_viewlist_protocol_end_to_end(self, dvr_root, monkeypatch):
        tmp, root, conf_path = dvr_root
        # viewlist lines: <category> <object> <source views...>
        viewlist = str(tmp / "src_test.txt")
        with open(viewlist, "w") as f:
            f.write("cat00 obj_000 1 3\n")
            f.write("cat00 obj_001 0 2\n")
        out = _run_eval(tmp, root, conf_path, monkeypatch,
                        ["-L", viewlist], "vl")
        finish = os.path.join(out, "finish.txt")
        assert os.path.exists(finish)
        lines = [ln.split() for ln in open(finish)]
        assert {ln[0] for ln in lines} == {"obj_000", "obj_001"}
        for ln in lines:
            assert math.isfinite(float(ln[1]))  # psnr
            assert math.isfinite(float(ln[2]))  # ssim
        # 5 views - 2 sources = 3 rendered targets per object
        pngs = [f for f in os.listdir(os.path.join(out, "obj_000"))
                if f.endswith(".png")]
        assert len(pngs) == 3

    def test_scale_resizes_gt_consistently(self, dvr_root, monkeypatch):
        tmp, root, conf_path = dvr_root
        out = _run_eval(tmp, root, conf_path, monkeypatch,
                        ["-P", "0", "--scale", "0.5"], "sc")
        import imageio.v2 as imageio

        img = imageio.imread(os.path.join(out, "obj_000", "000001.png"))
        assert img.shape[:2] == (8, 8)  # 16 * 0.5
        lines = [ln.split() for ln in
                 open(os.path.join(out, "finish.txt"))]
        assert all(math.isfinite(float(ln[1])) for ln in lines)

    def test_coarse_depth_and_include_src_flags(self, dvr_root, monkeypatch):
        """--coarse (drops the fine MLP, forces 64c/128f — eval.py:142-148),
        --write_depth (EXR per view, raw .npy when the cv2 build lacks the
        OpenEXR codec, plus a normalized-depth PNG), and --include_src
        (source views also rendered/compared)."""
        tmp, root, conf_path = dvr_root
        out = _run_eval(
            tmp, root, conf_path, monkeypatch,
            ["-P", "0", "--coarse", "--write_depth", "--include_src"],
            "cds",
        )
        obj_dir = os.path.join(out, "obj_000")
        files = os.listdir(obj_dir)
        # include_src: ALL 5 views rendered (not 5 - 1 sources)
        renders = [f for f in files
                   if f.endswith(".png") and "_" not in f]
        assert len(renders) == 5
        depth_raw = [f for f in files
                     if f.endswith(("_depth.exr", "_depth.npy"))]
        assert len(depth_raw) == 5
        assert len([f for f in files if f.endswith("_depth_norm.png")]) == 5
        lines = [ln.split() for ln in open(os.path.join(out, "finish.txt"))]
        assert all(math.isfinite(float(ln[1])) for ln in lines)
