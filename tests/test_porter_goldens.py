"""Golden pins for the three weight porters (VERDICT r3 #8).

torchvision / lpips / detectron2 are not installable here, so the real
checkpoints have never flowed through scripts/port_torchvision.py,
port_lpips.py, port_detectron2.py.  These tests freeze each porter's
OUTPUT CONTRACT against shape-faithful fake state dicts whose values are
a deterministic function of the tensor NAME: the key set, shapes, dtypes
and a path-weighted value checksum are pinned, so any silent key-map
drift (a renamed layer, a swapped mapping, a transposition added or
dropped) changes the checksum and fails loudly — a future real-weight
port can then trust the map.

Reference provenance of the three checkpoints:
  * torchvision resnet34 ImageNet  (/root/reference/src/model/encoder.py:60-66)
  * lpips VGG16 + linear heads     (/root/reference/eval/calc_metrics.py:186)
  * detectron2 PointRend R50-FPN   (/root/reference/scripts/preproc.py:19-29)
"""

import importlib.util
import os
import sys
import zlib

import numpy as np
import pytest

import jax.numpy as jnp

from pixelnerf_yolo_tpu.nn.lpips import (
    VGG16_SLICES,
    load_lpips,
    lpips_distance,
    port_lpips_state_dict,
)
from pixelnerf_yolo_tpu.nn.pretrained import save_backbone_npz
from pixelnerf_yolo_tpu.nn.resnet import port_torch_state_dict
from pixelnerf_yolo_tpu.segment.port import (
    port_detectron2_state_dict,
    random_params,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def det_array(name: str, shape) -> np.ndarray:
    """Deterministic fake tensor keyed by its (reference) layer name —
    two different tensors never share values, so a key-map swap moves
    the checksum."""
    seed = zlib.crc32(name.encode())
    r = np.random.default_rng(seed)
    return (r.standard_normal(shape) * 0.05).astype(np.float32)


def tree_checksum(tree, prefix="") -> float:
    """Path-weighted mean over all leaves: permuting which tensor lands
    at which path changes the sum (a plain global sum would not)."""
    total = 0.0
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            total += tree_checksum(v, prefix + k + "/")
        else:
            w = (zlib.crc32((prefix + k).encode()) % 1000003) / 1000003.0
            total += w * float(np.mean(np.asarray(v, np.float64)))
    return total


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# torchvision resnet34 porter
# ---------------------------------------------------------------------------

RESNET34_STAGES = [3, 4, 6, 3]
STAGE_WIDTHS = [64, 128, 256, 512]


def synth_resnet34_state_dict() -> dict:
    """Torchvision-exact resnet34 state_dict names/shapes (incl. the fc
    head and num_batches_tracked buffers the porter must drop)."""
    sd = {}

    def bn(prefix, c):
        for p in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{p}"] = det_array(f"{prefix}.{p}", (c,))
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(7, np.int64)

    sd["conv1.weight"] = det_array("conv1.weight", (64, 3, 7, 7))
    bn("bn1", 64)
    c_in = 64
    for stage, (n_blocks, width) in enumerate(
        zip(RESNET34_STAGES, STAGE_WIDTHS), start=1
    ):
        for b in range(n_blocks):
            pre = f"layer{stage}.{b}"
            first_in = c_in if b == 0 else width
            sd[pre + ".conv1.weight"] = det_array(
                pre + ".conv1.weight", (width, first_in, 3, 3)
            )
            sd[pre + ".conv2.weight"] = det_array(
                pre + ".conv2.weight", (width, width, 3, 3)
            )
            bn(pre + ".bn1", width)
            bn(pre + ".bn2", width)
            if b == 0 and first_in != width:
                sd[pre + ".downsample.0.weight"] = det_array(
                    pre + ".downsample.0.weight", (width, first_in, 1, 1)
                )
                bn(pre + ".downsample.1", width)
        c_in = width
    sd["fc.weight"] = det_array("fc.weight", (1000, 512))
    sd["fc.bias"] = det_array("fc.bias", (1000,))
    return sd


class TestTorchvisionPorterGolden:
    def test_npz_key_set_and_dtype(self, tmp_path):
        sd = synth_resnet34_state_dict()
        path = str(tmp_path / "resnet34_imagenet.npz")
        save_backbone_npz(sd, path)
        with np.load(path) as z:
            keys = set(z.files)
            dtypes = {k: z[k].dtype for k in z.files}
        # int64 buffers (num_batches_tracked) must be dropped, all float
        # tensors kept verbatim under their torchvision names
        expect = {k for k, v in sd.items() if v.dtype != np.int64}
        assert keys == expect
        assert all(dt == np.float32 for dt in dtypes.values())
        # torchvision resnet34 has 182 float tensors in the trunk + fc
        assert len(keys) == 182

    def test_port_map_golden(self):
        sd = synth_resnet34_state_dict()
        variables = port_torch_state_dict(sd, backbone="resnet34")
        params, stats = variables["params"], variables["batch_stats"]
        # conv kernels transpose OIHW -> HWIO
        k = np.asarray(params["conv1"]["kernel"])
        assert k.shape == (7, 7, 3, 64)
        np.testing.assert_array_equal(
            k, sd["conv1.weight"].transpose(2, 3, 1, 0)
        )
        # BN running stats land in batch_stats under matching names
        np.testing.assert_array_equal(
            np.asarray(stats["BatchNorm_0"]["mean"]), sd["bn1.running_mean"]
        )
        got = tree_checksum({"params": params, "batch_stats": stats})
        assert got == pytest.approx(0.037532881060785686, abs=1e-12), (
            "torchvision resnet34 port key-map drift: re-derive the "
            f"golden only after auditing the map (got {got!r})"
        )


# ---------------------------------------------------------------------------
# lpips porter
# ---------------------------------------------------------------------------

# torchvision vgg16 conv channels at each LPIPS-sliced features index
VGG16_CONV_CHANNELS = {
    0: (64, 3), 2: (64, 64),
    5: (128, 64), 7: (128, 128),
    10: (256, 128), 12: (256, 256), 14: (256, 256),
    17: (512, 256), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
LPIPS_HEAD_CHANNELS = [64, 128, 256, 512, 512]


class _Tensor:
    def __init__(self, a):
        self._a = a

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self._a


class _Conv:
    def __init__(self, idx, cout, cin):
        self.weight = _Tensor(
            det_array(f"features.{idx}.weight", (cout, cin, 3, 3))
        )
        self.bias = _Tensor(det_array(f"features.{idx}.bias", (cout,)))


class _ReLU:
    weight = None


class _Slice:
    """Mimics a torch Sequential slice: _modules preserves the original
    torchvision features indices as string keys."""

    def __init__(self, modules):
        self._modules = modules


class _Lin:
    def __init__(self, i, c):
        head = _Conv(0, 1, 1)  # placeholder; weight replaced below
        head.weight = _Tensor(
            det_array(f"lin{i}.model.1.weight", (1, c, 1, 1))
        )
        self.model = [None, head]


class _FakeLPIPS:
    """Shape-faithful stand-in for lpips.LPIPS(net='vgg')."""

    def __init__(self):
        class _Net:
            pass

        self.net = _Net()
        slices = []
        prev_end = 0
        for convs in VGG16_SLICES:
            modules = {}
            start = prev_end
            end = convs[-1] + 2  # conv + relu
            for idx in range(start, end):
                if idx in VGG16_CONV_CHANNELS:
                    cout, cin = VGG16_CONV_CHANNELS[idx]
                    modules[str(idx)] = _Conv(idx, cout, cin)
                else:
                    modules[str(idx)] = _ReLU()
            prev_end = end + 1  # maxpool consumes one index
            slices.append(_Slice(modules))
        (self.net.slice1, self.net.slice2, self.net.slice3,
         self.net.slice4, self.net.slice5) = slices
        for i, c in enumerate(LPIPS_HEAD_CHANNELS):
            setattr(self, f"lin{i}", _Lin(i, c))


class TestLpipsPorterGolden:
    def test_extract_key_set_shapes_checksum(self):
        mod = _load_script("port_lpips")
        arrays = mod.extract_lpips_arrays(_FakeLPIPS())
        expect_keys = set()
        for idx, (cout, cin) in VGG16_CONV_CHANNELS.items():
            expect_keys.add(f"features.{idx}.weight")
            expect_keys.add(f"features.{idx}.bias")
            assert arrays[f"features.{idx}.weight"].shape == (
                cout, cin, 3, 3
            )
        for i, c in enumerate(LPIPS_HEAD_CHANNELS):
            expect_keys.add(f"lin{i}.model.1.weight")
            assert arrays[f"lin{i}.model.1.weight"].shape == (1, c, 1, 1)
        assert set(arrays) == expect_keys
        got = tree_checksum(arrays)
        assert got == pytest.approx(-0.0060326430394863646, abs=1e-12), (
            "lpips port key-map drift: re-derive the golden only after "
            f"auditing the map (got {got!r})"
        )

    def test_npz_loads_and_runs(self, tmp_path, monkeypatch):
        """The extracted npz must round-trip through nn.lpips.load_lpips
        and produce a finite LPIPS distance (the full porting pipeline,
        minus only the real weights)."""
        mod = _load_script("port_lpips")
        arrays = mod.extract_lpips_arrays(_FakeLPIPS())
        np.savez(str(tmp_path / "lpips_vgg.npz"), **arrays)
        monkeypatch.setenv("PNY_PRETRAINED_DIR", str(tmp_path))
        params, path = load_lpips()
        assert path == str(tmp_path / "lpips_vgg.npz")
        a = jnp.zeros((1, 3, 16, 16))
        b = jnp.ones((1, 3, 16, 16)) * 0.5
        d = np.asarray(lpips_distance(params, a, b))
        assert d.shape == (1,) and np.isfinite(d).all()

    def test_port_state_dict_matches_extract(self):
        """port_lpips_state_dict (the load side) consumes exactly the
        names extract_lpips_arrays (the save side) produces."""
        mod = _load_script("port_lpips")
        arrays = mod.extract_lpips_arrays(_FakeLPIPS())
        vgg_sd = {k: v for k, v in arrays.items()
                  if k.startswith("features.")}
        lin_sd = {k: v for k, v in arrays.items() if k.startswith("lin")}
        params = port_lpips_state_dict(vgg_sd, lin_sd)
        for convs in VGG16_SLICES:
            for idx in convs:
                np.testing.assert_array_equal(
                    params[f"conv{idx}"]["kernel"],
                    arrays[f"features.{idx}.weight"],
                )


# ---------------------------------------------------------------------------
# detectron2 PointRend porter
# ---------------------------------------------------------------------------


class TestDetectron2PorterGolden:
    def test_port_map_golden(self):
        sd = random_params(value_fn=det_array, return_flat=True)
        tree = port_detectron2_state_dict(sd)
        # every synthetic tensor must land somewhere (no silent drops)
        n_leaves = len(
            [1 for _ in _iter_leaves(tree)]
        )
        assert n_leaves == len(sd)
        # spot-pin the top-level remaps
        np.testing.assert_array_equal(
            np.asarray(tree["rpn_head"]["conv"]["weight"]),
            sd["proposal_generator.rpn_head.conv.weight"],
        )
        np.testing.assert_array_equal(
            np.asarray(tree["box_head"]["cls_score"]["weight"]),
            sd["roi_heads.box_predictor.cls_score.weight"],
        )
        np.testing.assert_array_equal(
            np.asarray(tree["backbone"]["fpn"]["fpn_lateral3"]["weight"]),
            sd["backbone.fpn_lateral3.weight"],
        )
        got = tree_checksum(tree)
        assert got == pytest.approx(29.262741057880493, abs=1e-9), (
            "detectron2 port key-map drift: re-derive the golden only "
            f"after auditing the map (got {got!r})"
        )

    def test_skips_and_unknowns_dropped(self):
        sd = random_params(value_fn=det_array, return_flat=True)
        sd["pixel_mean"] = np.zeros(3, np.float32)
        sd["anchor_generator.cell_anchors.0"] = np.zeros((3, 4), np.float32)
        sd["some.training_only.buffer"] = np.zeros(4, np.float32)
        tree = port_detectron2_state_dict(sd)
        flat_names = {p for p, _ in _iter_items(tree)}
        assert not any("pixel_mean" in n for n in flat_names)
        assert not any("cell_anchors" in n for n in flat_names)
        assert not any("training_only" in n for n in flat_names)


def _iter_items(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_items(v, prefix + k + "/")
        else:
            yield prefix + k, v


def _iter_leaves(tree):
    for _, v in _iter_items(tree):
        yield v
