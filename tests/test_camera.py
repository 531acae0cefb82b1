import numpy as np
import pytest

from pixelnerf_yolo_tpu.utils import camera


def random_c2w(rng, n=3):
    """Random valid camera-to-world matrices."""
    poses = []
    for _ in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        t = rng.normal(size=3)
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = t
        poses.append(m)
    return np.stack(poses).astype(np.float32)


class TestUnprojMap:
    def test_unit_norm_and_signs(self):
        H, W, f = 5, 7, 10.0
        m = np.asarray(camera.unproj_map(W, H, f))
        assert m.shape == (H, W, 3)
        np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)
        # camera frame is (X, -Y, -Z): z component always negative
        assert (m[..., 2] < 0).all()
        # pixel right of center has +x; pixel below center (larger y index) has -y
        cy, cx = H // 2, W // 2
        assert m[cy, W - 1, 0] > 0 and m[cy, 0, 0] < 0
        assert m[H - 1, cx, 1] < 0 and m[0, cx, 1] > 0

    def test_matches_reference_formula(self, rng):
        """Brute-force per-pixel double-precision check of util.py:115-145."""
        H, W = 4, 6
        f = np.array([11.0, 13.0])
        c = np.array([2.5, 1.5])
        got = np.asarray(camera.unproj_map(W, H, f, c=c))
        for y in range(H):
            for x in range(W):
                v = np.array(
                    [(x - c[0]) / f[0], -(y - c[1]) / f[1], -1.0]
                )
                v /= np.linalg.norm(v)
                np.testing.assert_allclose(got[y, x], v, atol=1e-6)


class TestGenRays:
    def test_shapes_and_origin(self, rng):
        poses = random_c2w(rng, n=2)
        rays = np.asarray(camera.gen_rays(poses, 8, 6, np.float32(20.0), 0.8, 1.8))
        assert rays.shape == (2, 6, 8, 8)
        # origins are the camera centers everywhere
        for b in range(2):
            np.testing.assert_allclose(
                rays[b, ..., :3], np.broadcast_to(poses[b, :3, 3], (6, 8, 3)),
                atol=1e-6,
            )
        np.testing.assert_allclose(rays[..., 6], 0.8)
        np.testing.assert_allclose(rays[..., 7], 1.8)
        # dirs are rotated unit camera dirs: unit norm preserved
        np.testing.assert_allclose(
            np.linalg.norm(rays[..., 3:6], axis=-1), 1.0, atol=1e-5
        )

    def test_center_pixel_points_along_minus_z(self, rng):
        poses = random_c2w(rng, n=1)
        W, H = 9, 7  # odd sizes -> a pixel exactly at the center
        rays = np.asarray(
            camera.gen_rays(poses, W, H, np.float32(50.0), 1.0, 2.0,
                            c=np.array([4.0, 3.0], dtype=np.float32))
        )
        d = rays[0, 3, 4, 3:6]
        np.testing.assert_allclose(d, -poses[0, :3, 2], atol=1e-5)


class TestGenRaysYolo:
    def test_projective_invariants(self, rng):
        """K @ R_ext @ dir == lambda * (u+0.49, v+0.49, 1); origin = cam center."""
        H, W = 5, 9
        focal = np.array([30.0, 32.0])
        c = np.array([4.2, 2.1])
        ext = random_c2w(rng, n=3)  # treat as world-to-cam extrinsics
        rays = np.asarray(
            camera.gen_rays_yolo(ext, W, H, focal, c, 1.0, 13.0)
        )
        assert rays.shape == (3, H, W, 8)
        K = np.array([[focal[0], 0, c[0]], [0, focal[1], c[1]], [0, 0, 1]])
        for b in range(3):
            # origin: ext @ [o; 1] = [0 0 0 1]
            o = rays[b, 0, 0, :3]
            pt = ext[b] @ np.concatenate([o, [1.0]])
            np.testing.assert_allclose(pt[:3], 0.0, atol=1e-4)
            for y, x in [(0, 0), (2, 5), (H - 1, W - 1)]:
                d = rays[b, y, x, 3:6]
                proj = K @ (ext[b][:3, :3] @ d)
                proj = proj / proj[2]
                np.testing.assert_allclose(
                    proj[:2], [x + 0.49, y + 0.49], atol=1e-3
                )

    def test_directions_unnormalized_z_one_in_cam(self, rng):
        """Reference quirk: dirs have z_cam == 1 (unnormalized, util.py:853)."""
        ext = random_c2w(rng, n=1)
        rays = np.asarray(
            camera.gen_rays_yolo(ext, 4, 4, np.array([10.0, 10.0]),
                                 np.array([2.0, 2.0]), 1.0, 13.0)
        )
        d_cam = np.einsum("ij,hwj->hwi", ext[0][:3, :3], rays[0, ..., 3:6])
        np.testing.assert_allclose(d_cam[..., 2], 1.0, atol=1e-5)

    def test_identity_pose(self):
        """With identity extrinsics, dir = K^-1 @ (u+.49, v+.49, 1)."""
        ext = np.eye(4, dtype=np.float32)[None]
        focal = np.array([10.0, 20.0])
        c = np.array([1.0, 2.0])
        rays = np.asarray(camera.gen_rays_yolo(ext, 3, 3, focal, c, 1.0, 2.0))
        for y in range(3):
            for x in range(3):
                exp = np.array(
                    [(x + 0.49 - c[0]) / focal[0], (y + 0.49 - c[1]) / focal[1], 1.0]
                )
                np.testing.assert_allclose(rays[0, y, x, 3:6], exp, atol=1e-5)
        np.testing.assert_allclose(rays[0, ..., :3], 0.0, atol=1e-6)


class TestPoses:
    def test_pose_spherical_orthonormal(self):
        p = camera.pose_spherical(30.0, -45.0, 2.0)
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 2.0, atol=1e-5)

    def test_pose_spherical_reference_values(self):
        """theta=0, phi=0: orbit start. Closed-form from util.py:323-337."""
        p = camera.pose_spherical(0.0, 0.0, 3.0)
        expected = np.array(
            [[-1, 0, 0, 0], [0, 0, 1, 3], [0, 1, 0, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        np.testing.assert_allclose(p, expected, atol=1e-6)

    def test_look_at(self):
        m = camera.look_at(np.array([0, 0, 5.0]), np.array([0, 0, 0.0]))
        np.testing.assert_allclose(m[:3, 2], [0, 0, 1], atol=1e-6)  # back = +z
        np.testing.assert_allclose(m[:3, 3], [0, 0, 5], atol=1e-6)

    def test_quat_roundtrip(self, rng):
        poses = random_c2w(rng, n=4)
        R = poses[:, :3, :3]
        q = np.asarray(camera.rot_to_quat(R))
        R2 = np.asarray(camera.quat_to_rot(q))
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_blender_coords_inverse(self):
        a = np.asarray(camera.coord_from_blender())
        b = np.asarray(camera.coord_to_blender())
        np.testing.assert_allclose(a @ b, np.eye(4), atol=1e-6)

    def test_dtu_trajectory(self):
        """IDR fly-through (the reference's dead gen_video block, live
        here): frame count 6*(n//5), orthonormal rotations, keyframe 0
        reproduced exactly, camera centered at R[:,2]*2."""
        poses = camera.dtu_trajectory(10)
        assert poses.shape == (12, 4, 4)
        for p in poses:
            R = p[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            np.testing.assert_allclose(p[:3, 3], R[:, 2] * 2.0, atol=1e-5)
        q0 = np.array([[0.9698, 0.2121, 0.1203, -0.0039]], np.float32)
        R0 = np.asarray(camera.quat_to_rot(q0))[0]
        np.testing.assert_allclose(poses[0, :3, :3], R0, atol=1e-4)
        # periodic loop: the last frame must NOT duplicate frame 0
        # (the seam would stutter when the video loops)
        assert not np.allclose(poses[-1], poses[0], atol=1e-5)


class TestHelpers:
    def test_gen_grid(self):
        g = np.asarray(camera.gen_grid((0, 1, 3), (-1, 1, 2)))
        assert g.shape == (6, 2)
        assert set(np.unique(g[:, 0]).tolist()) == {0.0, 0.5, 1.0}

    def test_homogeneous(self):
        import jax.numpy as jnp

        p = jnp.ones((2, 5, 3))
        h = camera.homogeneous(p)
        assert h.shape == (2, 5, 4)
        np.testing.assert_allclose(np.asarray(h[..., 3]), 1.0)


class TestIndexing:
    def test_batched_index_select_nd(self, rng):
        from pixelnerf_yolo_tpu.utils.indexing import batched_index_select_nd

        t = rng.normal(size=(2, 5, 3, 4)).astype(np.float32)
        inds = np.array([[0, 2], [4, 1]])
        out = np.asarray(batched_index_select_nd(t, inds))
        assert out.shape == (2, 2, 3, 4)
        np.testing.assert_allclose(out[0, 0], t[0, 0])
        np.testing.assert_allclose(out[0, 1], t[0, 2])
        np.testing.assert_allclose(out[1, 0], t[1, 4])

    def test_combine_interleaved_noop(self, rng):
        from pixelnerf_yolo_tpu.utils.indexing import combine_interleaved

        t = rng.normal(size=(6, 5)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(combine_interleaved(t, (1,))), t)

    def test_combine_interleaved_2d(self, rng):
        """The shape actually used by the MLP: t=(SB*NS*B, D), inner=(NS, B)."""
        from pixelnerf_yolo_tpu.utils.indexing import combine_interleaved

        SB, NS, B, D = 2, 3, 4, 5
        t = rng.normal(size=(SB * NS * B, D)).astype(np.float32)
        out = np.asarray(combine_interleaved(t, (NS, B)))
        expected = t.reshape(SB, NS, B, D).mean(axis=1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)
        out_max = np.asarray(combine_interleaved(t, (NS, B), "max"))
        np.testing.assert_allclose(
            out_max, t.reshape(SB, NS, B, D).max(axis=1), rtol=1e-6
        )


class TestMetrics:
    def test_psnr(self):
        from pixelnerf_yolo_tpu.utils.metrics import psnr

        a = np.zeros((4, 4))
        b = np.full((4, 4), 0.1)
        assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)

    def test_ssim_identical(self, rng):
        from pixelnerf_yolo_tpu.utils.metrics import ssim

        img = rng.random((16, 16, 3))
        assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)

    def test_ssim_decreases_with_noise(self, rng):
        from pixelnerf_yolo_tpu.utils.metrics import ssim

        img = rng.random((32, 32, 3))
        s1 = ssim(img, np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1))
        s2 = ssim(img, np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1))
        assert 0 < s2 < s1 < 1


class TestNumpyRayTwins:
    """Host-side numpy twins used by the trainers' per-step assembly must
    match the jitted device versions (same math, no device round-trip)."""

    def test_gen_rays_np_matches_device(self, rng):
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.utils import camera

        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
        poses[:, :3, 3] = rng.normal(size=(3, 3)).astype(np.float32)
        dev = np.asarray(
            camera.gen_rays(jnp.asarray(poses), 9, 7, jnp.float32(30.0),
                            0.8, 1.8)
        )
        host = camera.gen_rays_np(poses, 9, 7, np.float32(30.0), 0.8, 1.8)
        np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-6)
        # (fx, fy) + principal point form
        f2 = np.array([30.0, 31.5], np.float32)
        c2 = np.array([4.0, 3.0], np.float32)
        dev2 = np.asarray(
            camera.gen_rays(jnp.asarray(poses), 9, 7, jnp.asarray(f2),
                            0.8, 1.8, c=jnp.asarray(c2))
        )
        host2 = camera.gen_rays_np(poses, 9, 7, f2, 0.8, 1.8, c=c2)
        np.testing.assert_allclose(host2, dev2, rtol=1e-6, atol=1e-6)

    def test_gen_rays_yolo_np_matches_device(self, rng):
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.utils import camera

        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(2)])
        poses[:, :3, 3] = rng.normal(size=(2, 3)).astype(np.float32) * 0.3
        f = np.array([20.0, 21.0], np.float32)
        c = np.array([8.0, 6.0], np.float32)
        dev = np.asarray(
            camera.gen_rays_yolo(jnp.asarray(poses), 16, 12,
                                 jnp.asarray(f), jnp.asarray(c), 1.0, 13.0)
        )
        host = camera.gen_rays_yolo_np(poses, 16, 12, f, c, 1.0, 13.0)
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)
