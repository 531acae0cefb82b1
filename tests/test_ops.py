import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from pixelnerf_yolo_tpu.ops.composite import composite, yolo_aggregate
from pixelnerf_yolo_tpu.ops.grid_sample import grid_sample
from pixelnerf_yolo_tpu.ops.ray_sampling import (
    sample_coarse,
    sample_fine,
    sample_fine_depth,
)
from pixelnerf_yolo_tpu.ops.resize import resize_area, resize_bilinear


class TestGridSample:
    @pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
    @pytest.mark.parametrize("align", [True, False])
    def test_matches_torch_bilinear(self, rng, padding, align):
        B, C, H, W, N = 2, 3, 5, 7, 64
        img = rng.normal(size=(B, C, H, W)).astype(np.float32)
        # include far out-of-bounds points to exercise padding
        pts = (rng.random((B, N, 2)).astype(np.float32) * 4.0) - 2.0
        ours = np.asarray(
            grid_sample(img, pts, mode="bilinear", padding_mode=padding,
                        align_corners=align)
        )
        ref = F.grid_sample(
            torch.from_numpy(img),
            torch.from_numpy(pts).unsqueeze(2),
            mode="bilinear",
            padding_mode=padding,
            align_corners=align,
        )[..., 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_matches_torch_nearest(self, rng):
        B, C, H, W, N = 1, 2, 6, 6, 32
        img = rng.normal(size=(B, C, H, W)).astype(np.float32)
        # keep points off the .5 rounding boundary (tie-break conventions differ)
        pts = (rng.random((B, N, 2)).astype(np.float32) * 1.8) - 0.9
        pts = np.where(np.abs((pts * 2.5 + 2.5) % 1 - 0.5) < 0.05, pts + 0.07, pts)
        ours = np.asarray(
            grid_sample(img, pts, mode="nearest", padding_mode="border",
                        align_corners=True)
        )
        ref = F.grid_sample(
            torch.from_numpy(img),
            torch.from_numpy(pts).unsqueeze(2),
            mode="nearest",
            padding_mode="border",
            align_corners=True,
        )[..., 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    @pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
    def test_nonfinite_coords_match_torch(self, rng, padding):
        """inf/NaN uv (z~0 or behind-camera projections) must behave like
        torch: zeros -> NaN out; border/reflection -> clipped indices
        (NaN/+inf at far border, -inf at 0)."""
        B, C, H, W = 1, 2, 4, 4
        img = rng.normal(size=(B, C, H, W)).astype(np.float32)
        pts = np.array(
            [[[np.nan, 0.0], [np.inf, 0.0], [-np.inf, 0.2], [0.0, np.nan],
              [0.1, -0.2]]],
            dtype=np.float32,
        )
        ours = np.asarray(
            grid_sample(img, pts, mode="bilinear", padding_mode=padding,
                        align_corners=True)
        )
        ref = F.grid_sample(
            torch.from_numpy(img), torch.from_numpy(pts).unsqueeze(2),
            mode="bilinear", padding_mode=padding, align_corners=True,
        )[..., 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_exact_reference_uv_transform(self, rng):
        """Full pixelNeRF indexing path: uv pixel coords -> latent_scaling
        transform -> grid_sample, vs torch (encoder.py:93-108)."""
        B, C, H, W, N = 1, 4, 8, 10, 50
        latent = rng.normal(size=(B, C, H, W)).astype(np.float32)
        image_size = np.array([20.0, 16.0], dtype=np.float32)  # (W_img, H_img)
        uv = rng.random((B, N, 2)).astype(np.float32) * image_size
        latent_scaling = np.array([W, H], dtype=np.float32)
        latent_scaling = latent_scaling / (latent_scaling - 1) * 2.0
        scale = latent_scaling / image_size
        uv_n = uv * scale - 1.0

        ours = np.asarray(
            grid_sample(latent, uv_n, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
        )
        ref = F.grid_sample(
            torch.from_numpy(latent),
            torch.from_numpy(uv_n).unsqueeze(2),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )[..., 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)


class TestResize:
    @pytest.mark.parametrize("out_hw", [(8, 12), (16, 20), (5, 5)])
    def test_bilinear_align_corners_matches_torch(self, rng, out_hw):
        x = rng.normal(size=(2, 3, 8, 10)).astype(np.float32)
        ours = np.asarray(resize_bilinear(x, out_hw, align_corners=True))
        ref = F.interpolate(
            torch.from_numpy(x), out_hw, mode="bilinear", align_corners=True
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_bilinear_half_pixel_matches_torch(self, rng):
        x = rng.normal(size=(1, 2, 6, 6)).astype(np.float32)
        ours = np.asarray(resize_bilinear(x, (9, 13), align_corners=False))
        ref = F.interpolate(
            torch.from_numpy(x), (9, 13), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_area_matches_torch(self, rng):
        x = rng.normal(size=(1, 3, 12, 16)).astype(np.float32)
        ours = np.asarray(resize_area(x, (6, 8)))
        ref = F.interpolate(torch.from_numpy(x), (6, 8), mode="area").numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)


def make_rays(rng, B, near=1.0, far=5.0):
    rays = rng.normal(size=(B, 8)).astype(np.float32)
    rays[:, 6] = near
    rays[:, 7] = far
    return rays


class TestSampling:
    def test_coarse_injected_uniforms(self, rng):
        """With u fixed, matches the closed-form stratified schedule."""
        B, K = 4, 8
        rays = make_rays(rng, B, near=2.0, far=6.0)
        u = np.full((B, K), 0.5, dtype=np.float32)
        z = np.asarray(sample_coarse(rays, K, u=jnp.asarray(u)))
        steps = (np.arange(K) / K + 0.5 / K).astype(np.float32)
        expected = 2.0 * (1 - steps) + 6.0 * steps
        np.testing.assert_allclose(z, np.broadcast_to(expected, (B, K)), rtol=1e-6)

    def test_coarse_bounds_and_order(self, rng):
        rays = make_rays(rng, 16)
        z = np.asarray(sample_coarse(rays, 32, rng=jax.random.PRNGKey(0)))
        assert (z >= 1.0 - 1e-5).all() and (z <= 5.0 + 1e-5).all()
        assert (np.diff(z, axis=-1) > 0).all()  # strata are disjoint

    def test_lindisp(self, rng):
        rays = make_rays(rng, 4, near=1.0, far=10.0)
        u = np.zeros((4, 4), dtype=np.float32)
        z = np.asarray(sample_coarse(rays, 4, u=jnp.asarray(u), lindisp=True))
        s = np.arange(4) / 4.0
        expected = 1.0 / (1.0 / 1.0 * (1 - s) + 1.0 / 10.0 * s)
        np.testing.assert_allclose(z[0], expected, rtol=1e-5)

    def test_fine_concentrates_on_high_weight_bins(self, rng):
        B, Kc, Kf = 2, 16, 64
        rays = make_rays(rng, B, near=0.0, far=16.0)
        weights = np.zeros((B, Kc), dtype=np.float32)
        weights[:, 5] = 1.0  # all mass in bin 5 -> z in [5, 6)
        z = np.asarray(
            sample_fine(rays, weights, Kf, Kc, rng=jax.random.PRNGKey(1))
        )
        frac_in_bin = ((z >= 5.0 - 0.2) & (z <= 6.0 + 0.2)).mean()
        assert frac_in_bin > 0.9

    def test_fine_injected_matches_formula(self, rng):
        """Inverse CDF with injected u's, vs a numpy reimplementation of
        searchsorted-right minus one (nerf.py:144-147)."""
        B, Kc, Kf = 3, 8, 5
        rays = make_rays(rng, B, near=1.0, far=9.0)
        weights = rng.random((B, Kc)).astype(np.float32)
        u = rng.random((B, Kf)).astype(np.float32)
        uj = rng.random((B, Kf)).astype(np.float32)
        z = np.asarray(
            sample_fine(rays, weights, Kf, Kc, u=jnp.asarray(u), u_jitter=jnp.asarray(uj))
        )
        w = weights + 1e-5
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((B, 1)), np.cumsum(pdf, -1)], -1)
        inds = np.stack([
            np.searchsorted(cdf[b], u[b], side="right") for b in range(B)
        ]).astype(np.float32) - 1.0
        inds = np.maximum(inds, 0.0)
        steps = (inds + uj) / Kc
        expected = 1.0 * (1 - steps) + 9.0 * steps
        np.testing.assert_allclose(z, expected, rtol=1e-5, atol=1e-5)

    def test_fine_depth_clamped(self, rng):
        rays = make_rays(rng, 8, near=1.0, far=3.0)
        depth = np.full(8, 2.0, dtype=np.float32)
        z = np.asarray(
            sample_fine_depth(rays, depth, 16, rng=jax.random.PRNGKey(2),
                              depth_std=5.0)
        )
        assert (z >= 1.0).all() and (z <= 3.0).all()


class TestComposite:
    def test_matches_reference_formula_torch(self, rng):
        """Numerical parity with the reference compositing math, computed
        independently in torch float32."""
        B, K = 6, 10
        z = np.sort(rng.random((B, K)).astype(np.float32) * 4 + 1, axis=-1)
        far = np.full((B, 1), 5.5, dtype=np.float32)
        out = rng.normal(size=(B, K, 4)).astype(np.float32)

        weights, rgb, depth = composite(out, z, far, white_bkgd=False)

        tz = torch.from_numpy(z)
        tout = torch.from_numpy(out)
        deltas = torch.cat([tz[:, 1:] - tz[:, :-1],
                            torch.from_numpy(far) - tz[:, -1:]], -1)
        alphas = 1 - torch.exp(-deltas * torch.relu(tout[..., 3]))
        ash = torch.cat([torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
        T = torch.cumprod(ash, -1)
        w_ref = (alphas * T[:, :-1]).numpy()
        rgb_ref = (torch.from_numpy(w_ref)[..., None] * tout[..., :3]).sum(-2).numpy()
        depth_ref = (w_ref * z).sum(-1)

        # atol 1e-5: jnp.cumprod (scan tree) vs torch sequential cumprod
        # differ in fp32 association order
        np.testing.assert_allclose(np.asarray(weights), w_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), depth_ref, atol=1e-5)

    def test_white_background(self, rng):
        B, K = 2, 4
        z = np.sort(rng.random((B, K)).astype(np.float32), -1)
        far = np.ones((B, 1), dtype=np.float32) * 2
        out = np.zeros((B, K, 4), dtype=np.float32)  # zero density
        _, rgb, _ = composite(out, z, far, white_bkgd=True)
        np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-6)  # all bg

    def test_opaque_wall(self):
        """A single opaque sample: weight ~1 at that sample, depth = its z."""
        B, K = 1, 8
        z = np.linspace(1, 4, K, dtype=np.float32)[None]
        far = np.array([[5.0]], dtype=np.float32)
        out = np.zeros((B, K, 4), dtype=np.float32)
        out[0, 3, 3] = 1e6  # huge sigma at k=3
        out[0, :, :3] = [1.0, 0.5, 0.25]
        w, rgb, depth = composite(out, z, far)
        assert np.asarray(w)[0, 3] > 0.999
        np.testing.assert_allclose(np.asarray(rgb)[0], [1.0, 0.5, 0.25], atol=1e-4)
        np.testing.assert_allclose(np.asarray(depth)[0], z[0, 3], atol=1e-3)


class TestYoloAggregate:
    def test_matches_reference_formula(self, rng):
        B, K, A = 3, 12, 3
        out = rng.normal(size=(B, K, A, 7)).astype(np.float32)
        ours = np.asarray(yolo_aggregate(out))

        t = torch.from_numpy(out)
        probs = torch.sigmoid(t[..., 0])
        summed = probs.sum(dim=1)
        vals = (t[..., 1:] * probs.unsqueeze(-1)).sum(dim=1) / (
            summed.unsqueeze(-1) + 1e-5
        )
        ref = torch.cat([probs.max(dim=1)[0].unsqueeze(-1), vals], dim=-1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_soft_count_formula_and_values_unchanged(self, rng):
        """soft_count: prob = S/(S+c); box/class values identical to max."""
        B, K, A = 3, 12, 3
        c = 4.0
        out = rng.normal(size=(B, K, A, 7)).astype(np.float32)
        got = np.asarray(yolo_aggregate(out, mode="soft_count", soft_count=c))
        base = np.asarray(yolo_aggregate(out))
        probs = 1.0 / (1.0 + np.exp(-out[..., 0]))
        s = probs.sum(axis=1)
        np.testing.assert_allclose(got[..., 0], s / (s + c), atol=1e-5)
        np.testing.assert_allclose(got[..., 1:], base[..., 1:], atol=1e-6)
        assert np.all(got[..., 0] >= 0) and np.all(got[..., 0] < 1)

    def test_soft_count_separates_chord_lengths(self):
        """The diagnosed 3-scale failure mode (CONVERGENCE.md r4): a grazing
        ray with FEW high-objectness samples vs a center ray with MANY.
        max is count-blind (identical prob); soft_count separates them."""
        K, A = 32, 1
        out = np.full((2, K, A, 7), -12.0, dtype=np.float32)
        out[0, :3, 0, 0] = 6.0   # grazing: 3 inside-points
        out[1, :24, 0, 0] = 6.0  # center chord: 24 inside-points
        mx = np.asarray(yolo_aggregate(out))[..., 0]
        sc = np.asarray(yolo_aggregate(out, mode="soft_count"))[..., 0]
        np.testing.assert_allclose(mx[0], mx[1], atol=1e-6)  # count-blind
        assert sc[1] > sc[0] + 0.3  # chord-sensitive
        assert sc[1] > 0.8 and sc[0] < 0.5

    def test_gamma_suppresses_background_noise_floor(self):
        """The measured soft_count failure (CONVERGENCE.md r4): a
        background ray's K small probs SUM to mass above the squash
        midpoint (needs mean p < c/K to stay quiet — BCE-saturated).
        gamma=2 shrinks the noise floor quadratically while a true chord
        keeps its mass."""
        K, A = 128, 1
        out = np.full((2, K, A, 7), np.log(0.1 / 0.9), dtype=np.float32)
        out[1, :24, 0, 0] = 6.0  # center chord on an otherwise-0.1 ray
        g1 = np.asarray(yolo_aggregate(out, mode="soft_count"))[..., 0]
        g2 = np.asarray(
            yolo_aggregate(out, mode="soft_count", gamma=2.0)
        )[..., 0]
        assert g1[0] > 0.45       # gamma 1: background ray fires
        assert g2[0] < 0.3        # gamma 2: background ray quiet
        assert g2[1] > 0.7        # ...while the chord still fires

    def test_gated_count_formula_and_values_unchanged(self, rng):
        """gated_count: prob = max * S/(S+c); values identical to max."""
        B, K, A = 3, 12, 3
        c = 4.0
        out = rng.normal(size=(B, K, A, 7)).astype(np.float32)
        got = np.asarray(yolo_aggregate(out, mode="gated_count",
                                        soft_count=c, gamma=2.0))
        base = np.asarray(yolo_aggregate(out))
        probs = 1.0 / (1.0 + np.exp(-out[..., 0]))
        s = (probs**2.0).sum(axis=1)
        expect = probs.max(axis=1) * s / (s + c)
        np.testing.assert_allclose(got[..., 0], expect, atol=1e-5)
        np.testing.assert_allclose(got[..., 1:], base[..., 1:], atol=1e-6)

    def test_gated_count_orders_center_grazer_background(self):
        """gated_count's three-way separation: center chord > grazer >
        background, with background gated by the max exactly like the
        reference (easy to train down)."""
        K, A = 128, 1
        out = np.full((3, K, A, 7), np.log(0.05 / 0.95), dtype=np.float32)
        out[0, :24, 0, 0] = 6.0  # center: 24-point chord
        out[1, :3, 0, 0] = 6.0   # grazer: 3 shared high points
        # out[2]: pure background (max ~0.05)
        g = np.asarray(
            yolo_aggregate(out, mode="gated_count", gamma=2.0)
        )[..., 0]
        assert g[0] > 0.7
        assert g[1] < g[0] - 0.25  # grazer clearly below center
        assert g[2] < 0.06         # background gated by its low max
        mx = np.asarray(yolo_aggregate(out))[..., 0]
        np.testing.assert_allclose(mx[0], mx[1], atol=1e-6)  # max can't

    def test_unknown_mode_raises(self):
        out = np.zeros((1, 4, 1, 7), dtype=np.float32)
        with pytest.raises(NotImplementedError):
            yolo_aggregate(out, mode="nope")


class TestPositionalEncoding:
    def test_matches_reference_layout(self, rng):
        """Exact parity with code.py:30-42 computed independently."""
        from pixelnerf_yolo_tpu.nn.code import PositionalEncoding

        pe = PositionalEncoding(num_freqs=3, d_in=2, freq_factor=1.5,
                                include_input=True)
        assert pe.d_out == 3 * 2 * 2 + 2
        x = rng.normal(size=(5, 2)).astype(np.float32)
        got = np.asarray(pe(x))
        freqs = 1.5 * 2.0 ** np.arange(3)
        blocks = [x]
        for f in freqs:
            blocks.append(np.sin(x * f))
            blocks.append(np.cos(x * f))
        expected = np.concatenate(blocks, axis=-1)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_no_input(self, rng):
        from pixelnerf_yolo_tpu.nn.code import PositionalEncoding

        pe = PositionalEncoding(num_freqs=2, d_in=3, include_input=False)
        assert pe.d_out == 12
        x = rng.normal(size=(4, 3)).astype(np.float32)
        assert np.asarray(pe(x)).shape == (4, 12)

    def test_batched_shape(self, rng):
        from pixelnerf_yolo_tpu.nn.code import PositionalEncoding

        pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5)
        x = rng.normal(size=(2, 7, 3)).astype(np.float32)
        assert np.asarray(pe(x)).shape == (2, 7, pe.d_out)


class TestInterpMatmul:
    """One-hot-matmul bilinear combine == gather-based combine."""

    @pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
    def test_matches_gather_path(self, rng, padding):
        from pixelnerf_yolo_tpu.ops.grid_sample import grid_sample_nhwc

        B, H, W, C, N = 2, 7, 9, 24, 50
        flat = jnp.asarray(
            rng.normal(size=(B, H * W, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        # include out-of-range points to exercise padding semantics
        grid = jnp.asarray(
            rng.uniform(-1.6, 1.6, size=(B, N, 2)).astype(np.float32)
        )
        ref = grid_sample_nhwc(
            flat, grid, H, W, padding_mode=padding, align_corners=True,
        )
        out = grid_sample_nhwc(
            flat, grid, H, W, padding_mode=padding, align_corners=True,
            interp_matmul=True,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.02, rtol=0.02,
        )

    def test_nan_table_rows_scrubbed_not_poisoning(self, rng):
        from pixelnerf_yolo_tpu.ops.grid_sample import grid_sample_nhwc

        B, H, W, C = 1, 4, 4, 8
        flat = np.ones((B, H * W, C), np.float32)
        flat[0, 0] = np.nan  # row never touched by the sample below
        grid = jnp.asarray(np.full((B, 3, 2), 0.5, np.float32))
        out = grid_sample_nhwc(
            jnp.asarray(flat).astype(jnp.bfloat16), grid, H, W,
            padding_mode="border", align_corners=True, interp_matmul=True,
        )
        assert np.isfinite(np.asarray(out, np.float32)).all()
