"""Direct numerical parity against the ACTUAL reference implementation.

These tests import the reference's torch modules from /root/reference (with
its unavailable deps stubbed), port weights with train/convert.py, and
compare outputs value-for-value.  This is the strongest parity evidence the
environment allows: same weights, same inputs, reference code vs ours.

Skipped automatically when /root/reference or torch is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available",
)


def _install_reference(path=REFERENCE):
    """Make the reference's src importable by stubbing its missing deps
    (torchvision/pyhocon/dotmap/external NeRF-YOLO)."""
    for name in [
        "torchvision", "torchvision.transforms", "torchvision.models",
        "pyhocon", "dotmap", "models", "models.yolo",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))

    class _T:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tvt = sys.modules["torchvision.transforms"]
    tvt.Resize = tvt.ToTensor = tvt.Normalize = _T
    tvt.Compose = lambda ops: _T()
    sys.modules["torchvision"].transforms = tvt
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["pyhocon"].ConfigFactory = object
    sys.modules["models"].yolo = sys.modules["models.yolo"]
    sys.modules["models.yolo"].Model = object

    class DotMap(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__ = self

        def toDict(self):
            return dict(self)

    sys.modules["dotmap"].DotMap = DotMap
    src = os.path.join(path, "src")
    if src not in sys.path:
        sys.path.insert(0, src)


_install_reference()

import util as ref_util  # noqa: E402  (reference src/util)
from model.code import PositionalEncoding as RefPE  # noqa: E402
from model.resnetfc import ResnetFC as RefResnetFC  # noqa: E402
from render.nerf import NeRFRenderer as RefNeRFRenderer  # noqa: E402
from render.yolo import YoloRenderer as RefYoloRenderer  # noqa: E402
from model import loss as ref_loss  # noqa: E402

from pixelnerf_yolo_tpu.detect.boxes import (  # noqa: E402
    calculate_tp_fp_fn,
    convert_cells_to_bboxes,
    nms,
)
from pixelnerf_yolo_tpu.losses.yolo import YoloLoss  # noqa: E402
from pixelnerf_yolo_tpu.nn.code import PositionalEncoding  # noqa: E402
from pixelnerf_yolo_tpu.nn.resnetfc import ResnetFC  # noqa: E402
from pixelnerf_yolo_tpu.ops.composite import (  # noqa: E402
    composite,
    yolo_aggregate,
)
from pixelnerf_yolo_tpu.train.convert import convert_resnetfc  # noqa: E402
from pixelnerf_yolo_tpu.utils import camera  # noqa: E402


def random_c2w(rng, n):
    qs = rng.normal(size=(n, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    out = []
    for w, x, y, z in qs:
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R
        m[:3, 3] = rng.normal(size=3)
        out.append(m)
    return np.stack(out)


class TestRayGenParity:
    def test_gen_rays(self, rng):
        poses = random_c2w(rng, 3)
        H, W, f = 7, 9, 21.5
        ref = ref_util.gen_rays(
            torch.from_numpy(poses), W, H, torch.tensor(f), 0.8, 1.8
        ).numpy()
        ours = np.asarray(
            camera.gen_rays(jnp.asarray(poses), W, H, jnp.float32(f), 0.8, 1.8)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_gen_rays_with_c(self, rng):
        poses = random_c2w(rng, 2)
        c = np.array([3.3, 4.4], dtype=np.float32)
        ref = ref_util.gen_rays(
            torch.from_numpy(poses), 8, 8, torch.tensor(20.0), 1.0, 2.0,
            c=torch.from_numpy(c),
        ).numpy()
        ours = np.asarray(
            camera.gen_rays(jnp.asarray(poses), 8, 8, jnp.float32(20.0),
                            1.0, 2.0, c=jnp.asarray(c))
        )
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_gen_rays_yolo(self, rng):
        ext = np.linalg.inv(random_c2w(rng, 3)).astype(np.float32)
        focal = np.array([30.0, 32.0], dtype=np.float32)
        c = np.array([4.5, 3.5], dtype=np.float32)
        ref = ref_util.gen_rays_yolo(
            torch.from_numpy(ext), 9, 7, torch.from_numpy(focal),
            torch.from_numpy(c), 1.0, 13.0,
        ).numpy()
        ours = np.asarray(
            camera.gen_rays_yolo(jnp.asarray(ext), 9, 7, jnp.asarray(focal),
                                 jnp.asarray(c), 1.0, 13.0)
        )
        np.testing.assert_allclose(ours, ref, atol=3e-5)


class TestPEParity:
    def test_positional_encoding(self, rng):
        ref_pe = RefPE(num_freqs=6, d_in=3, freq_factor=1.5)
        pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5)
        x = rng.normal(size=(17, 3)).astype(np.float32)
        ref = ref_pe(torch.from_numpy(x)).numpy()
        ours = np.asarray(pe(jnp.asarray(x)))
        # atol 2e-5: f32 sin at large args (freq 48x) differs slightly
        # between XLA and torch libm
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestResnetFCParity:
    @pytest.mark.parametrize("ns", [1, 3])
    def test_forward_with_ported_weights(self, rng, ns):
        d_in, d_latent, d_hidden = 42, 64, 64
        ref_mlp = RefResnetFC(
            d_in, d_out=4, n_blocks=5, d_latent=d_latent, d_hidden=d_hidden,
            combine_layer=3, combine_type="average",
        ).eval()
        params = convert_resnetfc(ref_mlp.state_dict(), "")
        mlp = ResnetFC(d_out=4, n_blocks=5, d_latent=d_latent,
                       d_hidden=d_hidden, combine_layer=3)

        B = 12
        zx = rng.normal(size=(ns * B, d_latent + d_in)).astype(np.float32)
        with torch.no_grad():
            ref = ref_mlp(
                torch.from_numpy(zx), combine_inner_dims=(ns, B)
            ).numpy()
        ours = np.asarray(
            mlp.apply({"params": params}, jnp.asarray(zx),
                      combine_inner_dims=(ns, B))
        )
        np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=3e-5)

    def test_fused_kernel_with_ported_weights(self, rng):
        from pixelnerf_yolo_tpu.ops.pallas.fused_mlp import fused_resnetfc

        d_in, d_latent, d_hidden = 42, 64, 64
        ref_mlp = RefResnetFC(
            d_in, d_out=4, n_blocks=5, d_latent=d_latent, d_hidden=d_hidden,
            combine_layer=3, combine_type="average",
        ).eval()
        params = convert_resnetfc(ref_mlp.state_dict(), "")
        B = 16
        latent = rng.normal(size=(B, d_latent)).astype(np.float32)
        zfeat = rng.normal(size=(B, d_in)).astype(np.float32)
        with torch.no_grad():
            ref = ref_mlp(
                torch.from_numpy(np.concatenate([latent, zfeat], -1)),
                combine_inner_dims=(1, B),
            ).numpy().reshape(-1, 4)
        ours = np.asarray(
            fused_resnetfc(
                params, jnp.asarray(latent), jnp.asarray(zfeat), 5, 3, 1, B,
                jnp.dtype(jnp.float32), lambda p, lt, zf: None,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=3e-5)


class _RefStubModel(torch.nn.Module):
    """Deterministic field for composite parity (duck-typed for the
    reference renderer: (SB, B, 3) -> (SB, B, 4))."""

    use_viewdirs = False

    def forward(self, pnts, coarse=True, viewdirs=None):
        rgb = torch.sigmoid(pnts)
        sigma = torch.relu(pnts.sum(-1, keepdim=True) * 3.0)
        return torch.cat([rgb, sigma], dim=-1)


def _jax_stub_field(pnts):
    rgb = jax.nn.sigmoid(pnts)
    sigma = jax.nn.relu(jnp.sum(pnts, -1, keepdims=True) * 3.0)
    return jnp.concatenate([rgb, sigma], axis=-1)


class TestCompositeParity:
    def test_composite_fixed_z(self, rng):
        """Reference NeRFRenderer.composite vs our ops.composite + stub
        field at identical sampled z (the deterministic part of the
        render — the north star's bit-parity surface)."""
        B, K = 10, 16
        ref_renderer = RefNeRFRenderer(n_coarse=K, n_fine=0,
                                       white_bkgd=True).eval()
        rays = rng.normal(size=(B, 8)).astype(np.float32)
        rays[:, 6], rays[:, 7] = 0.8, 1.8
        z = np.sort(
            rng.uniform(0.8, 1.8, size=(B, K)).astype(np.float32), -1
        )
        with torch.no_grad():
            w_ref, rgb_ref, depth_ref = ref_renderer.composite(
                _RefStubModel(), torch.from_numpy(rays),
                torch.from_numpy(z), coarse=True, sb=0,
            )
        pts = rays[:, None, :3] + z[..., None] * rays[:, None, 3:6]
        out = _jax_stub_field(jnp.asarray(pts.reshape(-1, 3))).reshape(B, K, 4)
        w, rgb, depth = composite(
            out, jnp.asarray(z), jnp.asarray(rays[:, -1:]), white_bkgd=True
        )
        np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), atol=2e-6)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(depth), depth_ref.numpy(), atol=2e-6
        )


class TestYoloParity:
    def test_yolo_renderer_aggregation(self, rng):
        """Reference YoloRenderer.forward vs ours with the SAME z samples
        (reference sample_coarse monkeypatched to fixed values)."""
        B, K, A = 6, 8, 3
        z_fixed = np.sort(
            rng.uniform(1.0, 13.0, size=(B, K)).astype(np.float32), -1
        )

        class RefStubNet(torch.nn.Module):
            def forward(self, pnts, coarse=True, viewdirs=None):
                # (1, N, 3) -> (1, N, A*7) deterministic
                base = torch.cat([pnts, viewdirs], dim=-1)  # (1, N, 6)
                out = torch.cat(
                    [torch.sin(base * (i + 1)).repeat(1, 1, 4)[..., :7]
                     for i in range(A)], dim=-1
                )
                return out

        ref_r = RefYoloRenderer(K, 1 << 20, 1, A)
        ref_r.bind_net(RefStubNet())
        ref_r.sample_coarse = lambda rb: torch.from_numpy(z_fixed)
        rays = rng.normal(size=(B, 8)).astype(np.float32)
        rays[:, 6], rays[:, 7] = 1.0, 13.0
        with torch.no_grad():
            ref = ref_r(torch.from_numpy(rays)).numpy()

        pts = rays[:, None, :3] + z_fixed[..., None] * rays[:, None, 3:6]
        dirs = np.broadcast_to(rays[:, None, 3:6], (B, K, 3))
        base = jnp.asarray(
            np.concatenate([pts, dirs], -1).reshape(-1, 6)
        )
        out = jnp.concatenate(
            [jnp.tile(jnp.sin(base * (i + 1)), (1, 4))[:, :7]
             for i in range(A)], axis=-1,
        ).reshape(B, K, A, 7)
        ours = np.asarray(yolo_aggregate(out))
        np.testing.assert_allclose(ours, ref, atol=3e-6)

    def test_yolo_loss_parity(self, rng):
        A = 3
        pred = rng.normal(size=(1, 20, A, 7)).astype(np.float32)
        pred[..., 0] = rng.random((1, 20, A))
        target = np.zeros((1, 20, A, 6), dtype=np.float32)
        target[0, 2, 1] = [1.0, 0.4, 0.6, 0.2, 0.3, 1.0]
        target[0, 7, 0] = [1.0, 0.5, 0.5, 0.1, 0.1, 0.0]
        target[0, 11, 2, 0] = -1.0
        anchors = np.array([[0.1, 0.2], [0.3, 0.3], [0.5, 0.4]], np.float32)

        ref_fn = ref_loss.YoloLoss(A, 1.0, 20.0, 1.0, 1.0)
        ref_out = ref_fn(
            torch.from_numpy(pred.copy()), torch.from_numpy(target.copy()),
            torch.from_numpy(anchors),
        )
        ours = YoloLoss(A, 1.0, 20.0, 1.0, 1.0)(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(anchors)
        )
        for o, r in zip(ours, ref_out):
            assert float(o) == pytest.approx(float(r), rel=2e-4, abs=1e-6)


class TestDetectParity:
    def test_convert_cells_and_nms_and_tpfpfn(self, rng):
        h = w = 4
        A = 3
        pred = rng.normal(size=(1, h, w, A, 7)).astype(np.float32)
        pred[..., 0] = rng.random((1, h, w, A))
        anchors = np.array([[0.1, 0.2], [0.3, 0.3], [0.5, 0.4]], np.float32)

        ref_boxes = ref_util.convert_cells_to_bboxes(
            torch.from_numpy(pred), torch.from_numpy(anchors), h, w,
            is_predictions=True,
        )[0]
        our_boxes = convert_cells_to_bboxes(pred, anchors, h, w,
                                            is_predictions=True)[0]
        np.testing.assert_allclose(
            np.array(our_boxes), np.array(ref_boxes), atol=1e-5
        )

        ref_nms, ref_hc, ref_bat = ref_util.nms(
            [list(b) for b in ref_boxes], 0.5, 0.45
        )
        our_nms, our_hc, our_bat = nms(
            [list(b) for b in our_boxes], 0.5, 0.45
        )
        assert our_hc == pytest.approx(ref_hc, abs=1e-6)
        assert our_bat == ref_bat
        assert len(our_nms) == len(ref_nms)
        np.testing.assert_allclose(
            np.array(our_nms), np.array(ref_nms), atol=1e-5
        )

        gt = rng.normal(size=(1, h, w, A, 6)).astype(np.float32)
        gt[..., 0] = (rng.random((1, h, w, A)) > 0.8).astype(np.float32)
        ref_gt_boxes = ref_util.convert_cells_to_bboxes(
            torch.from_numpy(gt), torch.from_numpy(anchors), h, w,
            is_predictions=False,
        )[0]
        ref_tp, ref_fp, ref_fn = ref_util.calculate_tp_fp_fn(
            [list(b) for b in ref_gt_boxes], [list(b) for b in ref_boxes],
            0.75, 0.45, 0.2,
        )
        our_tp, our_fp, our_fn = calculate_tp_fp_fn(
            [list(b) for b in ref_gt_boxes], [list(b) for b in our_boxes],
            0.75, 0.45, 0.2,
        )
        assert (our_tp, our_fp, our_fn) == (ref_tp, ref_fp, ref_fn)


class TestSamplerParity:
    """Live-reference RNG-path parity: the stratified/importance/depth
    samplers with IDENTICAL injected uniforms/normals must produce the
    reference's z values exactly (nerf.py:104-167).  Composite parity
    above covers the deterministic half; together they pin the whole
    NeRFRenderer forward up to RNG-source choice (SURVEY §7 hard-part 2)."""

    def test_all_three_samplers_match_reference(self, rng):
        from pixelnerf_yolo_tpu.ops.ray_sampling import (
            sample_coarse,
            sample_fine,
            sample_fine_depth,
        )

        B, Kc, Kf, Kfd = 5, 8, 6, 3
        ref = RefNeRFRenderer(
            n_coarse=Kc, n_fine=Kf + Kfd, n_fine_depth=Kfd, depth_std=0.07,
            white_bkgd=True,
        ).eval()
        rays = rng.normal(size=(B, 8)).astype(np.float32)
        rays[:, 6], rays[:, 7] = 0.8, 1.8
        weights = rng.random((B, Kc)).astype(np.float32)
        depth = rng.uniform(0.9, 1.7, size=(B,)).astype(np.float32)
        u_c = rng.random((B, Kc)).astype(np.float32)
        u_f = rng.random((B, Kf)).astype(np.float32)
        u_j = rng.random((B, Kf)).astype(np.float32)
        nse = rng.normal(size=(B, Kfd)).astype(np.float32)

        # feed the torch reference the same uniforms (it draws coarse via
        # rand_like, fine-CDF via rand, fine-jitter via rand_like, depth
        # noise via randn_like — queue per entry point)
        rand_like_q = [torch.from_numpy(u_c), torch.from_numpy(u_j)]
        orig_rand_like = torch.rand_like
        orig_rand = torch.rand
        orig_randn_like = torch.randn_like
        torch.rand_like = lambda t, **k: rand_like_q.pop(0)
        torch.rand = lambda *s, **k: torch.from_numpy(u_f)
        torch.randn_like = lambda t, **k: torch.from_numpy(nse)
        try:
            with torch.no_grad():
                z_c_ref = ref.sample_coarse(torch.from_numpy(rays))
                z_f_ref = ref.sample_fine(
                    torch.from_numpy(rays), torch.from_numpy(weights)
                )
                z_d_ref = ref.sample_fine_depth(
                    torch.from_numpy(rays), torch.from_numpy(depth)
                )
        finally:
            torch.rand_like = orig_rand_like
            torch.rand = orig_rand
            torch.randn_like = orig_randn_like

        z_c = sample_coarse(jnp.asarray(rays), Kc, u=jnp.asarray(u_c))
        z_f = sample_fine(
            jnp.asarray(rays), jnp.asarray(weights), Kf, Kc,
            u=jnp.asarray(u_f), u_jitter=jnp.asarray(u_j),
        )
        z_d = sample_fine_depth(
            jnp.asarray(rays), jnp.asarray(depth), Kfd,
            depth_std=0.07, noise=jnp.asarray(nse),
        )
        np.testing.assert_allclose(np.asarray(z_c), z_c_ref.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(z_f), z_f_ref.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(z_d), z_d_ref.numpy(), atol=1e-6)
