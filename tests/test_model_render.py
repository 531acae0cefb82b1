import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.parallel import bind_parallel, make_mesh
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.utils.camera import gen_rays, gen_rays_yolo

NERF_CONF = textwrap.dedent(
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
                     d_hidden = 128
                     combine_layer = 3
                     combine_type = average }
        mlp_fine { type = resnet
                   n_blocks = 5
                   d_hidden = 128
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
    """
)

YOLO_CONF = textwrap.dedent(
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
                     d_hidden = 128
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
               n_coarse = 8
               n_fine = 0
               white_bkgd = False
               eval_batch_size = 128 }
    """
)


def _random_c2w(rng, n):
    out = []
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
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R
        m[:3, 3] = rng.normal(size=3) * 0.2 + np.array([0, 0, 1.3])
        out.append(m)
    return np.stack(out)


@pytest.fixture(scope="module")
def nerf_setup():
    rng = np.random.default_rng(7)
    conf = parse_string(NERF_CONF)
    model = make_model(conf.get_config("model"))
    NS, H, W = 2, 32, 32
    images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
    poses = _random_c2w(rng, NS)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
    # (SB=1, NS, 3, H, W): 4-dim input would mean NS objects of 1 view each
    # (models.py:102-112)
    cond = model.encode(
        variables, jnp.asarray(images[None]), jnp.asarray(poses[None]),
        jnp.asarray(np.float32(30.0)),
    )
    assert cond.num_views_per_obj == 2
    return conf, model, variables, cond, poses


class TestPixelNeRFModel:
    def test_d_in_layout(self, nerf_setup):
        conf, model, *_ = nerf_setup
        # use_xyz(3) -> PE(6 freqs, include input: 3+36=39) -> +viewdirs(3)=42
        assert model.d_in == 42
        assert model.latent_size == 128  # resnet18 stem+layer1 = 64+64
        assert model.d_latent == 128
        assert model.d_out == 4

    def test_forward_shapes_and_ranges(self, nerf_setup):
        conf, model, variables, cond, poses = nerf_setup
        rng = np.random.default_rng(3)
        SB, B = 1, 16
        xyz = rng.normal(size=(SB, B, 3)).astype(np.float32)
        dirs = rng.normal(size=(SB, B, 3)).astype(np.float32)
        out = np.asarray(
            model.forward(variables, cond, jnp.asarray(xyz),
                          viewdirs=jnp.asarray(dirs))
        )
        assert out.shape == (SB, B, 4)
        assert (out[..., :3] >= 0).all() and (out[..., :3] <= 1).all()
        assert (out[..., 3] >= 0).all()

    def test_multiview_fusion_view_permutation_invariant(self, nerf_setup):
        """Mean fusion at combine layer: encoding views in swapped order
        gives the same field (for SB=1)."""
        conf, model, variables, cond, poses = nerf_setup
        rng = np.random.default_rng(4)
        images = np.asarray(cond.latent_flat)  # not used; re-encode swapped
        NS, H, W = 2, 32, 32
        imgs = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        p = _random_c2w(rng, NS)
        c1 = model.encode(variables, jnp.asarray(imgs[None]), jnp.asarray(p[None]),
                          jnp.asarray(np.float32(30.0)))
        c2 = model.encode(variables, jnp.asarray(imgs[::-1].copy()[None]),
                          jnp.asarray(p[::-1].copy()[None]),
                          jnp.asarray(np.float32(30.0)))
        xyz = rng.normal(size=(1, 8, 3)).astype(np.float32)
        dirs = rng.normal(size=(1, 8, 3)).astype(np.float32)
        o1 = np.asarray(model.forward(variables, c1, jnp.asarray(xyz),
                                      viewdirs=jnp.asarray(dirs)))
        o2 = np.asarray(model.forward(variables, c2, jnp.asarray(xyz),
                                      viewdirs=jnp.asarray(dirs)))
        np.testing.assert_allclose(o1, o2, atol=1e-5)


class TestYoloModel:
    @pytest.fixture(scope="class")
    def yolo_setup(self):
        rng = np.random.default_rng(11)
        conf = parse_string(YOLO_CONF)
        model = make_model(conf.get_config("model"))
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        # world-to-cam extrinsics: put cameras looking at origin-ish
        ext = np.linalg.inv(_random_c2w(rng, NS)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        return conf, model, variables, images, ext, focal, c

    def test_raw_output_and_d_out(self, yolo_setup):
        conf, model, variables, images, ext, focal, c = yolo_setup
        assert model.yolo and model.d_out == 21
        cond = model.encode(variables, jnp.asarray(images[None]),
                            jnp.asarray(ext[None]),
                            jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        rng = np.random.default_rng(5)
        xyz = rng.normal(size=(1, 8, 3)).astype(np.float32)
        dirs = rng.normal(size=(1, 8, 3)).astype(np.float32)
        out = np.asarray(model.forward(variables, cond, jnp.asarray(xyz),
                                       viewdirs=jnp.asarray(dirs)))
        assert out.shape == (1, 8, 21)
        assert np.isfinite(out).all()

    def test_behind_camera_latents_zeroed(self, yolo_setup):
        """Points with cam-space z >= 0 ignore image content entirely
        (models.py:254-264): different images, same output."""
        conf, model, variables, images, ext, focal, c = yolo_setup
        rng = np.random.default_rng(6)
        # identity extrinsics: cam space == world space; z>=0 is 'behind'
        ident = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
        images2 = rng.normal(size=images.shape).astype(np.float32).clip(-1, 1)
        cond_a = model.encode(variables, jnp.asarray(images[None]),
                              jnp.asarray(ident[None]),
                              jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        cond_b = model.encode(variables, jnp.asarray(images2[None]),
                              jnp.asarray(ident[None]),
                              jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        xyz = rng.normal(size=(1, 10, 3)).astype(np.float32)
        xyz[..., 2] = np.abs(xyz[..., 2]) + 0.1  # all z > 0
        dirs = rng.normal(size=(1, 10, 3)).astype(np.float32)
        oa = np.asarray(model.forward(variables, cond_a, jnp.asarray(xyz),
                                      viewdirs=jnp.asarray(dirs)))
        ob = np.asarray(model.forward(variables, cond_b, jnp.asarray(xyz),
                                      viewdirs=jnp.asarray(dirs)))
        np.testing.assert_allclose(oa, ob, atol=1e-6)
        # sanity: points in FRONT (z<0) must differ between images
        xyz_front = xyz.copy()
        xyz_front[..., 2] = -np.abs(xyz_front[..., 2]) - 0.5
        of_a = np.asarray(model.forward(variables, cond_a, jnp.asarray(xyz_front),
                                        viewdirs=jnp.asarray(dirs)))
        of_b = np.asarray(model.forward(variables, cond_b, jnp.asarray(xyz_front),
                                        viewdirs=jnp.asarray(dirs)))
        assert not np.allclose(of_a, of_b, atol=1e-6)


class TestRenderers:
    def test_nerf_render_full(self, nerf_setup):
        conf, model, variables, cond, poses = nerf_setup
        renderer = make_renderer(conf)
        assert renderer.using_fine
        H = W = 4
        rays = gen_rays(jnp.asarray(poses[:1]), W, H, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)
        out = renderer(model, variables, cond, rays, jax.random.PRNGKey(3),
                       want_weights=True)
        assert set(out.keys()) == {"coarse", "fine"}
        for branch in ("coarse", "fine"):
            assert out[branch]["rgb"].shape == (1, H * W, 3)
            assert out[branch]["depth"].shape == (1, H * W)
        assert out["coarse"]["weights"].shape == (1, H * W, 8)
        assert out["fine"]["weights"].shape == (1, H * W, 8 + 4)
        rgb = np.asarray(out["fine"]["rgb"])
        assert (rgb >= 0).all() and (rgb <= 2).all()  # sigmoid + white bkgd

    def test_nerf_render_sharded_matches_single(self, nerf_setup):
        """Multi-chip test on the virtual 8-device CPU mesh: ray sharding
        must not change the result (same rng)."""
        conf, model, variables, cond, poses = nerf_setup
        renderer = make_renderer(conf)
        rays = gen_rays(jnp.asarray(poses[:1]), 4, 4, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)
        rng_key = jax.random.PRNGKey(9)

        bound1 = bind_parallel(renderer, model, mesh=make_mesh(n_devices=1))
        bound8 = bind_parallel(renderer, model,
                               mesh=make_mesh(jax.devices()[:8]))
        assert bound8.n_shards == 8
        o1 = bound1(variables, cond, rays, rng_key)
        o8 = bound8(variables, cond, rays, rng_key)
        np.testing.assert_allclose(
            np.asarray(o1["fine"]["rgb"]), np.asarray(o8["fine"]["rgb"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(o1["coarse"]["depth"]), np.asarray(o8["coarse"]["depth"]),
            atol=1e-5,
        )

    def test_fine_latent_reuse_matches_recompute(self, nerf_setup):
        """The fine-pass latent-reuse path (coarse gathers kept, outputs
        permuted into sorted-z order) must be bitwise equal to the plain
        recompute path."""
        conf, model, variables, cond, poses = nerf_setup
        renderer = make_renderer(conf)
        rays = gen_rays(jnp.asarray(poses[:1]), 4, 4, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)
        key = jax.random.PRNGKey(21)
        out_reuse = renderer(model, variables, cond, rays, key,
                             want_weights=True)

        class NoReuse:
            """model proxy hiding project_latent from the renderer gate."""

            project_latent = None

            def __init__(self, m):
                self._m = m

            def __getattr__(self, name):
                return getattr(self._m, name)

        out_plain = renderer(NoReuse(model), variables, cond, rays, key,
                             want_weights=True)
        for branch in ("coarse", "fine"):
            for k in ("rgb", "depth", "weights"):
                np.testing.assert_array_equal(
                    np.asarray(out_reuse[branch][k]),
                    np.asarray(out_plain[branch][k]),
                )

    def test_fine_latent_reuse_matches_recompute_bf16(self):
        """bf16-policy variant: the fine-pass latent reuse must stay
        bitwise equal to the recompute path under the production bf16
        compute policy (the model head still emits f32, so the union
        sort itself is dtype-invariant)."""
        rng = np.random.default_rng(7)
        conf = parse_string(NERF_CONF)
        conf.put("model.compute_dtype", "bfloat16")
        model = make_model(conf.get_config("model"))
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        poses = _random_c2w(rng, NS)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        cond = model.encode(
            variables, jnp.asarray(images[None]), jnp.asarray(poses[None]),
            jnp.asarray(np.float32(30.0)),
        )
        renderer = make_renderer(conf)
        rays = gen_rays(jnp.asarray(poses[:1]), 4, 4, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)
        key = jax.random.PRNGKey(21)
        out_reuse = renderer(model, variables, cond, rays, key,
                             want_weights=True)

        class NoReuse:
            project_latent = None

            def __init__(self, m):
                self._m = m

            def __getattr__(self, name):
                return getattr(self._m, name)

        out_plain = renderer(NoReuse(model), variables, cond, rays, key,
                             want_weights=True)
        for branch in ("coarse", "fine"):
            for k in ("rgb", "depth", "weights"):
                np.testing.assert_allclose(
                    np.asarray(out_reuse[branch][k], np.float32),
                    np.asarray(out_plain[branch][k], np.float32),
                    atol=1e-6, rtol=1e-6,
                )

    def test_nerf_simple_output_and_empty_guard(self, nerf_setup):
        conf, model, variables, cond, poses = nerf_setup
        renderer = make_renderer(conf)
        bound = bind_parallel(renderer, model, simple_output=True)
        rays = gen_rays(jnp.asarray(poses[:1]), 2, 2, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)
        rgb, depth = bound(variables, cond, rays, jax.random.PRNGKey(0))
        assert rgb.shape == (1, 4, 3) and depth.shape == (1, 4)
        rgb0, depth0 = bound(variables, cond, jnp.zeros((0, 4, 8)),
                             jax.random.PRNGKey(0))
        assert rgb0.shape[0] == 0 and depth0.shape[0] == 0

    def test_yolo_render(self):
        rng = np.random.default_rng(12)
        conf = parse_string(YOLO_CONF)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        ext = np.linalg.inv(_random_c2w(rng, NS)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        cond = model.encode(variables, jnp.asarray(images[None]),
                            jnp.asarray(ext[None]),
                            jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        cam_rays = gen_rays_yolo(jnp.asarray(ext[:1]), 3, 2,
                                 jnp.asarray(focal / 16), jnp.asarray(c / 16),
                                 1.0, 13.0)
        rays = cam_rays.reshape(-1, 8)
        out = np.asarray(renderer(model, variables, cond, rays,
                                  jax.random.PRNGKey(2)))
        assert out.shape == (6, 3, 7)
        assert (out[..., 0] >= 0).all() and (out[..., 0] <= 1).all()  # max prob
        assert np.isfinite(out).all()

    def test_yolo_soft_count_aggregation(self):
        """renderer.aggregation = soft_count plumbs from conf through both
        the unchunked and chunked render paths (chunk-size invariant), and
        changes only the prob channel vs the reference max aggregation."""
        import dataclasses

        from pixelnerf_yolo_tpu.render.yolo import YoloRenderer

        rng = np.random.default_rng(14)
        conf = parse_string(
            YOLO_CONF + "\nrenderer.aggregation = soft_count"
            "\nrenderer.agg_soft_count = 3.5\n"
        )
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        assert renderer.aggregation == "soft_count"
        assert renderer.agg_soft_count == 3.5
        NS = 2
        images = rng.normal(size=(NS, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        ext = np.linalg.inv(_random_c2w(rng, NS)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        cond = model.encode(variables, jnp.asarray(images[None]),
                            jnp.asarray(ext[None]),
                            jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        rays = gen_rays_yolo(jnp.asarray(ext[:1]), 3, 2,
                             jnp.asarray(focal / 16), jnp.asarray(c / 16),
                             1.0, 13.0).reshape(-1, 8)
        key = jax.random.PRNGKey(2)
        out_sc = np.asarray(renderer(model, variables, cond, rays, key))
        assert out_sc.shape == (6, 3, 7)
        assert (out_sc[..., 0] >= 0).all() and (out_sc[..., 0] < 1).all()

        # values identical to max aggregation; prob channel differs
        out_max = np.asarray(
            dataclasses.replace(renderer, aggregation="max")(
                model, variables, cond, rays, key)
        )
        np.testing.assert_allclose(out_sc[..., 1:], out_max[..., 1:],
                                   atol=1e-6)
        assert not np.allclose(out_sc[..., 0], out_max[..., 0], atol=1e-4)

        class Chunked(YoloRenderer):
            def chunk_rays_for(self, *a, **k):
                return 2

        out_chunked = np.asarray(
            Chunked(**dataclasses.asdict(renderer))(
                model, variables, cond, rays, key)
        )
        np.testing.assert_allclose(out_sc, out_chunked, atol=1e-5)

        # gated_count + agg_gamma plumb from conf too; the gated prob is
        # bounded by the max prob (prob = max * squash, squash < 1)
        conf_g = parse_string(
            YOLO_CONF + "\nrenderer.aggregation = gated_count"
            "\nrenderer.agg_gamma = 2.0\n"
        )
        renderer_g = make_renderer(conf_g)
        assert renderer_g.aggregation == "gated_count"
        assert renderer_g.agg_gamma == 2.0
        out_g = np.asarray(renderer_g(model, variables, cond, rays, key))
        np.testing.assert_allclose(out_g[..., 1:], out_max[..., 1:],
                                   atol=1e-6)
        assert (out_g[..., 0] <= out_max[..., 0] + 1e-6).all()

    def test_yolo_render_sharded_matches_single(self):
        rng = np.random.default_rng(13)
        conf = parse_string(YOLO_CONF)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        ext = np.linalg.inv(_random_c2w(rng, 2)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        cond = model.encode(variables, jnp.asarray(images[None]),
                            jnp.asarray(ext[None]),
                            jnp.asarray(focal[None]), c=jnp.asarray(c[None]))
        rays16 = np.asarray(
            gen_rays_yolo(jnp.asarray(ext[:1]), 4, 4, jnp.asarray(focal / 8),
                          jnp.asarray(c / 8), 1.0, 13.0)
        ).reshape(-1, 8)  # 16 rays: divisible -> bitwise-comparable RNG
        key = jax.random.PRNGKey(4)
        b1 = bind_parallel(renderer, model, mesh=make_mesh(n_devices=1))
        b8 = bind_parallel(renderer, model, mesh=make_mesh(jax.devices()[:8]))
        o1 = np.asarray(b1(variables, cond, jnp.asarray(rays16), key))
        o8 = np.asarray(b8(variables, cond, jnp.asarray(rays16), key))
        assert o1.shape == (16, 3, 7)
        np.testing.assert_allclose(o1, o8, atol=1e-5)

        # non-divisible count exercises the padding path (RNG differs from
        # the unpadded draw, so only shape/validity is checked)
        rays9 = jnp.asarray(rays16[:9])
        o9 = np.asarray(b8(variables, cond, rays9, key))
        assert o9.shape == (9, 3, 7)
        assert np.isfinite(o9).all()


class TestLatentInt8:
    """Serving-mode int8 latent table (model.latent_int8): close to the
    exact path at eval, ignored at train time (quantization would zero
    encoder gradients through round())."""

    def test_eval_encode_quantizes_and_renders_close(self, nerf_setup, rng):
        conf, model, variables, cond, poses = nerf_setup
        import copy

        conf2 = parse_string(NERF_CONF)
        conf2.put("model.latent_int8", True)
        model8 = make_model(conf2.get_config("model"))
        images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        cond8 = model8.encode(
            variables, jnp.asarray(images[None]),
            jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)[None]),
            jnp.asarray(np.float32(30.0)),
        )
        assert cond8.latent_flat.dtype == jnp.int8
        assert cond8.latent_scales is not None
        cond_exact = model.encode(
            variables, jnp.asarray(images[None]),
            jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)[None]),
            jnp.asarray(np.float32(30.0)),
        )
        renderer = make_renderer(conf)
        rays = gen_rays(jnp.asarray(np.eye(4, dtype=np.float32)[None]), 4, 4,
                        jnp.float32(30.0), 0.8, 1.8).reshape(1, -1, 8)
        key = jax.random.PRNGKey(5)
        o8 = renderer(model8, variables, cond8, rays, key)
        oe = renderer(model, variables, cond_exact, rays, key)
        np.testing.assert_allclose(
            np.asarray(o8["coarse"]["rgb"]), np.asarray(oe["coarse"]["rgb"]),
            atol=0.05,
        )

    def test_train_encode_keeps_exact_path(self, nerf_setup, rng):
        conf, model, variables, cond, poses = nerf_setup
        conf2 = parse_string(NERF_CONF)
        conf2.put("model.latent_int8", True)
        model8 = make_model(conf2.get_config("model"))
        images = rng.normal(size=(1, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        cond_t, _ = model8.encode(
            variables, jnp.asarray(images[None]),
            jnp.asarray(np.eye(4, dtype=np.float32)[None][None]),
            jnp.asarray(np.float32(30.0)), train=True,
        )
        assert cond_t.latent_flat.dtype != jnp.int8
        assert cond_t.latent_scales is None


class TestChunkInvariance:
    """Render results must not depend on the internal ray-chunk size: the
    per-ray randomness is drawn globally, so chunked and unchunked renders
    agree to float rounding (differently-fused XLA programs differ by
    1-2 ulp) — eval results can't depend on eval_batch_size."""

    def test_chunked_matches_unchunked(self, nerf_setup):
        import dataclasses

        conf, model, variables, cond, poses = nerf_setup
        renderer = make_renderer(conf)
        rays = gen_rays(jnp.asarray(poses[:1]), 8, 8, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)  # 64 rays
        key = jax.random.PRNGKey(33)
        out_big = renderer(model, variables, cond, rays, key,
                           want_weights=True)

        # force chunking (16 rays/chunk): the eval_batch_size knob floors
        # at ~2M rows, so shrink via a subclass override
        class Tiny(type(renderer)):
            def _chunk_rays(self, n_rays_per_scene, n_views=1,
                            latent_width=512, grad_remat=False):
                return 16
        tiny = Tiny(**{f.name: getattr(renderer, f.name)
                       for f in dataclasses.fields(renderer)})
        out_small = tiny(model, variables, cond, rays, key,
                         want_weights=True)
        for branch in out_big:
            for k in out_big[branch]:
                np.testing.assert_allclose(
                    np.asarray(out_big[branch][k]),
                    np.asarray(out_small[branch][k]),
                    rtol=1e-5, atol=1e-5, err_msg=f"{branch}/{k}",
                )

    def test_chunked_fused_with_sigma_noise(self, nerf_setup):
        """train + noise_std > 0 must keep the fused chunked path active
        (the noise arrays are pre-drawn full-batch and sliced per chunk),
        and its output must match the unchunked path bit-for-float."""
        import dataclasses

        conf, model, variables, cond, poses = nerf_setup
        renderer = dataclasses.replace(make_renderer(conf), noise_std=0.5)
        rays = gen_rays(jnp.asarray(poses[:1]), 8, 8, jnp.float32(30.0),
                        0.8, 1.8).reshape(1, -1, 8)  # 64 rays
        key = jax.random.PRNGKey(34)
        out_big = renderer(model, variables, cond, rays, key, train=True)

        calls = []

        class Tiny(type(renderer)):
            def _chunk_rays(self, n_rays_per_scene, n_views=1,
                            latent_width=512, grad_remat=False):
                return 16

            def _render_chunked_fused(self, *a, **k):
                calls.append(1)
                return super()._render_chunked_fused(*a, **k)

        tiny = Tiny(**{f.name: getattr(renderer, f.name)
                       for f in dataclasses.fields(renderer)})
        out_small = tiny(model, variables, cond, rays, key, train=True)
        assert calls, "noise_std disabled the fused chunked path"
        for branch in out_big:
            for k in out_big[branch]:
                np.testing.assert_allclose(
                    np.asarray(out_big[branch][k]),
                    np.asarray(out_small[branch][k]),
                    rtol=1e-5, atol=1e-5, err_msg=f"{branch}/{k}",
                )


class TestLatentPreprojection:
    """bf16 single-MLP mode projects the latent TABLE through the lin_z
    weights at encode time (models/pixelnerf.py); bilinear interp commutes
    with the linear map, so outputs must match the per-point form."""

    def _build(self, dtype, preproject):
        conf = parse_string(YOLO_CONF)
        conf.put("model.compute_dtype", dtype)
        conf.put("model.latent_preproject", preproject)
        model = make_model(conf.get_config("model"))
        return model

    def test_projected_matches_per_point_form(self):
        rng = np.random.default_rng(11)
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        ext = np.linalg.inv(_random_c2w(rng, NS)).astype(np.float32)
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        xyz = rng.normal(size=(1, 24, 3)).astype(np.float32)
        dirs = rng.normal(size=(1, 24, 3)).astype(np.float32)

        m_pp = self._build("bfloat16", True)
        m_raw = self._build("bfloat16", False)
        assert m_pp.preproject and not m_raw.preproject
        variables = m_pp.init(jax.random.PRNGKey(0), jnp.asarray(images))

        outs = {}
        for name, m in (("pp", m_pp), ("raw", m_raw)):
            cond = m.encode(
                variables, jnp.asarray(images[None]), jnp.asarray(ext[None]),
                jnp.asarray(focal[None]), c=jnp.asarray(c[None]),
            )
            if name == "pp":
                cl, dh = 3, m.mlp_coarse.d_hidden
                assert cond.latent_projected
                assert cond.latent_flat.shape[-1] == cl * dh
            outs[name] = np.asarray(
                m.forward(variables, cond, jnp.asarray(xyz),
                          viewdirs=jnp.asarray(dirs)),
                np.float32,
            )
        # linear-commute identity up to bf16 reassociation
        np.testing.assert_allclose(outs["pp"], outs["raw"], atol=0.05,
                                   rtol=0.05)

    def test_fp32_mode_never_projects(self):
        m = self._build("float32", True)
        assert not m.preproject  # fp32 keeps the reference-exact path

    def test_behind_camera_points_get_bias_injection(self):
        """Reference semantics: zeroed latent -> lin_z(0) = bias.  In
        projected mode the zeroing happens on the gathered projection and
        the bias is added afterwards — outputs must still ignore image
        content for z >= 0 points."""
        rng = np.random.default_rng(6)
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        images2 = rng.normal(size=images.shape).astype(np.float32).clip(-1, 1)
        ident = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
        focal = np.array([20.0, 20.0], np.float32)
        c = np.array([16.0, 16.0], np.float32)
        m = self._build("bfloat16", True)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(images))
        xyz = rng.normal(size=(1, 10, 3)).astype(np.float32)
        xyz[..., 2] = np.abs(xyz[..., 2]) + 0.1
        dirs = rng.normal(size=(1, 10, 3)).astype(np.float32)
        oa = ob = None
        for im in (images, images2):
            cond = m.encode(
                variables, jnp.asarray(im[None]), jnp.asarray(ident[None]),
                jnp.asarray(focal[None]), c=jnp.asarray(c[None]),
            )
            out = np.asarray(
                m.forward(variables, cond, jnp.asarray(xyz),
                          viewdirs=jnp.asarray(dirs))
            )
            oa, ob = ob, out
        np.testing.assert_allclose(oa, ob, atol=1e-6)


class TestSchedStep:
    """Sample-count schedule (reference nerf.py:324-344; shipped confs use
    sched=[] so this machinery is otherwise never exercised)."""

    def test_schedule_advances_on_thresholds(self):
        from pixelnerf_yolo_tpu.render.nerf import NeRFRenderer

        r = NeRFRenderer(n_coarse=64, n_fine=32,
                         sched=((100, 200), (96, 128), (48, 64)))
        state = {}
        r1, state = r.sched_step(state, steps=99)
        assert (r1.n_coarse, r1.n_fine) == (64, 32)  # below 1st threshold
        r2, state = r1.sched_step(state, steps=1)    # iter 100: 1st fires
        assert (r2.n_coarse, r2.n_fine) == (96, 48)
        assert state["last_sched"] == 1
        r3, state = r2.sched_step(state, steps=150)  # iter 250: 2nd fires
        assert (r3.n_coarse, r3.n_fine) == (128, 64)
        assert state["last_sched"] == 2
        r4, state = r3.sched_step(state, steps=1000)  # exhausted: no-op
        assert (r4.n_coarse, r4.n_fine) == (128, 64)

    def test_no_sched_is_identity(self):
        from pixelnerf_yolo_tpu.render.nerf import NeRFRenderer

        r = NeRFRenderer(n_coarse=64, n_fine=32, sched=None)
        r2, state = r.sched_step({"iter_idx": 5}, steps=10)
        assert r2 is r and state == {"iter_idx": 5}
