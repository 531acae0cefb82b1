"""Pallas fused-MLP kernel parity vs the flax ResnetFC path (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.nn.resnetfc import ResnetFC
from pixelnerf_yolo_tpu.ops.pallas.fused_mlp import fused_resnetfc


def make_mlp_and_params(rng_key, d_latent=64, d_in=42, d_hidden=64,
                        n_blocks=5, combine_layer=3):
    mlp = ResnetFC(d_out=4, n_blocks=n_blocks, d_latent=d_latent,
                   d_hidden=d_hidden, combine_layer=combine_layer,
                   combine_type="average")
    zx = jnp.zeros((2, d_latent + d_in))
    variables = mlp.init(rng_key, zx)
    # fc_1 is zero-init; give it signal so the parity test is non-trivial
    params = jax.tree.map(
        lambda x: x
        + 0.01 * jax.random.normal(jax.random.PRNGKey(9), x.shape),
        variables["params"],
    )
    return mlp, params


class TestFusedResnetFC:
    @pytest.mark.parametrize("ns", [1, 3])
    def test_matches_flax(self, rng, ns):
        d_latent, d_in = 64, 42
        SB, B = 2, 16
        mlp, params = make_mlp_and_params(jax.random.PRNGKey(0),
                                          d_latent=d_latent, d_in=d_in)
        latent = rng.normal(size=(SB * ns * B, d_latent)).astype(np.float32)
        zfeat = rng.normal(size=(SB * ns * B, d_in)).astype(np.float32)

        def xla(p, lt, zf):
            zx = jnp.concatenate([lt, zf], axis=-1)
            return mlp.apply({"params": p}, zx,
                             combine_inner_dims=(ns, B)).reshape(-1, 4)

        ref = np.asarray(xla(params, jnp.asarray(latent), jnp.asarray(zfeat)))
        got = np.asarray(
            fused_resnetfc(
                params, jnp.asarray(latent), jnp.asarray(zfeat),
                5, 3, ns, B, jnp.dtype(jnp.float32), xla,
            )
        )
        assert got.shape == (SB * B, 4)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_gradients_match_flax(self, rng):
        """custom_vjp backward must equal the plain flax gradient."""
        ns, B = 1, 8
        mlp, params = make_mlp_and_params(jax.random.PRNGKey(1))
        latent = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
        zfeat = jnp.asarray(rng.normal(size=(B, 42)).astype(np.float32))

        def xla(p, lt, zf):
            zx = jnp.concatenate([lt, zf], axis=-1)
            return mlp.apply({"params": p}, zx,
                             combine_inner_dims=(ns, B)).reshape(-1, 4)

        def loss_fused(p, lt):
            out = fused_resnetfc(p, lt, zfeat, 5, 3, ns, B,
                                 jnp.dtype(jnp.float32), xla)
            return jnp.sum(out**2)

        def loss_ref(p, lt):
            return jnp.sum(xla(p, lt, zfeat) ** 2)

        gf_p, gf_l = jax.grad(loss_fused, argnums=(0, 1))(params, latent)
        gr_p, gr_l = jax.grad(loss_ref, argnums=(0, 1))(params, latent)
        np.testing.assert_allclose(np.asarray(gf_l), np.asarray(gr_l),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(gf_p), jax.tree.leaves(gr_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_nondivisible_rows_padded(self, rng):
        """Row counts that don't divide the tile still work (padding)."""
        ns, B = 1, 13  # 13 rows << tile
        mlp, params = make_mlp_and_params(jax.random.PRNGKey(2))
        latent = jnp.asarray(rng.normal(size=(B, 64)).astype(np.float32))
        zfeat = jnp.asarray(rng.normal(size=(B, 42)).astype(np.float32))

        def xla(p, lt, zf):
            zx = jnp.concatenate([lt, zf], axis=-1)
            return mlp.apply({"params": p}, zx,
                             combine_inner_dims=(ns, B)).reshape(-1, 4)

        got = np.asarray(
            fused_resnetfc(params, latent, zfeat, 5, 3, ns, B,
                           jnp.dtype(jnp.float32), xla)
        )
        ref = np.asarray(xla(params, latent, zfeat))
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestModelFusedPath:
    def test_forward_fused_matches_unfused(self, rng):
        conf_text = textwrap.dedent(
            """
            model {
                use_fused_mlp = %s
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
                             d_hidden = 64
                             combine_layer = 3
                             combine_type = average }
                mlp_fine { type = empty }
                encoder { backbone = resnet18
                          pretrained = False
                          num_layers = 2
                          index_padding = zeros }
            }
            """
        )
        NS, H, W = 2, 32, 32
        images = rng.normal(size=(1, NS, 3, H, W)).astype(np.float32).clip(-1, 1)
        poses = np.stack([np.eye(4, dtype=np.float32)] * NS)[None]
        poses[..., 2, 3] = 1.3

        xyz = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))
        outs = {}
        for flag in ("true", "false"):
            conf = parse_string(conf_text % flag)
            model = make_model(conf.get_config("model"))
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.asarray(images[0]))
            cond = model.encode(variables, jnp.asarray(images),
                                jnp.asarray(poses),
                                jnp.asarray(np.float32(30.0)))
            outs[flag] = np.asarray(
                model.forward(variables, cond, xyz, viewdirs=dirs)
            )
        np.testing.assert_allclose(outs["true"], outs["false"], atol=3e-5)


class TestVmemGating:
    def test_pick_tile_decision_table(self):
        """VMEM feasibility decisions measured against real compile
        outcomes on v5e (16 MiB scoped budget): bf16 flagship keeps the
        full tile; f32 x 1792-d (YOLO backbone) cannot fuse at all
        (weights alone are 17.4 MB) and must fall back to XLA."""
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.ops.pallas.fused_mlp import pick_tile

        table = {
            ("bfloat16", 512): 1024,
            ("float32", 512): 512,
            ("bfloat16", 1792): 512,
            ("float32", 1792): None,
            ("float32", 128): 1024,
        }
        for (dt, d_latent), want in table.items():
            got = pick_tile(42, d_latent, 512, 3, 5, jnp.dtype(dt))
            assert got == want, (dt, d_latent, got, want)

    def test_can_fuse_respects_vmem(self):
        """A model with the 1792-d custom backbone in f32 must refuse the
        fused path; the same model in bf16 must allow it."""
        import jax.numpy as jnp

        from pixelnerf_yolo_tpu.config.hocon import parse_string
        from pixelnerf_yolo_tpu.models import make_model

        conf_t = """
        use_encoder = True
        use_xyz = True
        use_code = True
        code {{ num_freqs = 6
               freq_factor = 1.5
               include_input = True }}
        use_viewdirs = True
        use_code_viewdirs = False
        compute_dtype = {dtype}
        use_fused_mlp = True
        mlp_coarse {{ type = resnet
                     n_blocks = 5
                     d_hidden = 512
                     combine_layer = 3
                     combine_type = average
                     d_out = 7
                     num_scales = 1
                     num_anchors_per_scale = 3
                     yolo = True }}
        mlp_fine {{ type = empty }}
        encoder {{ backbone = custom
                  pretrained = False }}
        """
        f32 = make_model(parse_string(conf_t.format(dtype="float32")))
        bf16 = make_model(parse_string(conf_t.format(dtype="bfloat16")))
        assert f32._can_fuse(f32.mlp_coarse, 3) is False
        assert bf16._can_fuse(bf16.mlp_coarse, 3) is True
