"""W8A8 dynamic-int8 serving mode (nn/quant.py, model.mlp_int8).

The int8 path is an approximation lever for serving (2x MXU rate on
v5e); these tests pin its error envelope and its safety properties:
params/checkpoint layout unchanged, training path unaffected (the
rounding has zero gradient, so it MUST be gated off under train).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.nn.quant import dot_w8a8, quantize_cols, quantize_rows
from pixelnerf_yolo_tpu.nn.resnetfc import ResnetFC


class TestDotW8A8:
    def test_matches_f32_within_quant_error(self):
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(256, 512)).astype(np.float32))
        w = jnp.asarray(r.normal(size=(512, 256)).astype(np.float32) * 0.05)
        ref = x @ w
        got = dot_w8a8(x, w)
        # int32 accumulation is exact; error comes only from the two
        # roundings — relative to the row/col magnitudes, ~1e-2
        denom = float(jnp.abs(ref).max())
        assert float(jnp.abs(got - ref).max()) / denom < 0.02
        # correlation sanity
        c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())
        assert c[0, 1] > 0.9999

    def test_zero_rows_and_zero_weights(self):
        x = jnp.zeros((4, 16))
        w = jnp.zeros((16, 8))
        out = dot_w8a8(x, w)
        assert out.shape == (4, 8)
        assert float(jnp.abs(out).max()) == 0.0  # eps guards, no NaN

    def test_quantizers_round_trip(self):
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(32, 64)).astype(np.float32))
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8
        back = q.astype(jnp.float32) * s
        assert float(jnp.abs(back - x).max()) <= float(s.max()) * 0.5 + 1e-6
        qc, sc = quantize_cols(x)
        backc = qc.astype(jnp.float32) * sc
        assert float(jnp.abs(backc - x).max()) <= float(sc.max()) * 0.5 + 1e-6

    def test_int8_saturation_clip(self):
        # one huge outlier per row sets the scale; others quantize coarse
        # but never overflow
        x = jnp.asarray([[1000.0, 1.0, -1.0, 0.5]])
        w = jnp.eye(4)
        out = dot_w8a8(x, w)
        assert float(out[0, 0]) == pytest.approx(1000.0, rel=0.01)
        assert np.isfinite(np.asarray(out)).all()


class TestResnetFCInt8:
    def _mk(self, d_latent=64, d_hidden=64, merge=False):
        mlp = ResnetFC(
            d_out=4, n_blocks=5, d_latent=d_latent, d_hidden=d_hidden,
            combine_layer=3, dtype="bfloat16",
        )
        r = np.random.default_rng(2)
        n = (1 << 17) if merge else 512  # >=2^17 rows engage merged lin_z
        zx = jnp.asarray(
            r.normal(size=(n, d_latent + 42)).astype(np.float32)
        )
        variables = mlp.init(jax.random.PRNGKey(0), zx[:2])
        # fc_1 is zero-init; perturb so blocks actually transform
        variables = jax.tree.map(
            lambda a: a + 0.02 * np.random.default_rng(3).normal(
                size=a.shape
            ).astype(np.float32),
            variables,
        )
        return mlp, variables, zx

    def test_int8_close_to_bf16(self):
        mlp, variables, zx = self._mk()
        ref = np.asarray(
            mlp.apply(variables, zx, combine_inner_dims=(1,)),
            np.float32,
        )
        got = np.asarray(
            mlp.apply(variables, zx, combine_inner_dims=(1,), int8=True),
            np.float32,
        )
        # 5 chained quantized blocks on a bf16 baseline: loose but real
        # bound — catches a wrong scale/axis immediately (that would be
        # O(1) error), passes on correct quantization noise
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / denom < 0.08
        assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.995

    def test_int8_param_layout_unchanged(self):
        """The int8 path binds the same param tree (checkpoint compat)."""
        mlp, variables, zx = self._mk()
        v8 = mlp.init(jax.random.PRNGKey(0), zx[:2], int8=True)
        assert jax.tree.structure(v8) == jax.tree.structure(variables)
        for a, b in zip(jax.tree.leaves(v8), jax.tree.leaves(variables)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_int8_merged_linz_path(self):
        """At merge-gate row counts the merged lin_z matmul also runs
        int8 (same error envelope)."""
        mlp, variables, zx = self._mk(merge=True)
        ref = np.asarray(
            mlp.apply(variables, zx, combine_inner_dims=(1,)), np.float32
        )
        got = np.asarray(
            mlp.apply(variables, zx, combine_inner_dims=(1,), int8=True),
            np.float32,
        )
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(got - ref).max() / denom < 0.08


class TestModelGating:
    CONF = """
            model {
                use_encoder = true
                use_xyz = true
                use_code = true
                use_viewdirs = true
                use_code_viewdirs = false
                compute_dtype = bfloat16
                mlp_int8 = true
                code {
                    num_freqs = 6
                    freq_factor = 1.5
                }
                encoder {
                    backbone = resnet34
                    num_layers = 4
                    pretrained = false
                }
                mlp_coarse {
                    type = resnet
                    n_blocks = 5
                    d_hidden = 64
                    combine_layer = 3
                    combine_type = average
                }
                mlp_fine {
                    type = empty
                }
            }
            """

    def _model(self, int8=True):
        from pixelnerf_yolo_tpu.config.hocon import parse_string
        from pixelnerf_yolo_tpu.models import make_model

        conf = parse_string(
            self.CONF if int8 else self.CONF.replace(
                "mlp_int8 = true", "mlp_int8 = false"
            )
        )
        model = make_model(conf.get_config("model"))
        r = np.random.default_rng(0)
        images = jnp.asarray(
            r.normal(size=(1, 2, 3, 32, 32)).astype(np.float32).clip(-1, 1)
        )
        poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
        poses[:, 2, 3] = 1.3
        variables = model.init(jax.random.PRNGKey(0), images[0])
        # fc_1 layers are zero-init (identity blocks) — perturb so the
        # quantized matmuls have observable effect
        variables = jax.tree.map(
            lambda a: a + 0.02 * np.random.default_rng(3).normal(
                size=a.shape
            ).astype(np.float32)
            if a.dtype == jnp.float32 else a,
            variables,
        )
        return model, variables, images, jnp.asarray(poses[None])

    def test_int8_with_implicit_mlp_rejected_at_construction(self):
        # ImplicitNet's __call__ has no int8 path; the combination must
        # fail at make_model, not TypeError at the first render
        from pixelnerf_yolo_tpu.config.hocon import parse_string
        from pixelnerf_yolo_tpu.models import make_model

        conf = parse_string(
            self.CONF.replace("type = resnet", "type = mlp")
        )
        with pytest.raises(ValueError, match="mlp_int8"):
            make_model(conf.get_config("model"))

    def test_train_encode_disables_int8(self):
        model, variables, images, poses = self._model()
        focal = jnp.asarray([[30.0, 30.0]])
        cond_eval = model.encode(variables, images, poses, focal)
        cond_train, _ = model.encode(
            variables, images, poses, focal, train=True
        )
        assert cond_eval.mlp_int8 is True
        assert cond_train.mlp_int8 is False

    def test_forward_int8_close_and_differs_bitwise(self):
        model, variables, images, poses = self._model()
        model_f, _, _, _ = self._model(int8=False)  # same conf minus flag
        focal = jnp.asarray([[30.0, 30.0]])
        # identical eval-mode encoders -> identical latents; only the
        # field MLP's matmul path differs
        cond = model.encode(variables, images, poses, focal)
        cond_f = model_f.encode(variables, images, poses, focal)
        assert cond.mlp_int8 and not cond_f.mlp_int8
        r = np.random.default_rng(4)
        xyz = jnp.asarray(r.normal(size=(1, 128, 3)).astype(np.float32) * 0.3)
        vd = jnp.asarray(r.normal(size=(1, 128, 3)).astype(np.float32))
        out8 = np.asarray(
            model.forward(variables, cond, xyz, viewdirs=vd), np.float32
        )
        ref = np.asarray(
            model_f.forward(variables, cond_f, xyz, viewdirs=vd), np.float32
        )
        assert np.isfinite(out8).all()
        # rgb is post-sigmoid in [0,1]; int8 should track closely
        assert np.abs(out8[..., :3] - ref[..., :3]).max() < 0.12
        assert np.abs(out8 - ref).max() > 0  # int8 actually engaged
