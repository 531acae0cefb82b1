import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.nn.mlp import ImplicitNet
from pixelnerf_yolo_tpu.nn.resnet import (
    ResNetFeatures,
    port_torch_state_dict,
)
from pixelnerf_yolo_tpu.nn.resnetfc import ResnetFC


class TestResNetFeatures:
    def test_multiscale_shapes_resnet34(self):
        model = ResNetFeatures(backbone="resnet34", num_layers=4)
        x = jnp.zeros((1, 64, 96, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert len(feats) == 4
        # stem H/2; layer1 H/4 (with first pool); layer2 H/8; layer3 H/16
        assert feats[0].shape == (1, 32, 48, 64)
        assert feats[1].shape == (1, 16, 24, 64)
        assert feats[2].shape == (1, 8, 12, 128)
        assert feats[3].shape == (1, 4, 6, 256)

    def test_no_first_pool(self):
        model = ResNetFeatures(backbone="resnet18", num_layers=2,
                               use_first_pool=False)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(variables, x)
        assert feats[1].shape == (1, 16, 16, 64)  # no extra downsample

    def test_batchnorm_train_updates_stats(self):
        model = ResNetFeatures(backbone="resnet18", num_layers=1)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        old = variables["batch_stats"]["BatchNorm_0"]["mean"]
        new = mutated["batch_stats"]["BatchNorm_0"]["mean"]
        assert not np.allclose(np.asarray(old), np.asarray(new))


class TestTorchPort:
    def test_port_matches_torch_resnet18_stem(self, rng):
        """Build a synthetic torchvision-style state dict, port it, and check
        the flax forward matches a torch forward of the same weights."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        H = W = 16
        sd = {}
        sd["conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.05
        sd["bn1.weight"] = torch.rand(64) + 0.5
        sd["bn1.bias"] = torch.randn(64) * 0.1
        sd["bn1.running_mean"] = torch.randn(64) * 0.1
        sd["bn1.running_var"] = torch.rand(64) + 0.5
        # layer1: 2 blocks of 64 (resnet18)
        for b in range(2):
            for conv in ["conv1", "conv2"]:
                sd[f"layer1.{b}.{conv}.weight"] = torch.randn(64, 64, 3, 3) * 0.03
            for bn in ["bn1", "bn2"]:
                sd[f"layer1.{b}.{bn}.weight"] = torch.rand(64) + 0.5
                sd[f"layer1.{b}.{bn}.bias"] = torch.randn(64) * 0.1
                sd[f"layer1.{b}.{bn}.running_mean"] = torch.randn(64) * 0.1
                sd[f"layer1.{b}.{bn}.running_var"] = torch.rand(64) + 0.5

        variables = port_torch_state_dict(sd, backbone="resnet18")
        model = ResNetFeatures(backbone="resnet18", num_layers=2)
        x = rng.normal(size=(1, H, W, 3)).astype(np.float32)
        feats = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )

        # torch forward (eval mode semantics)
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        def bn(v, pre):
            return F.batch_norm(
                v, sd[pre + ".running_mean"], sd[pre + ".running_var"],
                sd[pre + ".weight"], sd[pre + ".bias"], False, 0, 1e-5)
        v = F.conv2d(tx, sd["conv1.weight"], stride=2, padding=3)
        v = F.relu(bn(v, "bn1"))
        stem_ref = v.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(feats[0]), stem_ref, atol=5e-4)

        v = F.max_pool2d(v, 3, stride=2, padding=1)
        for b in range(2):
            idn = v
            v = F.conv2d(v, sd[f"layer1.{b}.conv1.weight"], stride=1, padding=1)
            v = F.relu(bn(v, f"layer1.{b}.bn1"))
            v = F.conv2d(v, sd[f"layer1.{b}.conv2.weight"], stride=1, padding=1)
            v = bn(v, f"layer1.{b}.bn2")
            v = F.relu(v + idn)
        layer1_ref = v.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(feats[1]), layer1_ref, atol=5e-3)


class TestResnetFC:
    def test_fresh_blocks_identity_path(self):
        """fc_1 is zero-init, so with no latent the output equals
        lin_out(act(lin_in(x))) exactly at init."""
        model = ResnetFC(d_out=4, n_blocks=5, d_latent=0, d_hidden=32)
        x = jax.random.normal(jax.random.PRNGKey(1), (10, 6))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        p = variables["params"]
        h = np.maximum(np.asarray(x) @ np.asarray(p["lin_in"]["kernel"]), 0)
        expected = h @ np.asarray(p["lin_out"]["kernel"])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_latent_injection_changes_output(self):
        model = ResnetFC(d_out=4, n_blocks=3, d_latent=8, d_hidden=16,
                         combine_layer=2)
        zx = jax.random.normal(jax.random.PRNGKey(1), (6, 8 + 5))
        variables = model.init(jax.random.PRNGKey(0), zx)
        out1 = model.apply(variables, zx)
        zx2 = zx.at[:, :8].set(zx[:, :8] + 1.0)
        out2 = model.apply(variables, zx2)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))
        # only lin_z_0, lin_z_1 exist (combine_layer=2 < n_blocks=3)
        assert "lin_z_0" in variables["params"]
        assert "lin_z_1" in variables["params"]
        assert "lin_z_2" not in variables["params"]

    def test_combine_layer_reduces_views(self):
        """With NS views, rows [i*NS:(i+1)*NS] fuse: output batch shrinks by
        NS and permuting views doesn't change the result (mean fusion)."""
        NS, B, d_latent, d_in = 3, 4, 8, 5
        model = ResnetFC(d_out=2, n_blocks=4, d_latent=d_latent, d_hidden=16,
                         combine_layer=2, combine_type="average")
        zx = jax.random.normal(jax.random.PRNGKey(1), (NS * B, d_latent + d_in))
        variables = model.init(jax.random.PRNGKey(0), zx,
                               combine_inner_dims=(NS, B))
        out = model.apply(variables, zx, combine_inner_dims=(NS, B))
        # combine_interleaved surfaces the implicit SB=1 leading dim
        # (reference reshape semantics, util.py:489-499)
        assert out.shape == (1, B, 2)
        # permute the views: same mean -> same output
        perm = np.asarray(zx).reshape(NS, B, -1)[[2, 0, 1]].reshape(NS * B, -1)
        out_p = model.apply(variables, jnp.asarray(perm),
                            combine_inner_dims=(NS, B))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_p),
                                   atol=1e-5)

    def test_yolo_d_out_from_conf(self):
        from pixelnerf_yolo_tpu.config.hocon import parse_string

        conf = parse_string(
            "d_out = 7\nnum_anchors_per_scale = 3\nyolo = True\n"
            "n_blocks = 5\nd_hidden = 64\ncombine_layer = 3"
        )
        m = ResnetFC.from_conf(conf, d_in=42, d_latent=512)
        assert m.d_out == 21
        assert m.combine_layer == 3

    def test_softplus_beta(self):
        model = ResnetFC(d_out=2, n_blocks=1, d_hidden=8, beta=100.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert np.isfinite(np.asarray(out)).all()


class TestImplicitNet:
    def test_forward_and_skip(self):
        model = ImplicitNet(d_out=4, dims=(16, 16, 16), skip_in=(2,),
                            d_latent=0, geometric_init=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (5, 4)
        assert np.isfinite(np.asarray(out)).all()
