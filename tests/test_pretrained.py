"""Pretrained-encoder initialization wiring (reference encoder.py:60-66).

The reference trains from torchvision ImageNet weights; here
``encoder.pretrained = True`` must load the ported npz cache at
model.init() time, raise with porting instructions when it is absent, and
degrade to random init with a warning (raise under PNY_PRETRAINED_STRICT=1).
(Numerical parity of the porting map itself vs a torch forward is covered
by tests/test_nn.py::TestTorchPort.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.nn.pretrained import (
    load_pretrained_backbone,
    pretrained_path,
    save_backbone_npz,
)

STAGE_SIZES_18 = [2, 2, 2, 2]
STAGE_WIDTHS = [64, 128, 256, 512]


def synth_resnet18_state_dict(rng):
    """Full torchvision-named resnet18 feature-trunk state dict (numpy)."""
    sd = {}

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.random(c).astype(np.float32) + 0.5
        sd[prefix + ".bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[prefix + ".running_mean"] = (
            rng.normal(size=c).astype(np.float32) * 0.1
        )
        sd[prefix + ".running_var"] = rng.random(c).astype(np.float32) + 0.5

    sd["conv1.weight"] = (
        rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.05
    )
    bn("bn1", 64)
    c_in = 64
    for stage, (n_blocks, width) in enumerate(
        zip(STAGE_SIZES_18, STAGE_WIDTHS), start=1
    ):
        for b in range(n_blocks):
            pre = f"layer{stage}.{b}"
            first_in = c_in if b == 0 else width
            sd[pre + ".conv1.weight"] = (
                rng.normal(size=(width, first_in, 3, 3)).astype(np.float32)
                * 0.03
            )
            sd[pre + ".conv2.weight"] = (
                rng.normal(size=(width, width, 3, 3)).astype(np.float32)
                * 0.03
            )
            bn(pre + ".bn1", width)
            bn(pre + ".bn2", width)
            if b == 0 and first_in != width:
                sd[pre + ".downsample.0.weight"] = (
                    rng.normal(size=(width, first_in, 1, 1)).astype(
                        np.float32
                    )
                    * 0.05
                )
                bn(pre + ".downsample.1", width)
        c_in = width
    return sd


MODEL_CONF = """
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
                 n_blocks = 3
                 d_hidden = 32
                 combine_layer = 3
                 combine_type = average }
    mlp_fine { type = empty }
    encoder { backbone = resnet18
              pretrained = %s
              num_layers = 2
              index_padding = zeros }
}
renderer { type = nerf
           n_coarse = 8
           white_bkgd = True }
"""


@pytest.fixture()
def weights_dir(tmp_path, rng, monkeypatch):
    sd = synth_resnet18_state_dict(rng)
    path = tmp_path / "resnet18_imagenet.npz"
    save_backbone_npz(sd, str(path))
    monkeypatch.setenv("PNY_PRETRAINED_DIR", str(tmp_path))
    return sd, str(path)


class TestPretrainedWiring:
    def test_init_grafts_ported_weights(self, weights_dir):
        sd, path = weights_dir
        assert pretrained_path("resnet18") == path
        conf = parse_string(MODEL_CONF % "True")
        model = make_model(conf.get_config("model"))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
        )
        got = np.asarray(
            variables["params"]["encoder"]["model"]["conv1"]["kernel"]
        )
        want = sd["conv1.weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
        np.testing.assert_allclose(got, want, atol=0)
        got_bn = np.asarray(
            variables["batch_stats"]["encoder"]["model"]["BatchNorm_0"][
                "mean"
            ]
        )
        np.testing.assert_allclose(got_bn, sd["bn1.running_mean"], atol=0)
        # truncated encoder (num_layers=2) only holds the stem + layer1;
        # the extra full-trunk tensors in the npz must be ignored
        assert "layer3_0" not in variables["params"]["encoder"]["model"]

    def test_strict_env_raises_with_instructions(self, monkeypatch,
                                                 tmp_path):
        monkeypatch.setenv("PNY_PRETRAINED_DIR", str(tmp_path / "empty"))
        monkeypatch.setenv("PNY_PRETRAINED_STRICT", "1")
        monkeypatch.setenv("HOME", str(tmp_path))  # hide any user cache
        conf = parse_string(MODEL_CONF % "True")
        model = make_model(conf.get_config("model"))
        with pytest.raises(FileNotFoundError, match="port_torchvision"):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))

    def test_missing_weights_default_to_random_with_warning(
            self, monkeypatch, tmp_path):
        """Out-of-the-box behavior: conf/default.conf sets pretrained=True
        but no npz is shipped; training must still start (warn + random
        init), matching the reference's torchvision-download fallback
        expectations (ADVICE r2 #1)."""
        monkeypatch.setenv("PNY_PRETRAINED_DIR", str(tmp_path / "empty"))
        monkeypatch.delenv("PNY_PRETRAINED_STRICT", raising=False)
        monkeypatch.setenv("HOME", str(tmp_path))
        conf = parse_string(MODEL_CONF % "True")
        model = make_model(conf.get_config("model"))
        with pytest.warns(UserWarning, match="RANDOM encoder init"):
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
            )
        assert "conv1" in variables["params"]["encoder"]["model"]

    def test_pretrained_false_never_touches_cache(self, monkeypatch,
                                                  tmp_path):
        monkeypatch.setenv("PNY_PRETRAINED_DIR", str(tmp_path / "empty"))
        conf = parse_string(MODEL_CONF % "False")
        model = make_model(conf.get_config("model"))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
        )
        assert "conv1" in variables["params"]["encoder"]["model"]

    def test_roundtrip_through_loader(self, weights_dir):
        """save_backbone_npz -> load_pretrained_backbone equals a direct
        port_torch_state_dict of the same dict."""
        from pixelnerf_yolo_tpu.nn.resnet import port_torch_state_dict

        sd, _ = weights_dir
        loaded, _ = load_pretrained_backbone("resnet18")
        direct = port_torch_state_dict(sd, backbone="resnet18")
        for a, b in zip(
            jax.tree.leaves(loaded), jax.tree.leaves(direct)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("backbone", ["resnet34"])
    def test_torchvision_parity(self, backbone):
        """Ported encode ≡ torchvision CPU (runs only where torchvision +
        its ImageNet cache exist; the porting map itself is torch-oracle
        verified in test_nn.py)."""
        torchvision = pytest.importorskip("torchvision")
        import torch

        from pixelnerf_yolo_tpu.nn.resnet import (
            ResNetFeatures,
            port_torch_state_dict,
        )

        try:
            tm = getattr(torchvision.models, backbone)(
                weights="IMAGENET1K_V1"
            )
        except Exception as e:  # no egress / stub torchvision module
            pytest.skip(f"torchvision weights unavailable: {e}")
        tm.eval()
        variables = port_torch_state_dict(
            tm.state_dict(), backbone=backbone
        )
        model = ResNetFeatures(backbone=backbone, num_layers=2)
        x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(
            np.float32
        )
        feats = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            v = tm.relu(tm.bn1(tm.conv1(tx)))
            stem = v.numpy().transpose(0, 2, 3, 1)
            v = tm.layer1(tm.maxpool(v))
            l1 = v.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(feats[0]), stem, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feats[1]), l1, atol=1e-5)
