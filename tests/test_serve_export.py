"""AOT serving-export tests (pixelnerf_yolo_tpu/serve.py).

The artifact must (a) roundtrip: deserialize + call reproduces the live
jitted render exactly on the export platform; (b) cross-lower: a
cpu-backend process can emit a tpu artifact (the deployment story);
(c) survive the CLI path end-to-end.  Hermetic — tiny model, no chip.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_yolo_tpu import serve
from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.utils.camera import gen_rays

_SMALL_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 4
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 3
                 d_hidden = 32
                 combine_layer = 2
                 combine_type = average }
    mlp_fine { type = resnet
               n_blocks = 3
               d_hidden = 32
               combine_layer = 2
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
           white_bkgd = True
           eval_batch_size = 64 }
"""


def _example(conf, n_rays=32, ns=2, hw=32):
    fn, model = serve.build_render_fn(conf)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, ns, 3, hw, hw)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(ns)])
    poses[:, 2, 3] = 1.3
    poses = jnp.asarray(poses[None])
    focal = jnp.asarray(np.float32(30.0))
    rays = gen_rays(poses[0], 8, 8, focal, 0.8, 1.8).reshape(1, -1, 8)[
        :, :n_rays
    ]
    variables = model.init(jax.random.PRNGKey(0), images[0])
    key = jax.random.PRNGKey(1)
    return fn, variables, (images, poses, focal, rays, key)


_SMALL_YOLO_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 4
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 3
                 d_hidden = 32
                 combine_layer = 2
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
           eval_batch_size = 64 }
"""


def test_roundtrip_matches_live_render():
    conf = parse_string(_SMALL_CONF)
    fn, variables, ex = _example(conf)
    blob = serve.export_render(conf, variables, ex, platforms=("cpu",))

    call, header = serve.load_render(blob)
    assert header["platforms"] == ["cpu"]
    got = call(variables, *ex)
    want = jax.jit(fn)(variables, *ex)

    flat_g = jax.tree_util.tree_leaves(got)
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_g) == len(flat_w)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=0, atol=0
        )


def test_yolo_conf_export_roundtrips():
    """The flagship serving mode (renderer.type=yolo) must export —
    YoloRenderer takes no want_weights kwarg, so build_render_fn must
    branch (ADVICE r4 high: TypeError at trace time before the fix)."""
    conf = parse_string(_SMALL_YOLO_CONF)
    fn, variables, ex = _example(conf)
    blob = serve.export_render(conf, variables, ex, platforms=("cpu",))
    call, header = serve.load_render(blob)
    got = call(variables, *ex)
    want = jax.jit(fn)(variables, *ex)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=0
    )


def test_baked_weights_roundtrip():
    """Format-2 artifacts carry the weights: calling with variables=None
    must reproduce the live render, and load_weights_from_artifact must
    return the same pytree that was exported."""
    conf = parse_string(_SMALL_CONF)
    fn, variables, ex = _example(conf)
    blob = serve.export_render(conf, variables, ex, platforms=("cpu",))

    baked = serve.load_weights_from_artifact(blob)
    flat_b = jax.tree_util.tree_leaves(baked)
    flat_v = jax.tree_util.tree_leaves(variables)
    assert len(flat_b) == len(flat_v)
    for b, v in zip(flat_b, flat_v):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(v))

    call, header = serve.load_render(blob)
    assert header["weights_len"] > 0
    got = call(None, *ex)  # baked weights
    want = jax.jit(fn)(variables, *ex)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=0, atol=0
        )


def test_artifact_validates_magic():
    with pytest.raises(ValueError):
        serve.load_render(b"not an artifact")


def test_cross_lowering_emits_tpu_artifact_on_cpu():
    """Export FOR tpu from the cpu backend: must serialize (no execution)
    and record the platform + argument layout in the header."""
    conf = parse_string(_SMALL_CONF)
    _, variables, ex = _example(conf)
    blob = serve.export_render(conf, variables, ex, platforms=("tpu",))
    call, header = serve.load_render(blob)
    assert header["platforms"] == ["tpu"]
    leaves = header["arg_layout"]["leaves"]
    n_arg_leaves = len(jax.tree_util.tree_leaves((variables,) + ex))
    assert len(leaves) == n_arg_leaves
    # rays leaf layout recorded: find its (1, 32, 8) f32 entry
    assert [[1, 32, 8], "float32"] in [
        [list(s), d] for s, d in leaves
    ]


def test_cli_exports_artifact(tmp_path):
    conf_path = tmp_path / "small.conf"
    conf_path.write_text(_SMALL_CONF)
    out = tmp_path / "model.pnyx"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pixelnerf_yolo_tpu.serve",
         "--conf", str(conf_path), "--platform", "cpu",
         "--rays", "16", "--views", "1", "--size", "32",
         "--init-weights", "--out", str(out)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    blob = out.read_bytes()
    call, header = serve.load_render(blob)
    assert header["platforms"] == ["cpu"]
