"""Early-ray-termination serving lever (renderer.early_terminate).

Semantics under test (render/nerf.py _fine_gated):
  * f=1.0 (full capacity) is BITWISE identical to the ungated render —
    the compaction gather merely permutes rays and the scatter restores
    them (per-ray math is row-independent).
  * f<1: the top-C rays by coarse weight-sum get exactly the ungated
    fine output; the rest keep exactly their coarse rgb/depth.
  * the chunked-fused path applies the same gate per chunk.
  * training ignores the gate (train=True renders ungated).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_yolo_tpu.config.hocon import parse_string
from pixelnerf_yolo_tpu.models import make_model
from pixelnerf_yolo_tpu.render import make_renderer
from pixelnerf_yolo_tpu.utils.camera import gen_rays

_CONF = """
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


@pytest.fixture(scope="module")
def setup():
    conf = parse_string(_CONF)
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, 2, 3, 32, 32)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(2)])
    poses[:, 2, 3] = 1.3
    poses = jnp.asarray(poses[None])
    variables = model.init(jax.random.PRNGKey(0), images[0])
    cond = model.encode(variables, images, poses, jnp.float32(30.0))
    rays = gen_rays(
        poses[0], 16, 16, jnp.float32(30.0), 0.8, 1.8
    ).reshape(1, -1, 8)[:, :256]
    key = jax.random.PRNGKey(1)
    base = renderer(model, variables, cond, rays, key, want_weights=True)
    return conf, model, renderer, variables, cond, rays, key, base


def test_full_capacity_is_bitwise_ungated(setup):
    _, model, renderer, variables, cond, rays, key, base = setup
    gated = dataclasses.replace(renderer, early_terminate=1.0)
    out = gated(model, variables, cond, rays, key, want_weights=True)
    for branch in ("coarse", "fine"):
        for k in ("rgb", "depth", "weights"):
            np.testing.assert_array_equal(
                np.asarray(out[branch][k]), np.asarray(base[branch][k])
            )


def test_gate_splits_rays_exactly(setup):
    _, model, renderer, variables, cond, rays, key, base = setup
    gated = dataclasses.replace(renderer, early_terminate=0.5)
    out = gated(model, variables, cond, rays, key, want_weights=True)

    wsum = jnp.asarray(base["coarse"]["weights"]).sum(-1)
    Cc = gated._gated_capacity(rays.shape[1])
    assert Cc == 128
    _, idx = jax.lax.top_k(wsum, Cc)
    mask = np.zeros(rays.shape[1], bool)
    mask[np.asarray(idx)[0]] = True

    f_rgb = np.asarray(out["fine"]["rgb"])[0]
    f_depth = np.asarray(out["fine"]["depth"])[0]
    np.testing.assert_array_equal(
        f_rgb[~mask], np.asarray(base["coarse"]["rgb"])[0][~mask]
    )
    np.testing.assert_array_equal(
        f_depth[~mask], np.asarray(base["coarse"]["depth"])[0][~mask]
    )
    np.testing.assert_array_equal(
        f_rgb[mask], np.asarray(base["fine"]["rgb"])[0][mask]
    )
    np.testing.assert_array_equal(
        f_depth[mask], np.asarray(base["fine"]["depth"])[0][mask]
    )
    # skipped rays' fine weights = coarse weights zero-padded
    f_w = np.asarray(out["fine"]["weights"])[0]
    c_w = np.asarray(base["coarse"]["weights"])[0]
    np.testing.assert_array_equal(f_w[~mask][:, : c_w.shape[1]], c_w[~mask])
    np.testing.assert_array_equal(
        f_w[~mask][:, c_w.shape[1]:], np.zeros_like(f_w[~mask][:, c_w.shape[1]:])
    )


def _small_chunk(renderer, cb):
    """A copy of `renderer` whose chunk budget forces cb-ray chunks (the
    production floor is ~2M rows, reachable only at >87k rays here)."""
    cls = type(renderer)

    class _Tiny(cls):
        def _chunk_rays(self, n_rays_per_scene, n_views=1, latent_width=512,
                        grad_remat=False):
            return min(cb, n_rays_per_scene)

    return _Tiny(**{
        f.name: getattr(renderer, f.name)
        for f in dataclasses.fields(renderer)
    })


def test_gate_applies_in_chunked_fused_path(setup):
    """The gate runs per chunk in the fused lax.map body: each chunk's
    top-C rays get the fine pass, the rest keep coarse."""
    conf, model, renderer, variables, cond, rays, key, base = setup
    big = jnp.concatenate([rays] * 4, axis=1)  # (1, 1024, 8)
    cb = 256
    gated = _small_chunk(
        dataclasses.replace(renderer, early_terminate=0.25), cb
    )
    out = gated(model, variables, cond, big, key, want_weights=True)
    ung = _small_chunk(renderer, cb)(
        model, variables, cond, big, key, want_weights=True
    )
    wsum = np.asarray(ung["coarse"]["weights"]).sum(-1)[0]
    Cc = gated._gated_capacity(cb)
    n_kept = 0
    for start in range(0, big.shape[1], cb):
        w_chunk = wsum[start:start + cb]
        k = min(Cc, len(w_chunk))
        keep = np.argsort(-w_chunk, kind="stable")[:k]
        n_kept += k
        mask = np.zeros(len(w_chunk), bool)
        mask[keep] = True
        got = np.asarray(out["fine"]["rgb"])[0, start:start + cb]
        np.testing.assert_allclose(
            got[~mask],
            np.asarray(ung["coarse"]["rgb"])[0, start:start + cb][~mask],
            rtol=0, atol=0,
        )
    assert 0 < n_kept < big.shape[1]


def test_gate_per_scene_in_superbatch(setup):
    """SB>1 (the eval_approx batched path): the gate selects top-C rays
    PER SCENE.  Within one superbatch render (identical sample
    randomness), each scene's rays must split exactly: its own top-C by
    coarse weight-sum get the ungated fine output, the rest keep coarse.
    (A single-scene render is NOT the comparison point — the stratified
    jitter is drawn over the flattened batch, so per-ray randomness
    differs between batched and unbatched renders by design.)"""
    _, model, renderer, variables, cond, rays, key, base = setup
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(2, 2, 3, 32, 32)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(2)])
    poses[:, 2, 3] = 1.3
    poses = jnp.asarray(np.stack([poses, poses]))
    cond2 = model.encode(variables, images, poses, jnp.float32(30.0))
    rays2 = jnp.stack([rays[0], rays[0][::-1]])  # (2, B, 8)

    gated = dataclasses.replace(renderer, early_terminate=0.5)
    out = gated(model, variables, cond2, rays2, key, want_weights=True)
    ung = renderer(model, variables, cond2, rays2, key, want_weights=True)

    B = rays2.shape[1]
    Cc = gated._gated_capacity(B)
    wsum = jnp.asarray(ung["coarse"]["weights"]).sum(-1)  # (2, B)
    _, idx = jax.lax.top_k(wsum, Cc)
    for s in range(2):
        mask = np.zeros(B, bool)
        mask[np.asarray(idx)[s]] = True
        f_rgb = np.asarray(out["fine"]["rgb"])[s]
        np.testing.assert_array_equal(
            f_rgb[~mask], np.asarray(ung["coarse"]["rgb"])[s][~mask]
        )
        np.testing.assert_array_equal(
            f_rgb[mask], np.asarray(ung["fine"]["rgb"])[s][mask]
        )
        assert 0 < mask.sum() < B


def test_gate_ignored_in_training(setup):
    _, model, renderer, variables, cond, rays, key, base = setup
    gated = dataclasses.replace(renderer, early_terminate=0.25)
    out = gated(
        model, variables, cond, rays, key, want_weights=True, train=True
    )
    ung = renderer(
        model, variables, cond, rays, key, want_weights=True, train=True
    )
    for k in ("rgb", "depth"):
        np.testing.assert_array_equal(
            np.asarray(out["fine"][k]), np.asarray(ung["fine"][k])
        )


def test_from_conf_parses_early_terminate():
    conf = parse_string(_CONF.replace(
        "eval_batch_size = 64", "eval_batch_size = 64\nearly_terminate = 0.375"
    ))
    renderer = make_renderer(conf)
    assert renderer.early_terminate == 0.375
    assert renderer._gated_capacity(8192) == 3072
