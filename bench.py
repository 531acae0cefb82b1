"""Benchmark: coarse+fine render throughput (rays/sec/chip).

Runs the flagship NeRF configuration (ResNet34 encoder, 512-hidden 5-block
ResnetFC, 64 coarse + 32 fine + 16 depth samples — the reference's
operating point, /root/reference/conf/default.conf:55-58 +
default_mv.conf:7-21) on whatever accelerator jax exposes and reports
steady-state rays/second for the full coarse+fine render.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
vs_baseline is against the driver's 5M rays/sec/chip north star
(BASELINE.json.north_star).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RAYS_PER_SEC = 5_000_000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from __graft_entry__ import _flagship

    n_rays = int(os.environ.get("BENCH_RAYS", 16384))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # BENCH_CONFIG: nerf (headline, BASELINE config 2) | nerf_coarse
    # (config 1, coarse-only 64 samples) | nerf_mv (config 3, V=3
    # cross-view pooling) | yolo (config 4, detection backbone + head)
    bench_config = os.environ.get("BENCH_CONFIG", "nerf")
    if bench_config not in ("nerf", "nerf_coarse", "nerf_mv", "yolo"):
        raise SystemExit(
            f"unknown BENCH_CONFIG={bench_config!r}; "
            "expected nerf | nerf_coarse | nerf_mv | yolo"
        )

    yolo = bench_config == "yolo"
    conf = _flagship(compute_dtype=dtype, yolo=yolo)
    if bench_config == "nerf_coarse":
        conf.put("renderer.n_fine", 0)
        conf.put("renderer.n_fine_depth", 0)
        conf.put("model.mlp_fine.type", "empty")
    if os.environ.get("BENCH_FUSED"):
        conf.put("model.use_fused_mlp", os.environ["BENCH_FUSED"])
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)

    NS = 3 if bench_config in ("nerf_mv", "yolo") else 1
    H = W = 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, NS, 3, H, W)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(NS)])
    poses[:, 2, 3] = 1.3 if not yolo else 8.0
    poses = jnp.asarray(poses[None])
    focal = (
        jnp.asarray(np.array([120.0, 120.0], np.float32)[None])
        if yolo
        else jnp.asarray(np.float32(120.0))
    )
    c = (
        jnp.asarray(np.array([64.0, 64.0], np.float32)[None])
        if yolo
        else None
    )

    side = int(np.sqrt(n_rays))
    rays = gen_rays(poses[0], side, side, jnp.float32(120.0),
                    0.8, 1.8).reshape(1, -1, 8)
    n_rays = rays.shape[1]

    variables = model.init(jax.random.PRNGKey(0), images[0])
    cond = model.encode(variables, images, poses, focal, c=c)

    @jax.jit
    def render_chained(variables, cond, rays, key, carry):
        # device-side dependency on the previous output serializes the
        # iterations on-chip; one host transfer at the end forces the whole
        # chain (block_until_ready does not reliably block through the
        # axon remote relay, and a per-iter host sync costs ~65 ms)
        rays = rays + 0.0 * carry
        if yolo:
            out = renderer(model, variables, cond, rays.reshape(-1, 8), key)
            return out, out[0, 0, 0]
        out = renderer(model, variables, cond, rays, key, want_weights=False)
        return out, out["coarse"]["depth"][0, 0]

    key = jax.random.PRNGKey(1)
    carry = jnp.float32(0.0)

    def force(x):
        return float(x)

    # warmup / compile
    out, carry_w = render_chained(variables, cond, rays, key, carry)
    force(carry_w)

    t0 = time.perf_counter()
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        out, carry = render_chained(variables, cond, rays, key, carry)
    force(carry)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * iters / dt
    metric_name = {
        "nerf": "render_rays_per_sec_chip_coarse_fine",
        "nerf_coarse": "render_rays_per_sec_chip_coarse_only",
        "nerf_mv": "render_rays_per_sec_chip_coarse_fine_v3",
        "yolo": "yolo_render_rays_per_sec_chip",
    }[bench_config]
    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
