"""Benchmark: render throughput (rays/sec/chip) + MFU.

Default (headline): the flagship NeRF configuration (ResNet34 encoder,
512-hidden 5-block ResnetFC, 64 coarse + 32 fine + 16 depth samples — the
reference's operating point, /root/reference/conf/default.conf:55-58 +
default_mv.conf:7-21) on whatever accelerator jax exposes.

With BENCH_CONFIG unset (the driver's invocation) the outer process runs
the REQUIRED nerf headline FIRST (so nothing can wedge the TPU relay
before it lands), then the yolo / train_nerf / train_yolo benches — each
a bounded, probed subprocess whose JSON line is forwarded — RE-PRINTING
the nerf record after each optional one, so a last-line parser always
reads the nerf record:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N,
   "mfu_reference_alg": N, "mfu_executed": N, ...}
vs_baseline is against the driver's 5M rays/sec/chip north star
(BASELINE.json.north_star).  Two utilization fields, both over the chip's
peak (PEAK_FLOPS env, default 197e12 bf16 on v5e):
  mfu_reference_alg  analytic field-MLP FLOPs OF THE REFERENCE ALGORITHM
                     per ray x rays/s — a same-work comparison metric; it
                     can exceed 1.0 when this build executes fewer FLOPs
                     per ray than the reference (e.g. YOLO latent-table
                     pre-projection removes ~55% of per-point work).
  mfu_executed       FLOPs the compiled program ACTUALLY executes (XLA
                     cost analysis of the optimized HLO) x rate — real
                     hardware utilization, never >1.

Robustness (the axon TPU relay can die and leave clients hung forever):
every device-config runs in a subprocess with a timeout; the device is
probed by a throwaway subprocess first; the required config gets one
retry with a re-probe; a final failure emits an error JSON with the
config's own unit.  BENCH_TOTAL_BUDGET_S (default 1100 — the r4 driver
killed a 3000-budget run at ~20 min, rc=124) bounds the whole
invocation; optional configs are skipped when the remaining budget must
be reserved for the required one.

BENCH_CONFIG selects a single operating point:
  nerf         headline coarse+fine (BASELINE config 2)
  nerf_coarse  coarse-only 64 samples (config 1)
  nerf_mv      V=3 cross-view pooling (config 3)
  nerf_int8    serving mode: int8-quantized latent table (documented
               approximation, ops/grid_sample.grid_sample_nhwc_q8)
  nerf_w8a8    serving mode: dynamic W8A8 int8 field-MLP matmuls
               (model.mlp_int8, nn/quant.py).  Chip-measured SLOWER than
               bf16 on this stack (57.3k vs 103.0k rays/s, r4) — XLA does
               not deliver the int8 MXU rate here; kept for measurement
               (see PERF.md "rejected levers")
  nerf_serve8  both int8 serving modes combined (latent table + MLP)
  nerf_et      serving mode: early ray termination — fine pass on the
               top-⌈chunk·f⌉ rays by coarse weight-sum only (documented
               approximation, renderer.early_terminate; f from BENCH_ET,
               default 0.375)
  yolo         detection mode at conf/exp/yolo.conf's operating point:
               backbone=custom (1792-d ELAN), 128 coarse samples, V=3
  yolo_w8a8    yolo + the W8A8 field MLP
  dtu_video    BASELINE config 5: gen_video trajectory render at the DTU
               full resolution (400x300), V=3, IDR fly-through poses
               (utils/camera.dtu_trajectory), dtu.conf render policy;
               reports frames_per_sec alongside rays/s
               (BENCH_FRAMES, default 5 requested -> 6 spline frames)
  train_nerf / train_yolo  full sharded jitted train step (steps/s)
  serve_artifact  execute the exported AOT artifact (pixelnerf_yolo_tpu
               .serve) ON the device with its baked weights: value
               parity vs the live jit + sealed-computation throughput
  scaling      virtual-mesh weak scaling on CPU (1/2/4/8 devices, fixed
               rays per device).  A single host serializes the devices, so
               this measures SHARDING OVERHEAD (partition + collectives),
               not real multi-chip speedup: efficiency ~1.0 means the
               sharded program adds no work beyond the compute itself.
  train_scaling  same, for the trainers' sharded updates
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_RAYS_PER_SEC = 5_000_000.0
PEAK_FLOPS = float(os.environ.get("PEAK_FLOPS", 197e12))  # v5e bf16


def field_flops_per_ray(conf, n_views: int) -> float:
    """Analytic field-MLP FLOPs per ray (MACs x 2) for the config: per
    sample, NS pre-combine passes (lin_in + latent injection + cl blocks)
    plus one post-combine pass (remaining blocks + lin_out), per pass
    (SURVEY.md §2.4 ResnetFC structure)."""
    from pixelnerf_yolo_tpu.models import make_model

    model = make_model(conf.get_config("model"))
    d_in, d_latent = model.d_in, model.d_latent

    def mlp_flops(mlp, d_out):
        H = mlp.d_hidden
        cl = min(mlp.combine_layer, mlp.n_blocks)
        pre = 2 * (d_in * H + cl * (d_latent * H + 2 * H * H))
        post = 2 * ((mlp.n_blocks - cl) * 2 * H * H + H * d_out)
        return pre, post

    n_coarse = conf.get_int("renderer.n_coarse")
    n_fine = conf.get_int("renderer.n_fine", 0)
    pre_c, post_c = mlp_flops(model.mlp_coarse, model.d_out)
    total = n_coarse * (n_views * pre_c + post_c)
    if model.mlp_fine is not None and n_fine > 0:
        # the fine z-union is coarse + n_fine samples; n_fine INCLUDES the
        # depth samples (render/nerf.py:253-275 == reference nerf.py:288-301
        # draws n_fine - n_fine_depth importance + n_fine_depth depth).
        # r2's bench double-counted depth (k=112 instead of 96), inflating
        # flops_per_ray and MFU by ~10% — fixed per the r3 profiler trace
        # (fine-pass fusions are 96 rows/ray).
        k_fine = n_coarse + n_fine
        pre_f, post_f = mlp_flops(model.mlp_fine, model.d_out)
        total += k_fine * (n_views * pre_f + post_f)
    return float(total)


RENDER_METRIC_NAMES = {
    "nerf": "render_rays_per_sec_chip_coarse_fine",
    "nerf_coarse": "render_rays_per_sec_chip_coarse_only",
    "nerf_mv": "render_rays_per_sec_chip_coarse_fine_v3",
    "nerf_int8": "render_rays_per_sec_chip_coarse_fine_int8",
    "nerf_w8a8": "render_rays_per_sec_chip_coarse_fine_w8a8",
    "nerf_serve8": "render_rays_per_sec_chip_coarse_fine_serve_int8",
    "nerf_et": "render_rays_per_sec_chip_coarse_fine_early_term",
    "yolo": "yolo_render_rays_per_sec_chip",
    "yolo_w8a8": "yolo_render_rays_per_sec_chip_w8a8",
    "dtu_video": "dtu_video_render_rays_per_sec_chip_full_res",
}


def metric_name_for(bench_config: str) -> str:
    return RENDER_METRIC_NAMES.get(
        bench_config, f"{bench_config}_steps_per_sec_chip"
    )


UNIT_TRAIN = "train steps/s (full fused sharded update)"


def unit_for(bench_config: str) -> str:
    """The unit a SUCCESS record for this config would carry — error
    records must match it (a consumer keying on `unit` would otherwise
    see an inconsistent record for failed train benches)."""
    if bench_config == "train_scaling":
        return ("total work rate 8dev(8W)/2dev(2W) on one host "
                "(1.0 = no sharding overhead)")
    if bench_config == "scaling":
        return ("t(2dev,2R)/t(8dev,8R) on one host "
                "(1.0 = no sharding overhead)")
    return UNIT_TRAIN if bench_config.startswith("train") else "rays/s"


def compiled_cost_analysis(jit_fn, *args):
    """XLA cost analysis of the optimized executable for jit_fn(*args):
    the FLOPs/bytes the program ACTUALLY executes (post-fusion, post-DCE
    — e.g. after latent pre-projection removed reference per-point work).
    args may be concrete arrays or ShapeDtypeStructs.  Returns the dict,
    or None when the backend doesn't expose an analysis."""
    try:
        ca = jit_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca or "flops" not in ca:
            return None
        return ca
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"# cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None


def maybe_trace():
    """BENCH_TRACE=<dir>: capture a jax.profiler trace of the timed loop
    for scripts/profile_trace.py (the PERF.md stage tables); nullcontext
    otherwise."""
    import contextlib

    import jax

    trace_dir = os.environ.get("BENCH_TRACE")
    return (
        jax.profiler.trace(trace_dir) if trace_dir
        else contextlib.nullcontext()
    )


def device_state_probe():
    """Measured MXU matmul rate + HBM stream bandwidth of THIS session.

    The tunneled chip's delivered rate varies across sessions (measured
    2026-08-19: the identical render program — optimized-HLO-verified
    unchanged — ran at 102.6k rays/s in one session and 82.7k four hours
    later, both with an idle host).  Every bench record therefore
    carries the session's own measured ceilings, so a consumer can
    separate program quality from silicon/relay state:
    ``mfu_vs_measured_peak`` divides by the probed matmul rate instead
    of the nominal 197 TFLOP/s.  ~0.3 s of device time; skipped on the
    CPU backend and under BENCH_NO_PROBE=1.
    """
    if os.environ.get("BENCH_NO_PROBE"):
        return {}
    try:
        import jax
        import jax.numpy as jnp
        from jax import lax

        if jax.default_backend() == "cpu":
            return {}

        n = 8192
        a = jnp.zeros((n, n), jnp.bfloat16)
        b = jnp.zeros((n, n), jnp.bfloat16)

        @jax.jit
        def mm_chain(x, y):
            # 8 dependent matmuls — serialized on the MXU, one dispatch
            for _ in range(8):
                x = lax.dot(
                    x, y, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            return x

        x = mm_chain(a, b)
        float(x[0, 0])  # compile + warm (block through the relay)
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            x = mm_chain(x, b)
        float(x[0, 0])
        dt = time.perf_counter() - t0
        tflops = 8 * iters * 2 * n**3 / dt / 1e12

        m = jnp.zeros((1 << 27,), jnp.bfloat16)  # 256 MB

        @jax.jit
        def stream_chain(v):
            # optimization_barrier defeats elementwise fusion, so each
            # add is a real read+write HBM pass
            for _ in range(8):
                v = lax.optimization_barrier(v + jnp.bfloat16(1.0))
            return v

        m = stream_chain(m)
        float(m[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            m = stream_chain(m)
        float(m[0])
        dt = time.perf_counter() - t0
        gbps = 8 * iters * 2 * m.nbytes / dt / 1e9

        return {
            "probe_matmul_tflops": round(tflops, 1),
            "probe_hbm_gbps": round(gbps, 1),
        }
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"# device-state probe failed: {e!r}", file=sys.stderr)
        return {}


def emit(metric, rays_per_sec, flops_per_ray, flops_per_ray_executed=None,
         extra=None):
    record = {
        "metric": metric,
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
        # reference-algorithm FLOPs/ray x rate / peak: same-work-per-ray
        # comparison vs the reference; >1 means fewer executed FLOPs/ray
        "mfu_reference_alg": round(
            rays_per_sec * flops_per_ray / PEAK_FLOPS, 4
        ),
        "flops_per_ray_reference_alg": round(flops_per_ray),
    }
    if flops_per_ray_executed:
        # actual hardware utilization on the compiled program (XLA cost
        # analysis of the optimized HLO)
        record["mfu_executed"] = round(
            rays_per_sec * flops_per_ray_executed / PEAK_FLOPS, 4
        )
        record["flops_per_ray_executed"] = round(flops_per_ray_executed)
    if extra:
        record.update(extra)
    if flops_per_ray_executed and record.get("probe_matmul_tflops"):
        # utilization against the SESSION's measured matmul ceiling —
        # removes cross-session silicon/relay-state variance from the
        # MFU comparison (see device_state_probe)
        record["mfu_vs_measured_peak"] = round(
            rays_per_sec * flops_per_ray_executed
            / (record["probe_matmul_tflops"] * 1e12), 4
        )
    if os.environ.get("BENCH_TRACE"):
        # profiler instrumentation sits inside the timed loop — these
        # numbers are for stage attribution, not the headline
        record["traced"] = True
    print(json.dumps(record), flush=True)


def run_render_bench(bench_config: str):
    import jax
    import jax.numpy as jnp

    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from __graft_entry__ import _flagship

    # 65536 rays is the measured-best chip operating point (the row-budget
    # chunking kicks in via lax.map; 85.8k vs 83.4k rays/s at 16384)
    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    # dtu_video's workload is 6 full-res frames (720k rays) per iter —
    # 3 iters keeps its timed device work near the other configs' so the
    # whole sweep fits the driver budget (BENCH_ITERS overrides)
    iters = int(os.environ.get(
        "BENCH_ITERS", 3 if bench_config == "dtu_video" else 6
    ))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    yolo = bench_config.startswith("yolo")
    # BASELINE config 5: DTU gen_video trajectory render at the DTU
    # full resolution (400x300), V=3 source conditioning, IDR fly-through
    # poses (utils/camera.dtu_trajectory), dtu.conf render policy
    dtu = bench_config == "dtu_video"
    # YOLO's canonical operating point uses the custom 1792-d ELAN
    # backbone (conf/exp/yolo.conf:28)
    conf = _flagship(
        compute_dtype=dtype,
        yolo=yolo,
        backbone="custom" if yolo else "resnet34",
    )
    if dtu:
        conf.put("renderer.white_bkgd", False)  # conf/exp/dtu.conf
    if bench_config == "nerf_coarse":
        conf.put("renderer.n_fine", 0)
        conf.put("renderer.n_fine_depth", 0)
        conf.put("model.mlp_fine.type", "empty")
    if bench_config in ("nerf_int8", "nerf_serve8") or os.environ.get(
        "BENCH_INT8"
    ):
        conf.put("model.latent_int8", True)
    et = float(os.environ.get(
        "BENCH_ET", 0.375 if bench_config == "nerf_et" else 0.0
    ))
    if et > 0.0:
        # early ray termination (documented approximation): fine pass on
        # the top-⌈chunk·f⌉ rays by coarse weight-sum only
        conf.put("renderer.early_terminate", et)
    if bench_config in (
        "nerf_w8a8", "nerf_serve8", "yolo_w8a8"
    ) or os.environ.get("BENCH_W8A8"):
        # dynamic W8A8 field-MLP matmuls (serving mode, nn/quant.py)
        conf.put("model.mlp_int8", True)
    if os.environ.get("BENCH_FUSED"):
        conf.put("model.use_fused_mlp", os.environ["BENCH_FUSED"])
    if os.environ.get("BENCH_EBS"):
        # chunk-size experiment knob: eval_batch_size floors the row budget
        conf.put("renderer.eval_batch_size", int(os.environ["BENCH_EBS"]))
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)

    NS = 3 if bench_config in ("nerf_mv", "yolo", "yolo_w8a8", "dtu_video") \
        else 1
    H, W = (300, 400) if dtu else (128, 128)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, NS, 3, H, W)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(NS)])
    poses[:, 2, 3] = 8.0 if yolo else (2.0 if dtu else 1.3)
    poses = jnp.asarray(poses[None])
    focal = (
        jnp.asarray(np.array([437.0, 437.0], np.float32)[None])
        if dtu
        else jnp.asarray(np.array([120.0, 120.0], np.float32)[None])
        if yolo
        else jnp.asarray(np.float32(120.0))
    )
    c = (
        jnp.asarray(np.array([W / 2.0, H / 2.0], np.float32)[None])
        if (yolo or dtu)
        else None
    )

    if dtu:
        # full-resolution frames along the IDR DTU fly-through; DTU
        # z-bounds 1.2-4.0, lindisp False (data/dvr.py)
        from pixelnerf_yolo_tpu.utils.camera import dtu_trajectory

        n_frames_req = int(os.environ.get("BENCH_FRAMES", 5))
        traj = jnp.asarray(dtu_trajectory(n_frames_req))
        n_frames = traj.shape[0]
        rays = gen_rays(
            traj, W, H, jnp.asarray(np.array([437.0, 437.0], np.float32)),
            1.2, 4.0, c=c[0],
        ).reshape(1, -1, 8)
    else:
        n_frames = None
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

    out, carry_w = render_chained(variables, cond, rays, key, carry)
    float(carry_w)  # warmup / compile

    # executed FLOPs per ray from the optimized HLO.  XLA cost analysis
    # counts a while/map body ONCE, so a ray-chunked program underreports
    # by the chunk count (measured: lax.map over 8 chunks -> 1/8 the
    # flops).  Scale the MAIN executable's reported flops by the chunk
    # count instead of compiling a single-chunk probe shape: the probe
    # compile sat on the critical path and took ~18 min through a
    # degraded relay in the r4 driver run (BENCH_r04 rc=124 post-mortem
    # — cache entries 11:14 vs 11:33).  The scaling overcounts only the
    # fixed work OUTSIDE the map body, which here is ray reshapes
    # (encode() runs outside render_chained entirely) — measured
    # agreement with the old probe method: 1101653120 flops/ray both
    # ways at the headline shape.  Cost analysis of the already-compiled
    # main shape is a cache hit, so this adds NO compile.
    import math

    lat_w = (
        cond.latent_flat.shape[-1]
        if getattr(cond, "latent_flat", None) is not None else 512
    )
    chunk = renderer.chunk_rays_for(n_rays, NS, latent_width=lat_w)
    n_chunks = max(1, math.ceil(n_rays / max(chunk, 1)))
    ca = compiled_cost_analysis(render_chained, variables, cond, rays,
                                key, carry)
    flops_exec = (
        float(ca["flops"]) * n_chunks / n_rays if ca else None
    )

    with maybe_trace():
        t0 = time.perf_counter()
        for i in range(iters):
            key = jax.random.fold_in(key, i)
            out, carry = render_chained(variables, cond, rays, key, carry)
        float(carry)
        dt = time.perf_counter() - t0

    rays_per_sec = n_rays * iters / dt
    extra = device_state_probe()
    if dtu:
        extra.update({
            "frames_per_sec": round(rays_per_sec / (H * W), 3),
            "resolution": f"{W}x{H}",
            "n_frames": int(n_frames),
            "trajectory": "idr_dtu_flythrough",
        })
    emit(RENDER_METRIC_NAMES[bench_config], rays_per_sec,
         field_flops_per_ray(conf, NS), flops_per_ray_executed=flops_exec,
         extra=extra)


def run_serve_artifact_bench():
    """Execute the exported AOT serving artifact ON the device
    (VERDICT r4 #3: the deployment artifact must be proven, not just
    serialized).  Exports the flagship render step for the current
    backend, loads it back with `serve.load_render`, runs it with the
    BAKED weights against the live jit on identical inputs (value
    parity), and times the sealed computation with the same carry-chain
    used by the render benches.  Emits rays/s of the artifact call plus
    `parity_max_abs_delta` and `live_rays_per_sec`."""
    import jax
    import jax.numpy as jnp

    from pixelnerf_yolo_tpu import serve
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from __graft_entry__ import _flagship

    n_rays = int(os.environ.get("BENCH_RAYS", 65536))
    iters = int(os.environ.get("BENCH_ITERS", 6))
    conf = _flagship(
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16")
    )
    platform = jax.default_backend()
    fn, model = serve.build_render_fn(conf)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, 1, 3, 128, 128)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32)])
    poses[:, 2, 3] = 1.3
    poses = jnp.asarray(poses[None])
    focal = jnp.asarray(np.float32(120.0))
    side = int(np.sqrt(n_rays))
    rays = gen_rays(poses[0], side, side, jnp.float32(120.0),
                    0.8, 1.8).reshape(1, -1, 8)
    n_rays = rays.shape[1]
    key = jax.random.PRNGKey(1)
    variables = model.init(jax.random.PRNGKey(0), images[0])

    blob = serve.export_render(
        conf, variables, (images, poses, focal, rays, key),
        platforms=(platform,),
    )
    call, header = serve.load_render(blob)
    baked = serve.load_weights_from_artifact(blob)
    baked = jax.tree_util.tree_map(jnp.asarray, baked)  # one host->dev copy

    # value parity: sealed artifact vs the live jit, identical inputs
    out_art = call(baked, images, poses, focal, rays, key)
    out_live = jax.jit(fn)(variables, images, poses, focal, rays, key)
    deltas = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(out_art),
                        jax.tree_util.tree_leaves(out_live))
    ]
    parity = max(deltas)

    from jax import export as jexport

    exp = jexport.deserialize(serve._split_artifact(blob)[2])

    # TIMING METHOD: per-call host sync on BOTH legs.  The sealed
    # computation must be called eagerly with concrete inputs — two
    # measured de-optimizations on this stack (r5): (a) wrapping
    # exp.call in an outer jax.jit embeds the exported module un-inlined
    # and runs 10x slower (10.1k vs 102k rays/s); (b) async-chaining
    # exp.call on its own un-materialized outputs collapses ~18x (5.5k
    # rays/s) — the call_exported dispatch path serializes on lazy
    # inputs.  Per-call float() sync with pre-materialized inputs runs
    # at the native rate (95.9k) and is the honest serving pattern
    # (each request arrives materialized); the live jit is timed the
    # SAME way so the comparison is apples-to-apples.
    def art_step(v, r, k):
        return exp.call(v, images, poses, focal, r, k)

    live_jit = jax.jit(fn)

    def live_step(v, r, k):
        return live_jit(v, images, poses, focal, r, k)

    keys = [jax.random.fold_in(key, i) for i in range(iters)]
    jax.block_until_ready(keys)
    rates = {}
    for name, f_, v in (("artifact", art_step, baked),
                        ("live", live_step, variables)):
        out = f_(v, rays, key)
        float(out["fine"]["depth"][0, 0])  # compile + warm
        t0 = time.perf_counter()
        for i in range(iters):
            out = f_(v, rays, keys[i])
            float(out["fine"]["depth"][0, 0])  # per-call sync
        rates[name] = n_rays * iters / (time.perf_counter() - t0)

    extra = device_state_probe()
    extra.update({
        "parity_max_abs_delta": parity,
        "live_rays_per_sec": round(rates["live"], 1),
        "artifact_bytes": len(blob),
        "platform": platform,
    })
    emit("serve_artifact_rays_per_sec_chip", rates["artifact"],
         field_flops_per_ray(conf, 1), extra=extra)


def run_train_bench(bench_config: str):
    """Full training-step throughput (steps/s) through the SHIPPED
    trainers' sharded jitted updates on a synthetic on-disk dataset:
    encoder fwd (BatchNorm train) + render + loss + backward + Adam."""
    import argparse
    import tempfile
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from synth_data import make_srn_dataset, make_yolo_dataset
    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel, make_train_mesh
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer
    from __graft_entry__ import _flagship, _DRYRUN_YOLO_CONF

    yolo = bench_config == "train_yolo"
    iters = int(os.environ.get("BENCH_ITERS", 20))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # default to the chip-measured TPU-sized throughput operating points
    # (PERF.md round-4 ray-batch sweeps: NeRF 8192 plain = 22.1k rays/s,
    # YOLO 1024 plain = 14.7k rays/s, both exec-MFU 0.39), NOT the
    # reference's GPU-era 128-ray point — BENCH_TRAIN_RAYS overrides
    train_rays = int(os.environ.get("BENCH_TRAIN_RAYS",
                                    1024 if yolo else 8192))

    with tempfile.TemporaryDirectory() as tmp:
        if yolo:
            # flagship YOLO trainer conf: custom 1792-d backbone, 128
            # coarse samples (conf/exp/yolo.conf operating point) over the
            # dryrun's train/yolo schema
            conf = parse_string(_DRYRUN_YOLO_CONF)
            conf.put("model.compute_dtype", dtype)
            conf.put("model.mlp_coarse.d_hidden", 512)
            conf.put("model.mlp_coarse.n_blocks", 5)
            conf.put("model.encoder.backbone", "custom")
            conf.put("model.encoder.num_layers", 4)
            conf.put("renderer.n_coarse", 128)
            conf.put("yolo.ray_batch_size", train_rays)
            root = make_yolo_dataset(
                os.path.join(tmp, "data"), n_scenes=2, n_views=4,
                img_size=256,
            )
            dset, val_dset, _ = get_split_dataset("yolo", root, conf=conf)
            nviews = [3]
        else:
            flag = _flagship(compute_dtype=dtype)
            conf = parse_string(_DRYRUN_YOLO_CONF)  # reuse train{} schema
            for k in ("model", "renderer"):
                conf.put(k, flag.get_config(k))
            conf.put("loss.rgb.use_l1", False)
            conf.put("loss.rgb_fine.use_l1", False)
            conf.put("loss.lambda_coarse", 1.0)
            conf.put("loss.lambda_fine", 1.0)
            root = os.path.join(tmp, "data", "cars")
            for stage in ("train", "val", "test"):
                make_srn_dataset(root, stage=stage, n_objs=2, n_views=6,
                                 img_size=128)
            dset, val_dset, _ = get_split_dataset("srn", root)
            nviews = [1]

        if os.environ.get("BENCH_FUSED"):
            conf.put("model.use_fused_mlp", os.environ["BENCH_FUSED"])
        remat_on = os.environ.get("BENCH_REMAT", "").lower() in (
            "1", "true", "yes", "on"
        )
        if remat_on:
            # field rematerialization (model.remat): measure the FLOP cost
            # of the memory lever — pair with BENCH_TRAIN_RAYS to find the
            # largest trainable ray batch with/without it
            conf.put("model.remat", True)
        remat_policy = os.environ.get("BENCH_REMAT_POLICY", "")
        if remat_policy:
            # selective remat: what the checkpointed field saves
            # (""/full | block | dots — models/pixelnerf.py)
            conf.put("model.remat_policy", remat_policy)
        remat_gather = os.environ.get("BENCH_REMAT_GATHER", "").lower() in (
            "1", "true", "yes", "on"
        )
        if remat_gather:
            # re-gather latents inside the checkpoint: the saved residual
            # is xyz, not the gathered latents (models/pixelnerf.py)
            conf.put("model.remat_gather", True)

        args = argparse.Namespace(
            name="bench_train", resume=False, gpu_id=[0],
            logs_path=os.path.join(tmp, "logs"),
            checkpoints_path=os.path.join(tmp, "ckpt"),
            visual_path=os.path.join(tmp, "vis"),
            epochs=1, lr=1e-4, gamma=1.0, ray_batch_size=train_rays,
            batch_size=1,
            nviews=str(nviews[0]), freeze_enc=None, no_bbox_step=100000,
            fixed_test=None, seed=0,
        )
        for p in (args.logs_path, args.visual_path,
                  os.path.join(args.checkpoints_path, args.name)):
            os.makedirs(p, exist_ok=True)
        model = make_model(conf.get_config("model"))
        renderer = make_renderer(conf)
        mesh = make_train_mesh(n_devices=1, batch_size=1)
        render_par = bind_parallel(renderer, model, gpus=None, mesh=mesh)
        trainer = make_trainer(
            args, conf, dset, val_dset, model, renderer, render_par, nviews
        )
        batch = next(iter(DataLoader(dset, batch_size=1, shuffle=False)))
        # two warmup steps: the first compiles for host-resident inputs,
        # the second recompiles for the steady-state (donated, committed)
        # buffer layouts — both must stay out of the timed loop
        for w in range(2):
            losses = trainer.train_step(batch, w)
            float(losses["t"])

        # executed FLOPs of the full update (encoder fwd + render fwd+bwd
        # + Adam) from the optimized HLO; cache hit vs the warmup compile
        ca = trainer.update_cost_analysis()
        # the actual ray count of the jitted step (incl. mesh padding):
        # args = (vars, opt, src_images, src_poses, focal, c, rays, ...)
        rays_step = train_rays
        flops_step = float(ca["flops"]) if ca is not None else None
        if getattr(trainer, "_update_aval_call", None) is not None:
            fn, sds = trainer._update_aval_call
            rays_aval = sds[6]
            rays_step = int(np.prod(rays_aval.shape[:-1]))
            # XLA cost analysis counts a map/while body once, so a
            # ray-chunked render underreports executed FLOPs by the chunk
            # count.  When the update chunks (large-batch NeRF), probe a
            # single-chunk update instead and scale per-ray (one extra
            # compile; encoder/Adam fixed costs over-scale by the chunk
            # count but are ~0.01% of the field FLOPs at these batches).
            rays_scene = rays_aval.shape[1]
            # the row budget keys on the CONDITIONED latent width the
            # renderer will actually see — pre-projection widens it to
            # cl*d_hidden (encode(), models/pixelnerf.py) — not the
            # encoder's latent_size; mirroring the render-side probe
            if getattr(model, "preproject", False):
                m = model.mlp_coarse
                lat_w = min(m.combine_layer, m.n_blocks) * m.d_hidden
            else:
                lat_w = getattr(model, "latent_size", 512)
            chunk = renderer.chunk_rays_for(
                rays_scene,
                int(nviews[0]),
                latent_width=lat_w,
                grad_remat=remat_on,
            )
            if not yolo and rays_scene > chunk and flops_step is not None:
                probe = list(sds)
                for i in (6, 7, 8):  # rays, rgb_gt, w share the ray dim
                    s = list(probe[i].shape)
                    s[1] = chunk
                    probe[i] = jax.ShapeDtypeStruct(
                        tuple(s), probe[i].dtype
                    )
                try:
                    pca = fn.lower(*probe).compile().cost_analysis()
                    if isinstance(pca, (list, tuple)):
                        pca = pca[0] if pca else None
                    if pca and "flops" in pca:
                        # the program executes ceil(R/chunk) full padded
                        # chunks, not a fractional count
                        import math
                        flops_step = float(pca["flops"]) * math.ceil(
                            rays_scene / chunk
                        )
                except Exception as e:  # noqa: BLE001 - accounting only
                    print(f"# chunked-flops probe failed: {e!r}",
                          file=sys.stderr)
            elif yolo and flops_step is not None:
                # YOLO layout: rays (SB, k, chunk, 8); the trainer renders
                # all k*chunk rays in ONE call and the YoloRenderer lax.map-
                # chunks internally by the row budget — the map body is
                # counted once, so re-probe a single-render-chunk update
                # (k=1, chunk=cb) and scale by the executed chunk count
                # (same encoder/Adam over-scale caveat as the NeRF probe)
                import math
                SBa, k_slots, chunk_r = rays_aval.shape[:3]
                b_total = k_slots * chunk_r
                cb = renderer.chunk_rays_for(
                    b_total, int(nviews[0]), latent_width=lat_w, sb=SBa,
                )
                if b_total > cb:
                    nc = math.ceil(b_total / cb)
                    cb_real = math.ceil(b_total / nc)
                    probe = list(sds)
                    for i in (6, 7):  # rays, targets: (SB, k, chunk, ...)
                        s = list(probe[i].shape)
                        s[1], s[2] = 1, cb_real
                        probe[i] = jax.ShapeDtypeStruct(
                            tuple(s), probe[i].dtype
                        )
                    s = list(probe[8].shape)  # anchors (k, A, 2)
                    s[0] = 1
                    probe[8] = jax.ShapeDtypeStruct(
                        tuple(s), probe[8].dtype
                    )
                    try:
                        pca = fn.lower(*probe).compile().cost_analysis()
                        if isinstance(pca, (list, tuple)):
                            pca = pca[0] if pca else None
                        if pca and "flops" in pca:
                            flops_step = float(pca["flops"]) * nc
                    except Exception as e:  # noqa: BLE001 - accounting only
                        print(f"# chunked-flops probe failed: {e!r}",
                              file=sys.stderr)

        with maybe_trace():
            t0 = time.perf_counter()
            for i in range(iters):
                losses = trainer.train_step(batch, i + 1)
            float(losses["t"])  # lazy chain: one sync at the end
            dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    record = {
        "metric": metric_name_for(bench_config),
        "value": round(steps_per_sec, 3),
        "unit": UNIT_TRAIN,
        "vs_baseline": 0.0,
        "ms_per_step": round(dt / iters * 1e3, 1),
        "rays_per_step": rays_step,
        "rays_trained_per_sec": round(steps_per_sec * rays_step, 1),
        # fwd + bwd reference-algorithm field FLOPs (bwd = 2x fwd matmul
        # convention; encoder/Adam excluded) — same-work comparison metric
        "mfu_reference_alg": round(
            steps_per_sec * rays_step
            * 3.0 * field_flops_per_ray(conf, 3 if yolo else 1)
            / PEAK_FLOPS, 4
        ),
        **({"remat": True} if remat_on else {}),
        **({"remat_policy": remat_policy} if remat_policy else {}),
        **({"remat_gather": True} if remat_gather else {}),
        **({"traced": True} if os.environ.get("BENCH_TRACE") else {}),
    }
    if flops_step is not None:
        # honest utilization: everything the compiled update executes
        # (chunk-scaled when the render is lax.map-chunked, see above)
        record["mfu_executed"] = round(
            steps_per_sec * flops_step / PEAK_FLOPS, 4
        )
        record["flops_per_step_executed"] = round(flops_step)
    record.update(device_state_probe())
    if flops_step is not None and record.get("probe_matmul_tflops"):
        # utilization against the SESSION's measured matmul ceiling
        # (see device_state_probe)
        record["mfu_vs_measured_peak"] = round(
            steps_per_sec * flops_step
            / (record["probe_matmul_tflops"] * 1e12), 4
        )
    print(json.dumps(record), flush=True)


def run_train_scaling_bench():
    """Weak scaling of the SHIPPED trainers' sharded jitted updates on a
    virtual CPU mesh (1/2/4/8 devices).  NeRF scales rays-per-step with
    the ray axis (fixed rays per device); YOLO scales scenes-per-step with
    the data axis (fixed scenes per device).  One host serializes the
    devices, so flat per-device work/s means the sharded update adds no
    overhead beyond the compute (same caveat as BENCH_CONFIG=scaling)."""
    import argparse
    import tempfile
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from synth_data import make_srn_dataset, make_yolo_dataset
    from pixelnerf_yolo_tpu.config.hocon import parse_string
    from pixelnerf_yolo_tpu.data import DataLoader, get_split_dataset
    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel, make_train_mesh
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.train import make_trainer
    from __graft_entry__ import _flagship, _DRYRUN_YOLO_CONF

    iters = int(os.environ.get("BENCH_ITERS", 4))
    rays_per_dev = 256  # NeRF: rays per device per step
    results = {"train_nerf": {}, "train_yolo": {}}

    with tempfile.TemporaryDirectory() as tmp:
        yolo_root = make_yolo_dataset(
            os.path.join(tmp, "ydata"), n_scenes=8, n_views=4, img_size=64
        )
        srn_root = os.path.join(tmp, "data", "cars")
        for stage in ("train", "val", "test"):
            make_srn_dataset(srn_root, stage=stage, n_objs=8, n_views=6,
                             img_size=32)

        for mode in ("train_nerf", "train_yolo"):
            for n_dev in (1, 2, 4, 8):
                if mode == "train_yolo":
                    conf = parse_string(_DRYRUN_YOLO_CONF)
                    dset, val_dset, _ = get_split_dataset(
                        "yolo", yolo_root, conf=conf
                    )
                    nviews, batch_size, rbs = [3], n_dev, 16
                    # scenes shard the data axis: mesh (n_dev, 1)
                    mesh = make_train_mesh(n_devices=n_dev,
                                           batch_size=n_dev)
                else:
                    flag = _flagship(d_hidden=64, backbone="resnet18",
                                     num_layers=2,
                                     compute_dtype="float32")
                    conf = parse_string(_DRYRUN_YOLO_CONF)
                    for k in ("model", "renderer"):
                        conf.put(k, flag.get_config(k))
                    conf.put("loss.rgb.use_l1", False)
                    conf.put("loss.rgb_fine.use_l1", False)
                    conf.put("loss.lambda_coarse", 1.0)
                    conf.put("loss.lambda_fine", 1.0)
                    dset, val_dset, _ = get_split_dataset("srn", srn_root)
                    nviews, batch_size = [1], 1
                    # BENCH_TP=1: carve a model_parallel=2 TP axis out of
                    # the mesh (hidden dim shards; rays get the rest).
                    # Total work per step is unchanged — each device does
                    # half the hidden dim over twice the rays — so the
                    # flat total-rate convention below still reads as
                    # sharding overhead
                    tp = 2 if (os.environ.get("BENCH_TP")
                               and n_dev % 2 == 0) else 1
                    rbs = rays_per_dev * n_dev
                    # rays shard the ray axis: mesh (1, n_dev[, tp])
                    mesh = make_train_mesh(n_devices=n_dev, batch_size=1,
                                           model_parallel=tp)

                args = argparse.Namespace(
                    name=f"sc_{mode}_{n_dev}", resume=False,
                    gpu_id=list(range(n_dev)),
                    logs_path=os.path.join(tmp, "logs"),
                    checkpoints_path=os.path.join(tmp, "ckpt"),
                    visual_path=os.path.join(tmp, "vis"),
                    epochs=1, lr=1e-4, gamma=1.0, ray_batch_size=rbs,
                    batch_size=batch_size, nviews=str(nviews[0]),
                    freeze_enc=None, no_bbox_step=100000, fixed_test=None,
                    seed=0,
                )
                for p in (args.logs_path, args.visual_path,
                          os.path.join(args.checkpoints_path, args.name)):
                    os.makedirs(p, exist_ok=True)
                model = make_model(conf.get_config("model"))
                renderer = make_renderer(conf)
                render_par = bind_parallel(renderer, model, gpus=None,
                                           mesh=mesh)
                trainer = make_trainer(args, conf, dset, val_dset, model,
                                       renderer, render_par, nviews)
                batch = next(iter(DataLoader(dset, batch_size=batch_size,
                                             shuffle=False)))
                for w in range(2):
                    losses = trainer.train_step(batch, w)
                    float(losses["t"])
                t0 = time.perf_counter()
                for i in range(iters):
                    losses = trainer.train_step(batch, i + 1)
                float(losses["t"])
                dt = (time.perf_counter() - t0) / iters
                # ONE host serializes the virtual devices, so dt grows with
                # TOTAL work even at perfect sharding; flat total work/s
                # (rays/s for nerf, scenes/s for yolo) = no sharding
                # overhead (same convention as BENCH_CONFIG=scaling)
                work = rbs if mode == "train_nerf" else batch_size
                results[mode][n_dev] = round(work / dt, 2)
                print(
                    f"# {mode} {n_dev} dev mesh={dict(mesh.shape)}: "
                    f"{1.0/dt:.2f} steps/s, total work/s "
                    f"{results[mode][n_dev]}",
                    file=sys.stderr,
                )

    eff = {
        m: round(results[m][8] / results[m][2], 4) for m in results
    }
    print(
        json.dumps(
            {
                "metric": "sharded_train_weak_scaling_8dev_virtual",
                "value": eff["train_nerf"],
                "unit": "total work rate 8dev(8W)/2dev(2W) on one host "
                "(1.0 = no sharding overhead)",
                "vs_baseline": eff["train_nerf"],
                "yolo_efficiency": eff["train_yolo"],
                "total_work_per_sec": results,
            }
        )
    )


def run_scaling_bench():
    """Weak scaling on a virtual CPU mesh: rays/s at 1/2/4/8 devices with
    fixed rays per device.  See the module docstring for what this does
    and does NOT measure."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp

    from pixelnerf_yolo_tpu.models import make_model
    from pixelnerf_yolo_tpu.parallel import bind_parallel, make_mesh
    from pixelnerf_yolo_tpu.render import make_renderer
    from pixelnerf_yolo_tpu.utils.camera import gen_rays
    from __graft_entry__ import _flagship

    conf = _flagship(d_hidden=64, backbone="resnet18", num_layers=2,
                     compute_dtype="float32")
    model = make_model(conf.get_config("model"))
    renderer = make_renderer(conf)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(1, 1, 3, 64, 64)).astype(np.float32).clip(-1, 1)
    )
    poses = np.stack([np.eye(4, dtype=np.float32)])
    poses[:, 2, 3] = 1.3
    poses = jnp.asarray(poses[None])
    focal = jnp.asarray(np.float32(60.0))
    variables = model.init(jax.random.PRNGKey(0), images[0])
    cond = model.encode(variables, images, poses, focal)
    key = jax.random.PRNGKey(1)

    rays_per_dev = int(os.environ.get("BENCH_SCALING_RAYS", 1024))
    all_rays = gen_rays(poses[0], 128, 128, jnp.float32(60.0), 0.8,
                        1.8).reshape(1, -1, 8)

    results = {}
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=n_dev)
        rp = bind_parallel(renderer, model, mesh=mesh, want_weights=False)
        rays = all_rays[:, : rays_per_dev * n_dev]
        out = rp(variables, cond, rays, key)
        jax.block_until_ready(out)
        iters = 4
        t0 = time.perf_counter()
        for i in range(iters):
            out = rp(variables, cond, rays, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        results[n_dev] = rays.shape[1] / dt
        print(
            f"# weak-scaling {n_dev} dev: {results[n_dev]:,.0f} rays/s "
            f"({rays.shape[1]} rays)",
            file=sys.stderr,
        )

    # single host serializes devices: perfect sharding => flat rays/s.
    # Base on the 2-device point — the 1-device run is dominated by
    # per-dispatch overhead at these tiny CPU workloads.
    efficiency = results[8] / results[2]
    emit_metric = {
        "metric": "weak_scaling_sharding_efficiency_8dev_virtual",
        "value": round(efficiency, 4),
        "unit": "t(2dev,2R)/t(8dev,8R) on one host (1.0 = no sharding overhead)",
        "vs_baseline": round(efficiency, 4),
        "per_device_rays_per_sec": {str(k): round(v, 1)
                                    for k, v in results.items()},
    }
    print(json.dumps(emit_metric))


def _probe_device(timeout_s: float) -> str | None:
    """Run one trivial device op on a watchdog thread.  The axon TPU
    relay, when its host-side tunnel process has died, makes every jax
    client hang FOREVER in its first device call — an explicit error
    line beats an infinitely hung bench.  Returns None if the device
    responds, else an error string.

    bench.py itself probes via _probe_subprocess (a hung THREAD still
    holds the device client; a subprocess doesn't) — this in-process
    variant remains for __graft_entry__.entry(), which must probe inside
    the caller's process before handing it a jitted fn."""
    import threading

    result: list = []

    def _touch():
        import jax
        import jax.numpy as jnp

        d = jax.devices()[0]
        x = jnp.ones((8, 8)) + 1.0
        x.block_until_ready()
        result.append(str(d.platform))

    t = threading.Thread(target=_touch, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        return (
            f"device unresponsive after {timeout_s:.0f}s "
            "(TPU relay tunnel down?)"
        )
    return None


CPU_CONFIGS = ("scaling", "train_scaling")
ALL_CONFIGS = ("nerf", "nerf_coarse", "nerf_mv", "nerf_int8", "nerf_w8a8",
               "nerf_serve8", "nerf_et", "yolo", "yolo_w8a8", "dtu_video",
               "train_nerf", "train_yolo", "serve_artifact") + CPU_CONFIGS


def _inner_main():
    """Run ONE BENCH_CONFIG in this process (spawned by _outer_main)."""
    import jax

    # cache dir keyed by platform: CPU AOT artifacts are machine-feature
    # specific (cpu_aot_loader SIGILL warnings / NaN garbage when shared
    # across contexts — see tests/conftest.py), so never mix them with
    # the device cache
    bench_config = os.environ.get("BENCH_CONFIG", "nerf")
    plat = (
        "cpu" if bench_config in CPU_CONFIGS
        else (os.environ.get("JAX_PLATFORMS") or "axon")
    )
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_comp_cache_bench_{plat}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # the axon sitecustomize force-sets jax_platforms at import, so the
    # JAX_PLATFORMS env var alone is ignored — re-apply it (shared
    # helper; lets CI/dev run device configs on CPU; scaling configs
    # override to cpu themselves below)
    from pixelnerf_yolo_tpu.config.args import apply_platform_env

    apply_platform_env()

    if bench_config == "scaling":
        run_scaling_bench()
        return
    if bench_config == "train_scaling":
        run_train_scaling_bench()
        return
    if bench_config in ("train_nerf", "train_yolo"):
        run_train_bench(bench_config)
        return
    if bench_config == "serve_artifact":
        run_serve_artifact_bench()
        return
    if bench_config not in ALL_CONFIGS:
        raise SystemExit(
            f"unknown BENCH_CONFIG={bench_config!r}; expected one of "
            + " | ".join(ALL_CONFIGS)
        )
    run_render_bench(bench_config)


def _probe_subprocess(timeout_s: float):
    """Probe the accelerator with a THROWAWAY subprocess.  A dead TPU
    relay leaves every jax client hung forever in its first device call;
    an in-process probe would strand a hung thread holding the device
    client, while a subprocess can simply be abandoned.  Returns None
    when the device answers, else an error string."""
    import subprocess

    code = (
        "import os, jax, jax.numpy as jnp; "
        # sitecustomize force-sets jax_platforms: re-apply the env var so
        # a JAX_PLATFORMS=cpu invocation probes the backend it will use
        # (deliberately inlined rather than config.args.apply_platform_env
        # — the throwaway probe must not pay the package import)
        "p = os.environ.get('JAX_PLATFORMS'); "
        "p and jax.config.update('jax_platforms', p); "
        "(jnp.ones((8, 8)) + 1.0).block_until_ready(); print('ok')"
    )
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
    except Exception:
        return (
            f"device unresponsive after {timeout_s:.0f}s "
            "(TPU relay tunnel down?)"
        )
    if p.returncode != 0:
        return f"device probe failed (rc={p.returncode})"
    return None


def _run_config_subprocess(cfg: str, timeout_s: float):
    """Run one BENCH_CONFIG as a bounded subprocess.

    Returns (ok, stdout_lines, why).  ok requires rc == 0 and at least
    one parseable JSON record line without an "error" key."""
    import subprocess

    env = dict(os.environ, BENCH_INNER="1", BENCH_CONFIG=cfg)
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            timeout=timeout_s, stdout=subprocess.PIPE,
        )
        out, rc, why = p.stdout, p.returncode, f"rc={p.returncode}"
    except subprocess.TimeoutExpired as e:
        out, rc, why = e.stdout or b"", -1, f"timeout after {timeout_s:.0f}s"
    lines = [
        ln for ln in out.decode(errors="replace").splitlines() if ln.strip()
    ]
    ok = False
    if rc == 0:
        for ln in lines:
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            if isinstance(rec, dict) and "value" in rec and "error" not in rec:
                ok = True
    return ok, lines, why


def _emit_error(cfg: str, err: str):
    print(
        json.dumps({
            "metric": metric_name_for(cfg),
            "value": 0.0,
            "unit": unit_for(cfg),
            "vs_baseline": 0.0,
            "error": err,
        }),
        flush=True,
    )


def _outer_main():
    """Orchestrate the bench run: probe, bound, retry, order.

    With BENCH_CONFIG unset (the driver's `python bench.py`), runs the
    REQUIRED nerf headline FIRST (so no earlier run can wedge the TPU
    relay before the headline lands — the relay's known failure mode is
    a client killed mid-compile), then the yolo / train_nerf /
    train_yolo benches, RE-PRINTING the nerf record after each optional
    record: the last stdout line is the nerf record at every instant,
    even if the whole process is killed mid-optional.  Never runs two
    device clients concurrently."""
    t_start = time.monotonic()
    # 1100 s: the r4 driver killed the process at ~20 min (rc=124), so
    # the outer loop must self-bound WELL inside that and exit 0 — an
    # artifact that completed beats one whose process was killed
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 1100))
    probe_timeout = float(os.environ.get("PNY_BENCH_PROBE_TIMEOUT", 240))

    cfg_env = os.environ.get("BENCH_CONFIG")
    if cfg_env:
        required, optionals = cfg_env, []
    else:
        # cheapest-first (measured warm-cache walls r5: yolo 35 s,
        # nerf_et ~40 s, train_yolo ~2 min, train_nerf ~1.5 min warm /
        # ~10 min cold, dtu_video last) so a cold session still lands
        # the detection + serving-lever + one train record before the
        # budget runs out
        required, optionals = "nerf", ["yolo", "nerf_et", "train_yolo",
                                       "train_nerf", "dtu_video"]

    # -- required config: probe, run, one retry, error record on failure --
    req_lines = []
    if required in CPU_CONFIGS:
        ok, req_lines, why = _run_config_subprocess(
            required, max(budget - 30.0, 120.0)
        )
        if not ok:
            for ln in req_lines:
                print(ln, file=sys.stderr, flush=True)
            _emit_error(required, f"bench subprocess failed: {why}")
            sys.exit(2)
    else:
        err = _probe_subprocess(probe_timeout) if probe_timeout > 0 else None
        if err is not None:
            time.sleep(20)  # transient relay hiccup: re-probe once
            err = _probe_subprocess(probe_timeout)
        if err is not None:
            _emit_error(required, err)
            sys.exit(2)
        ok, why = False, ""
        for attempt in range(2):
            remaining = budget - (time.monotonic() - t_start)
            ok, req_lines, why = _run_config_subprocess(
                required, max(remaining - 60.0, 240.0)
            )
            if ok:
                break
            print(f"# {required} attempt {attempt + 1} failed ({why})",
                  file=sys.stderr, flush=True)
            for ln in req_lines:
                print(ln, file=sys.stderr, flush=True)
            if attempt == 0 and _probe_subprocess(probe_timeout) is not None:
                why = f"{why}; device unresponsive on re-probe"
                break
        if not ok:
            _emit_error(required, f"bench failed: {why}")
            sys.exit(2)
    for ln in req_lines:
        print(ln, flush=True)

    # -- optional configs: best-effort, never jeopardize the record above --
    for cfg in optionals:
        remaining = budget - (time.monotonic() - t_start)
        if remaining < 360.0:
            print(f"# skipping optional {cfg}: low budget", file=sys.stderr,
                  flush=True)
            continue
        if _probe_subprocess(probe_timeout) is not None:
            print(f"# skipping remaining optionals: device unresponsive",
                  file=sys.stderr, flush=True)
            break
        ok, lines, why = _run_config_subprocess(
            cfg, min(900.0, remaining - 60.0)
        )
        if ok:
            for ln in lines:
                print(ln, flush=True)
            # keep the last-line invariant: the headline record stays last
            for ln in req_lines:
                print(ln, flush=True)
        else:
            print(f"# optional {cfg} failed ({why})", file=sys.stderr,
                  flush=True)
            for ln in lines:
                print(ln, file=sys.stderr, flush=True)


def main():
    if os.environ.get("BENCH_INNER") == "1":
        _inner_main()
    else:
        _outer_main()


if __name__ == "__main__":
    main()
