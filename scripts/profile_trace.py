"""On-chip stage attribution for PERF.md — capture + parse in one tool.

The reference annotates its hot path with
``torch.autograd.profiler.record_function`` scopes (``model_inference``
/root/reference/src/model/models.py:163, ``renderer_composite``
/root/reference/src/render/nerf.py:181, ``encoder_index``
/root/reference/src/model/encoder.py:89, ``resnetfc_infer``
/root/reference/src/model/resnetfc.py:141, ``positional_enc``
/root/reference/src/model/code.py:36) but ships no driver that consumes
them.  This script is the TPU-native driver: it records a
``jax.profiler`` trace of bench.py's steady-state render loop (via the
``BENCH_TRACE`` hook) and reduces the perfetto device timeline to the
per-stage table PERF.md publishes, attributing every XLA fusion to the
``jax.named_scope`` cut points mirrored from the reference.

Capture + parse (needs the accelerator bench.py would use):

    python scripts/profile_trace.py --config nerf --iters 3

Parse an existing trace directory or perfetto json(.gz):

    python scripts/profile_trace.py --parse-only /tmp/jax_trace_r3

Each XLA-op event in the perfetto export carries ``tf_op`` (the full
jit/named_scope path), ``source`` (file:line), ``hlo_category``,
``model_flops`` and ``bytes_accessed`` — everything needed for a
roofline-style table without cross-referencing the compiled HLO.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import subprocess
import sys
from collections import defaultdict

# Innermost named_scope wins; order here only names the table rows.
# encoder_trunk / optimizer are train-step cut points beyond the
# reference's scope set (--config train_nerf / train_yolo traces).
KNOWN_SCOPES = (
    "encoder_index_pre",
    "encoder_index",
    "positional_enc",
    "resblock",
    "resnetfc_infer",
    "model_inference",
    "renderer_composite",
    "renderer_forward",
    "encoder_trunk",
    "optimizer",
)

# Timeline container ops whose duration covers their children; summing
# them would double-count every leaf inside the lax.map while loop.
CONTAINER_CATEGORIES = {"while", "conditional", "call"}


def load_perfetto(path):
    """Return the traceEvents list from a perfetto .json / .json.gz."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"] if isinstance(data, dict) else data


def find_trace_file(root):
    """Newest trace json under a profiler output dir.

    Prefers the perfetto export; falls back to the Chrome-format
    ``<host>.trace.json.gz`` (same event schema — both carry the
    tf_op / hlo_category / model_flops args on the XLA Ops thread),
    which is what ``jax.profiler.trace`` writes by default.
    """
    if os.path.isfile(root):
        return root
    for pattern in ("perfetto_trace.json*", "*.trace.json*"):
        hits = sorted(
            glob.glob(os.path.join(root, "**", pattern), recursive=True),
            key=os.path.getmtime,
        )
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no trace json under {root}")


def device_op_events(events):
    """X-phase events on every '/device:*' process's 'XLA Ops' thread."""
    device_pids = set()
    op_tids = {}  # pid -> tid of the XLA Ops thread
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and str(
            e.get("args", {}).get("name", "")
        ).startswith("/device:"):
            device_pids.add(e["pid"])
        if (
            e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Ops"
        ):
            op_tids[e["pid"]] = e["tid"]
    keep = {(p, op_tids[p]) for p in device_pids if p in op_tids}
    return [
        e
        for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in keep
    ]


def stage_of(tf_op):
    """Deepest known named_scope on the op's jit path, else a fallback."""
    if not tf_op:
        return "(no scope)"
    # tf_op is slash-separated, innermost scope last before the op name
    for seg in reversed(tf_op.split("/")):
        for scope in KNOWN_SCOPES:
            if seg == scope or seg.startswith(scope):
                return scope
    return "(outside scopes)"


def aggregate(events, iters=1):
    """Reduce device op events to (stage table, per-op rows).

    Durations are divided by ``iters`` so the table reads per-iteration.
    Container ops (the lax.map `while` etc.) are excluded — their
    duration covers the very fusions being attributed.
    """
    stages = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # ms, gflop, gb, n
    # keyed by (stage, source, category): anonymous fusion.N instances of
    # the same source op aggregate without mixing unrelated fusions
    per_op = defaultdict(lambda: [0.0, 0])  # ms, n
    for e in events:
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat in CONTAINER_CATEGORIES:
            continue
        ms = e.get("dur", 0.0) / 1000.0 / iters
        flops = float(args.get("model_flops", 0) or 0) / iters
        byts = float(args.get("bytes_accessed", 0) or 0) / iters
        stage = stage_of(args.get("tf_op", ""))
        s = stages[stage]
        s[0] += ms
        s[1] += flops / 1e9
        s[2] += byts / 1e9
        s[3] += 1
        o = per_op[(stage, args.get("source", ""), cat)]
        o[0] += ms
        o[1] += 1
    return stages, per_op


def print_report(stages, per_op, top=12, peak_tflops=197.0, hbm_gbs=819.0):
    total_ms = sum(v[0] for v in stages.values())
    print(f"\n== Stage attribution (per iteration; device total "
          f"{total_ms:.1f} ms) ==")
    print(f"{'stage':<22}{'ms':>9}{'%':>7}{'GFLOP':>9}{'GB':>8}"
          f"{'TFLOP/s':>9}{'GB/s':>8}")
    for stage, (ms, gflop, gb, n) in sorted(
        stages.items(), key=lambda kv: -kv[1][0]
    ):
        tfs = gflop / ms if ms else 0.0  # GFLOP/ms == TFLOP/s
        gbs = gb / ms * 1000 if ms else 0.0
        print(
            f"{stage:<22}{ms:>9.2f}{100 * ms / total_ms:>6.1f}%"
            f"{gflop:>9.1f}{gb:>8.2f}{tfs:>9.1f}{gbs:>8.0f}"
        )
    print(f"\n(peak reference: {peak_tflops:.0f} bf16 TFLOP/s, "
          f"{hbm_gbs:.0f} GB/s HBM on v5e)")
    print(f"\n== Top {top} ops (grouped by stage/source/category) ==")
    print(f"{'ms':>9}  {'n':>4}  {'stage':<20}{'category':<22}source")
    for (stage, src, cat), (ms, n) in sorted(
        per_op.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        src = src.replace("/root/repo/", "")
        print(f"{ms:>9.2f}  {n:>4}  {stage:<20}{cat:<22}{src}")


def capture(config, outdir, iters, rays):
    env = dict(os.environ)
    env.update(
        BENCH_CONFIG=config,
        BENCH_TRACE=outdir,
        BENCH_ITERS=str(iters),
    )
    if rays:
        env["BENCH_RAYS"] = str(rays)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")], env=env, check=True
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default="nerf",
                    help="BENCH_CONFIG operating point (nerf | yolo | ...)")
    ap.add_argument("--iters", type=int, default=3,
                    help="bench iterations inside the trace window")
    ap.add_argument("--rays", type=int, default=None, help="BENCH_RAYS")
    ap.add_argument("--outdir", default="/tmp/pny_trace",
                    help="profiler output dir (capture mode)")
    ap.add_argument("--parse-only", metavar="PATH", default=None,
                    help="skip capture; parse this trace dir / json(.gz)")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbs", type=float, default=819.0)
    args = ap.parse_args(argv)

    if args.parse_only:
        path, iters = args.parse_only, args.iters
    else:
        capture(args.config, args.outdir, args.iters, args.rays)
        path, iters = args.outdir, args.iters

    trace = find_trace_file(path)
    print(f"parsing {trace} (normalizing by iters={iters})")
    events = load_perfetto(trace)
    ops = device_op_events(events)
    if not ops:
        sys.exit("no device-side XLA op events found in the trace")
    stages, per_op = aggregate(ops, iters=iters)
    print_report(stages, per_op, top=args.top,
                 peak_tflops=args.peak_tflops, hbm_gbs=args.hbm_gbs)


if __name__ == "__main__":
    main()
