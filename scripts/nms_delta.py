"""Measure the device-NMS vs host-NMS metric delta (VERDICT r3 item 5).

The YOLO metric path has two implementations of "NMS both sets, then
greedy IoU matching":

  host   detect.boxes.calculate_tp_fp_fn — bit-parity with the reference's
         list NMS (/root/reference/src/util/util.py:691-720) INCLUDING its
         remove-while-iterating skip quirk, which can keep extra
         overlapping boxes in dense clusters.
  device detect.nms_jax.tp_fp_fn_padded — standard quirk-free greedy NMS,
         jittable, with a static kept-box cap (yolo.nms_max_out).

This script quantifies the divergence on synthetic dense scenes (duplicate
GT clusters, >64 raw candidates, jittered + spurious predictions) so the
default metric path is chosen on evidence, not vibes.  Run:

    python scripts/nms_delta.py

Results recorded in PARITY.md ("Device vs host NMS metric delta").
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pixelnerf_yolo_tpu.detect.boxes import (  # noqa: E402
    calculate_precision_recall_f1,
    calculate_tp_fp_fn,
)
from pixelnerf_yolo_tpu.detect.nms_jax import tp_fp_fn_padded  # noqa: E402

NMS_IOU = 0.75   # conf/exp/yolo.conf:49
NMS_T = 0.45     # conf/exp/yolo.conf:50
MATCH_IOU = 0.2  # conf/exp/yolo.conf:52


def make_scene(rng, n_clusters, dup_per_cluster, n_spurious, n_noise_pred):
    """Synthetic raw decode lists shaped like convert_cells_to_bboxes
    output rows [class, score, x, y, w, h] (normalized coords).

    GT comes as CLUSTERS of near-duplicate boxes (the decode of a grid
    target places one box per responsible cell, so dense scenes yield
    duplicate clusters that NMS must collapse) — this is exactly the
    shape that triggers the reference list-NMS skip quirk.
    """
    gt, pred = [], []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        w, h = rng.uniform(0.08, 0.2, 2)
        cls = int(rng.integers(0, 2))
        for d in range(dup_per_cluster):
            jx, jy = rng.normal(0, 0.004, 2)
            gt.append([cls, 1.0, cx + jx, cy + jy, w, h])
        # predictions: duplicate cluster too, varying confidence
        for d in range(dup_per_cluster):
            jx, jy = rng.normal(0, 0.01, 2)
            jw, jh = rng.normal(0, 0.01, 2)
            score = float(rng.uniform(0.5, 0.99))
            pred.append([cls, score, cx + jx, cy + jy, w + jw, h + jh])
    for _ in range(n_spurious):
        # confident false positives away from GT
        cx, cy = rng.uniform(0.05, 0.95, 2)
        w, h = rng.uniform(0.02, 0.06, 2)
        pred.append([int(rng.integers(0, 2)), float(rng.uniform(0.5, 0.9)),
                     cx, cy, w, h])
    for _ in range(n_noise_pred):
        # sub-threshold noise (NMS filters these; exercises the filter)
        cx, cy = rng.uniform(0.0, 1.0, 2)
        pred.append([int(rng.integers(0, 2)), float(rng.uniform(0.0, 0.4)),
                     cx, cy, rng.uniform(0.02, 0.3), rng.uniform(0.02, 0.3)])
    return gt, pred


def _pad(rows, n):
    """Pad a decode list to n rows with score<=0 padding (the
    tp_fp_fn_padded contract) so every scene shares ONE jit shape."""
    arr = np.zeros((n, 6), np.float32)
    arr[:, 1] = -1.0
    if rows:
        arr[: len(rows)] = np.asarray(rows, np.float32)
    return jnp.asarray(arr)


def run(scenes, max_out):
    host = np.zeros(3, np.int64)
    dev = np.zeros(3, np.int64)
    capped = 0
    pad_gt = 1 << int(np.ceil(np.log2(max(len(g) for g, _ in scenes))))
    pad_pred = 1 << int(np.ceil(np.log2(max(len(p) for _, p in scenes))))
    for gt, pred in scenes:
        host += np.array(
            calculate_tp_fp_fn(gt, pred, NMS_IOU, NMS_T, MATCH_IOU)
        )
        tp, fp, fn = tp_fp_fn_padded(
            _pad(gt, pad_gt),
            _pad(pred, pad_pred),
            NMS_IOU, NMS_T, MATCH_IOU, max_out=max_out,
        )
        tp, fp, fn = int(tp), int(fp), int(fn)
        if tp + fp >= max_out:
            capped += 1
        dev += np.array([tp, fp, fn])
    return host, dev, capped


def fmt(tpfpfn):
    p, r, f1 = calculate_precision_recall_f1(*[int(x) for x in tpfpfn])
    return (f"TP {tpfpfn[0]:4d} FP {tpfpfn[1]:4d} FN {tpfpfn[2]:4d}  "
            f"P {p:.4f} R {r:.4f} F1 {f1:.4f}")


def main():
    print(f"protocol: nms_iou={NMS_IOU} nms_t={NMS_T} match_iou={MATCH_IOU}")
    cases = [
        # (label, n_clusters, dup, spurious, noise, n_scenes)
        ("sparse (ref-like, 2 obj)",            2, 3,  1, 20, 24),
        ("moderate (8 obj, dup clusters)",      8, 5,  4, 40, 24),
        ("dense (20 obj, >64 raw kept preds)", 20, 6, 50, 60, 24),
        ("pathological (40 obj clusters)",     40, 8, 60, 80, 12),
    ]
    for max_out in (64, 128, 256):
        print(f"\n== device max_out={max_out} ==")
        for label, ncl, dup, spur, noise, n_scenes in cases:
            rng = np.random.default_rng(0)
            scenes = [make_scene(rng, ncl, dup, spur, noise)
                      for _ in range(n_scenes)]
            host, dev, capped = run(scenes, max_out)
            hp, hr, hf1 = calculate_precision_recall_f1(*[int(x) for x in host])
            dp, dr, df1 = calculate_precision_recall_f1(*[int(x) for x in dev])
            print(f"[{label}] ({n_scenes} scenes)")
            print(f"  host   {fmt(host)}")
            print(f"  device {fmt(dev)}  (capped scenes: {capped})")
            print(f"  delta  dP {dp-hp:+.4f} dR {dr-hr:+.4f} dF1 {df1-hf1:+.4f}")


if __name__ == "__main__":
    main()
