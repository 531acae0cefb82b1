"""Background removal + crop/normalization of real photos for eval_real.

Capability parity with /root/reference/scripts/preproc.py:1-303, which uses
a vendored detectron2 PointRend instance segmentation to mask the object,
then crops/normalizes to a white-background square image
(<name>_normalize.png).

Segmentation backends (--seg, default ``auto``):
  * pointrend: the NATIVE JAX PointRend R50-FPN pipeline
    (pixelnerf_yolo_tpu.segment — backbone/RPN/ROI/point-head
    re-implemented from the reference's vendored subset).  Needs
    ``pointrend_r50fpn.npz`` on the pretrained search path (run
    scripts/port_detectron2.py once on the published detectron2
    checkpoint — the same offline porting pipeline as LPIPS).
  * grabcut: OpenCV GrabCut seeded with a center rectangle —
    dependency-free fallback, adequate for centered single-object
    photos (weaker near thin structures; scripts/compare_masks.py
    quantifies the divergence on the shipped inputs).
  * auto: pointrend when the npz is present, else grabcut.

The reference's own PointRend-normalized photos are shipped in input/
so eval_real never depends on local mask quality.

Usage: python scripts/preproc.py <images...> [-o input] [--size 128]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

try:
    import cv2
except ImportError as e:  # pragma: no cover
    raise ImportError("scripts/preproc.py requires opencv") from e


def segment_grabcut(img: np.ndarray, iters: int = 5) -> np.ndarray:
    """Foreground mask via GrabCut seeded with an 80% center rect."""
    h, w = img.shape[:2]
    rect = (int(w * 0.1), int(h * 0.1), int(w * 0.8), int(h * 0.8))
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, mask, rect, bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
    return ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)


_POINTREND = None


def segment_pointrend(img: np.ndarray,
                      coco_class: int = 2) -> np.ndarray:
    """Native PointRend instance segmentation (pixelnerf_yolo_tpu.segment).

    Mirrors the reference wrapper (scripts/preproc.py:106-174): filter to
    ``coco_class`` (2 = car, the reference's default), take the
    best-scoring instance's mask.
    """
    global _POINTREND
    if _POINTREND is None:
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..")
        )
        from pixelnerf_yolo_tpu.segment import PointRendPredictor

        _POINTREND = PointRendPredictor(filter_class=coco_class)
    masks = _POINTREND.segment(img)
    if len(masks) == 0:
        print("WARNING: PointRend detected no objects; keeping everything")
        return np.ones(img.shape[:2], np.uint8)
    return (masks[0] > 127).astype(np.uint8)


def normalize_image(img: np.ndarray, mask: np.ndarray, size: int,
                    pad_frac: float = 0.1) -> np.ndarray:
    """White-composite the object, crop to a padded square, resize."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        crop = img
    else:
        y0, y1 = ys.min(), ys.max()
        x0, x1 = xs.min(), xs.max()
        side = int(max(y1 - y0, x1 - x0) * (1 + 2 * pad_frac))
        cy, cx = (y0 + y1) // 2, (x0 + x1) // 2
        half = side // 2
        comp = np.full_like(img, 255)
        m3 = mask[..., None].astype(bool)
        np.copyto(comp, img, where=np.broadcast_to(m3, img.shape))
        # pad the composite so the crop never leaves the image
        comp = cv2.copyMakeBorder(
            comp, half, half, half, half, cv2.BORDER_CONSTANT,
            value=(255, 255, 255),
        )
        crop = comp[cy : cy + 2 * half, cx : cx + 2 * half]
    return cv2.resize(crop, (size, size), interpolation=cv2.INTER_AREA)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("images", nargs="+", help="input image paths")
    parser.add_argument("-o", "--output", default="input",
                        help="output directory")
    parser.add_argument("--size", type=int, default=128,
                        help="output square size")
    parser.add_argument("--seg", choices=["auto", "grabcut", "pointrend"],
                        default="auto")
    parser.add_argument("--coco_class", type=int, default=2,
                        help="COCO class wanted (0 = human, 2 = car; "
                        "-1 = any), pointrend only")
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    seg_kind = args.seg
    if seg_kind == "auto":
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from pixelnerf_yolo_tpu.segment import pointrend_npz_path

        seg_kind = "pointrend" if pointrend_npz_path() else "grabcut"
        print(f"--seg auto -> {seg_kind}")
    if seg_kind == "pointrend":
        def seg(img):
            return segment_pointrend(img, args.coco_class)
    else:
        seg = segment_grabcut
    for path in args.images:
        img = cv2.imread(path)
        if img is None:
            print("skip unreadable", path)
            continue
        mask = seg(img)
        out = normalize_image(img, mask, args.size)
        base = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output, base + "_normalize.png")
        cv2.imwrite(out_path, out)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
