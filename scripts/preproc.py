"""Background removal + crop/normalization of real photos for eval_real.

Capability parity with /root/reference/scripts/preproc.py:1-303, which uses
a vendored detectron2 PointRend instance segmentation to mask the object,
then crops/normalizes to a white-background square image
(<name>_normalize.png).

This environment has no detectron2/pretrained PointRend, so segmentation is
pluggable:
  * --seg pointrend: use detectron2 PointRend when importable (same as ref)
  * --seg grabcut (default): OpenCV GrabCut seeded with a center rectangle —
    dependency-free and adequate for centered single-object photos

DECISION (r3, permanent divergence): the reference's vendored PointRend
subset is NOT vendored here — detectron2 cannot be installed or imported
in the target environment, so it would be ~980 lines of dead, untestable
code.  GrabCut masks are qualitatively weaker (they can bleed background
near thin structures); the reference's own PointRend-normalized photos
are shipped in input/ so eval_real never depends on local mask quality,
and scripts/compare_masks.py quantifies the mask divergence (side-by-side
panel + IoU) wherever cv2 exists.

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


def segment_pointrend(img: np.ndarray) -> np.ndarray:  # pragma: no cover
    """PointRend instance segmentation (requires detectron2)."""
    from detectron2 import model_zoo  # noqa: F401
    from detectron2.config import get_cfg
    from detectron2.engine import DefaultPredictor
    from detectron2.projects import point_rend

    cfg = get_cfg()
    point_rend.add_pointrend_config(cfg)
    cfg.merge_from_file(
        model_zoo.get_config_file(
            "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml"
        )
    )
    cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml"
    )
    predictor = DefaultPredictor(cfg)
    outputs = predictor(img)
    masks = outputs["instances"].pred_masks.cpu().numpy()
    if len(masks) == 0:
        return np.ones(img.shape[:2], np.uint8)
    areas = masks.reshape(len(masks), -1).sum(1)
    return masks[int(np.argmax(areas))].astype(np.uint8)


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
    parser.add_argument("--seg", choices=["grabcut", "pointrend"],
                        default="grabcut")
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    seg = segment_pointrend if args.seg == "pointrend" else segment_grabcut
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
