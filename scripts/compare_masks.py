"""Visual GrabCut-vs-PointRend mask comparison for preproc.py.

The reference removes photo backgrounds with a vendored detectron2
PointRend (/root/reference/scripts/preproc.py:19-29 + ~980 vendored LoC).
This framework went further than vendoring: `pixelnerf_yolo_tpu.segment`
is a NATIVE JAX PointRend R50-FPN (preproc's default backend when its
ported npz weights are present); GrabCut remains the dependency-free
fallback (`--seg grabcut`, or auto when no npz).

This script quantifies the fallback's divergence wherever cv2 is
available: for each raw photo it runs preproc's GrabCut, loads the
reference's shipped PointRend-normalized output, and writes a
side-by-side panel plus the mask IoU.

Usage: python scripts/compare_masks.py <raw.jpg> <ref_normalize.png> ...
       (pairs; writes <raw>_maskcmp.png next to each input)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    import imageio.v2 as imageio

    from preproc import normalize_image, segment_grabcut

    if len(argv) < 2 or len(argv) % 2:
        raise SystemExit(__doc__)
    for raw_path, ref_path in zip(argv[0::2], argv[1::2]):
        raw = imageio.imread(raw_path)[..., :3]
        ref = imageio.imread(ref_path)[..., :3]
        mask = segment_grabcut(raw)
        ours = normalize_image(raw, mask, size=ref.shape[0])

        # mask IoU in the normalized frame: foreground = non-white
        fg_ours = (ours < 250).any(-1)
        fg_ref = (ref < 250).any(-1)
        inter = (fg_ours & fg_ref).sum()
        union = (fg_ours | fg_ref).sum()
        iou = inter / max(union, 1)

        panel = np.concatenate([ours, ref], axis=1)
        out = os.path.splitext(raw_path)[0] + "_maskcmp.png"
        imageio.imwrite(out, panel.astype(np.uint8))
        print(f"{os.path.basename(raw_path)}: grabcut-vs-pointrend "
              f"normalized-frame mask IoU {iou:.3f} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
