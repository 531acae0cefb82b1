"""Port the detectron2 PointRend checkpoint to pointrend_r50fpn.npz.

The reference's preproc downloads detectron2's
``PointRend/InstanceSegmentation/pointrend_rcnn_R_50_FPN_3x_coco``
checkpoint at run time (scripts/preproc.py:128).  Run this once wherever
that pkl (or a torch state_dict of the same model) is available:

    python scripts/port_detectron2.py model_final_3c3198.pkl

then place the npz in $PNY_PRETRAINED_DIR, <repo>/weights/ or
~/.cache/pixelnerf_yolo_tpu/ — pixelnerf_yolo_tpu.segment loads it from
there (same pipeline as port_lpips.py / port_torchvision.py).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_checkpoint(path: str) -> dict:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data["model"] if "model" in data else data
    else:  # torch .pth state dict
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        sd = data.get("model", data)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
    return {k: np.asarray(v) for k, v in sd.items()
            if hasattr(v, "shape")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="model_final_3c3198.pkl or .pth")
    ap.add_argument("-o", "--out", default="pointrend_r50fpn.npz")
    args = ap.parse_args()

    sd = load_checkpoint(args.checkpoint)
    # validate by running the port (raises on missing/mis-shaped keys)
    from pixelnerf_yolo_tpu.segment.port import port_detectron2_state_dict

    port_detectron2_state_dict(sd)
    np.savez(args.out, **sd)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
