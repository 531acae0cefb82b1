"""Port torchvision ImageNet backbone weights to this framework's npz cache.

The reference's SpatialEncoder loads torchvision resnet18/34 with
``pretrained=True`` (/root/reference/src/model/encoder.py:60-66).  This CLI
runs wherever torchvision is installed (torch used offline only) and writes
``<backbone>_imagenet.npz`` for nn/pretrained.py to consume:

  python scripts/port_torchvision.py --backbone resnet34 --out weights/

Accepts either torchvision's downloader or a local .pth state_dict
(--state_dict) for air-gapped machines.
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

from pixelnerf_yolo_tpu.nn.pretrained import save_backbone_npz  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backbone", default="resnet34",
                        choices=["resnet18", "resnet34"])
    parser.add_argument("--state_dict", default=None,
                        help="local .pth torchvision state_dict (skips the "
                        "torchvision downloader)")
    parser.add_argument("--out", default="weights",
                        help="output directory")
    args = parser.parse_args()

    if args.state_dict:
        import torch

        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        import torchvision

        model = getattr(torchvision.models, args.backbone)(
            weights="IMAGENET1K_V1"
        )
        sd = model.state_dict()

    path = os.path.join(args.out, f"{args.backbone}_imagenet.npz")
    save_backbone_npz(sd, path)
    print("wrote", path)


if __name__ == "__main__":
    main()
