"""Port LPIPS-vgg weights (VGG16 trunk + linear heads) to lpips_vgg.npz.

Run wherever `pip install lpips` works (torch used offline only):

  python scripts/port_lpips.py --out weights/

The npz stores torchvision VGG16 `features.*` conv tensors and the LPIPS
`lin*.model.1.weight` heads under those names; nn/lpips.py loads it.
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
)

import numpy as np  # noqa: E402

from pixelnerf_yolo_tpu.nn.lpips import VGG16_SLICES  # noqa: E402


def extract_lpips_arrays(model) -> dict:
    """lpips.LPIPS(net="vgg") module -> the flat npz array dict
    (torchvision `features.*` conv tensors + `lin*.model.1.weight` heads).
    Factored out of main() so the key map is golden-pinned hermetically
    (tests/test_porter_goldens.py) against a shape-faithful stub."""
    arrays = {}
    vgg_features = model.net.slice1, model.net.slice2, model.net.slice3, \
        model.net.slice4, model.net.slice5
    # torch Sequential slices preserve the original torchvision indices
    for slice_mod in vgg_features:
        for idx, layer in slice_mod._modules.items():
            if hasattr(layer, "weight") and layer.weight is not None:
                arrays[f"features.{idx}.weight"] = np.asarray(
                    layer.weight.detach().cpu().numpy()
                )
                arrays[f"features.{idx}.bias"] = np.asarray(
                    layer.bias.detach().cpu().numpy()
                )
    for i in range(5):
        lin = getattr(model, f"lin{i}")
        arrays[f"lin{i}.model.1.weight"] = np.asarray(
            lin.model[1].weight.detach().cpu().numpy()
        )

    expect = {i for convs in VGG16_SLICES for i in convs}
    got = {
        int(k.split(".")[1]) for k in arrays if k.startswith("features.")
    }
    assert expect == got, (expect, got)
    return arrays


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights")
    args = parser.parse_args()

    import lpips as lpips_pkg

    arrays = extract_lpips_arrays(lpips_pkg.LPIPS(net="vgg"))

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "lpips_vgg.npz")
    np.savez(path, **arrays)
    print("wrote", path)


if __name__ == "__main__":
    main()
