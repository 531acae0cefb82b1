"""Pretrained ImageNet backbone initialization.

The reference builds its spatial encoder from torchvision's ImageNet
resnet18/34 (`/root/reference/src/model/encoder.py:60-66`), so training
from scratch does not match its convergence.  This module loads a ported
checkpoint when ``encoder.pretrained = True``:

  1. Run ``python scripts/port_torchvision.py --backbone resnet34`` once on
     a machine with torchvision (torch used offline only).  It writes
     ``<backbone>_imagenet.npz`` — the torchvision state_dict as plain
     numpy arrays under torchvision names.
  2. Place the npz in ``$PNY_PRETRAINED_DIR``, ``<repo>/weights/`` or
     ``~/.cache/pixelnerf_yolo_tpu/`` — :func:`load_pretrained_backbone`
     ports it onto the flax pytree via nn.resnet.port_torch_state_dict.

The custom (ELAN) YOLO backbone has no torchvision counterpart and always
random-inits (documented deviation; the reference loads external yolov7.pt,
custom_encoder.py:17-20).
"""

from __future__ import annotations

import os

import numpy as np

from .resnet import port_torch_state_dict

_FILENAME = "{backbone}_imagenet.npz"


def search_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("PNY_PRETRAINED_DIR")
    if env:
        dirs.append(env)
    repo_root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )
    dirs.append(os.path.join(repo_root, "weights"))
    dirs.append(
        os.path.join(os.path.expanduser("~"), ".cache", "pixelnerf_yolo_tpu")
    )
    return dirs


def pretrained_path(backbone: str) -> str | None:
    """First existing ``<backbone>_imagenet.npz`` on the search path."""
    name = _FILENAME.format(backbone=backbone)
    for d in search_dirs():
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def save_backbone_npz(state_dict: dict, path: str) -> None:
    """Write a torchvision-style state_dict (tensors or arrays) as npz."""
    arrays = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        v = np.asarray(v)
        if v.dtype == np.int64:  # num_batches_tracked — not needed
            continue
        arrays[k] = v
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_pretrained_backbone(backbone: str):
    """(ported_variables, path) for ``backbone``, or raise FileNotFoundError
    with porting instructions."""
    path = pretrained_path(backbone)
    if path is None:
        raise FileNotFoundError(
            f"No pretrained weights for '{backbone}'. The reference "
            "initializes its encoder from torchvision ImageNet weights "
            "(/root/reference/src/model/encoder.py:60-66); port them once "
            "with `python scripts/port_torchvision.py --backbone "
            f"{backbone}` (torchvision needed there only) and place "
            f"{_FILENAME.format(backbone=backbone)} in one of: "
            + ", ".join(search_dirs())
            + ". Or set encoder.pretrained=False to train from "
            "random init without the warning."
        )
    with np.load(path) as z:
        sd = {k: z[k] for k in z.files}
    return port_torch_state_dict(sd, backbone=backbone), path


def graft(dst: dict, src: dict, _prefix: str = "") -> tuple[dict, int]:
    """Copy src leaves onto the dst structure where keys exist and shapes
    match; extra src keys (full-trunk checkpoint vs truncated encoder) are
    ignored.  Returns (new_tree, n_leaves_copied)."""
    out = {}
    n = 0
    for k, v in dst.items():
        if isinstance(v, dict):
            sub, m = graft(v, src.get(k, {}), _prefix + k + "/")
            out[k] = sub
            n += m
        elif k in src:
            s = np.asarray(src[k])
            if tuple(s.shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"pretrained shape mismatch at {_prefix + k}: "
                    f"{s.shape} vs {np.shape(v)}"
                )
            out[k] = s.astype(np.asarray(v).dtype)
            n += 1
        else:
            out[k] = v
    return out, n
