"""Checkpoint persistence with the reference's file layout.

Parity: /root/reference/src/model/models.py:320-370 and
train/trainlib/trainer.py:61-107,242-270:
  checkpoints/<name>/pixel_nerf_latest      model weights (latest)
  checkpoints/<name>/pixel_nerf_init        optional warm-start weights
  checkpoints/<name>/pixel_nerf_backup<N>   rolling pre-save copies
  checkpoints/<name>/pixel_nerf_backup_best best-F1 copy (epochNum="_best")
  checkpoints/<name>/_optim                 optimizer state
  checkpoints/<name>/_lrsched               lr schedule state
  checkpoints/<name>/_iter                  iteration counter
  checkpoints/<name>/_renderer              renderer schedule state

Serialization: flax msgpack (works for any pytree of arrays); tiny states
(_iter, _lrsched, _renderer) are JSON for human inspection.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import warnings
from shutil import copyfile

import flax.serialization
import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    # atomic: a run killed mid-save (supervisor timeout, preemption) must
    # never leave a truncated checkpoint for the next resume
    tree = jax.tree.map(np.asarray, tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_pytree(path: str, template):
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def save_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def load_json(path: str):
    with open(path, "r") as f:
        return json.load(f)


def ckpt_dir(args) -> str:
    return osp.join(args.checkpoints_path, args.name)


def has_weights(args) -> bool:
    """Whether load_weights(args, ...) would find a checkpoint to load
    (used to skip pretrained-encoder grafting that would be overwritten)."""
    name = "pixel_nerf_latest" if args.resume else "pixel_nerf_init"
    return osp.exists(osp.join(ckpt_dir(args), name))


def load_weights(args, variables, opt_init: bool = False):
    """Load model variables, reference-style.  models.py:320-349.

    :return possibly-updated variables (template shapes must match)
    """
    if opt_init and not args.resume:
        return variables
    ckpt_name = (
        "pixel_nerf_init" if opt_init or not args.resume else "pixel_nerf_latest"
    )
    model_path = osp.join(ckpt_dir(args), ckpt_name)
    if os.path.exists(model_path):
        print("Load", model_path)
        return load_pytree(model_path, variables)
    if not opt_init:
        warnings.warn(
            f"WARNING: {model_path} does not exist, not loaded!! "
            "Model will be re-initialized.\n"
            "If you are trying to load a pretrained model, STOP since it's "
            "not in the right place. If training, unless you are starting a "
            "new experiment, please remember to pass --resume."
        )
    return variables


def save_weights(args, variables, opt_init: bool = False, epochNum: str = ""):
    """Save model variables with rolling backup.  models.py:351-370."""
    ckpt_name = "pixel_nerf_init" if opt_init else "pixel_nerf_latest"
    backup_name = (
        "pixel_nerf_init_backup" if opt_init else "pixel_nerf_backup" + epochNum
    )
    d = ckpt_dir(args)
    os.makedirs(d, exist_ok=True)
    ckpt_path = osp.join(d, ckpt_name)
    if osp.exists(ckpt_path):
        copyfile(ckpt_path, osp.join(d, backup_name))
    if epochNum == "":
        save_pytree(ckpt_path, variables)
