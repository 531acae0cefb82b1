"""Convert reference PyTorch checkpoints to this framework's variables.

A user of the reference trains with torch and saves
``checkpoints/<name>/pixel_nerf_latest`` as a PixelNeRFNet state_dict
(/root/reference/src/model/models.py:320-370).  This converter maps that
state_dict onto our flax parameter pytree so trained reference models can be
evaluated/served on TPU:

  python -m pixelnerf_yolo_tpu.train.convert \
      --torch_ckpt checkpoints/yolo/pixel_nerf_latest \
      --conf conf/exp/yolo.conf --out checkpoints/yolo_tpu/pixel_nerf_latest

Name mapping:
  mlp_{coarse,fine}.lin_in/lin_out.{weight,bias} -> lin_in/lin_out
  mlp_*.blocks.N.{fc_0,fc_1,shortcut}            -> block_N.{...}
  mlp_*.lin_z.N / scale_z.N                      -> lin_z_N / scale_z_N
  encoder.model.* (torchvision resnet)           -> encoder/model/* via
                                                    nn.resnet.port_torch_state_dict
Linear weights transpose (out,in)->(in,out); conv weights OIHW->HWIO.
Non-persistent buffers (poses/image_shape/focal/c/latent*) are skipped.
"""

from __future__ import annotations

import numpy as np

from ..nn.resnet import port_torch_state_dict


def _arr(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _convert_linear(sd: dict, prefix: str) -> dict:
    out = {"kernel": _arr(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _arr(sd[prefix + ".bias"])
    return out


def convert_resnetfc(sd: dict, prefix: str) -> dict:
    """Reference ResnetFC state_dict subtree -> flax ResnetFC params."""
    params: dict = {}
    if prefix + "lin_in.weight" in sd:
        params["lin_in"] = _convert_linear(sd, prefix + "lin_in")
    params["lin_out"] = _convert_linear(sd, prefix + "lin_out")
    i = 0
    while f"{prefix}blocks.{i}.fc_0.weight" in sd:
        block = {
            "fc_0": _convert_linear(sd, f"{prefix}blocks.{i}.fc_0"),
            "fc_1": _convert_linear(sd, f"{prefix}blocks.{i}.fc_1"),
        }
        if f"{prefix}blocks.{i}.shortcut.weight" in sd:
            block["shortcut"] = _convert_linear(
                sd, f"{prefix}blocks.{i}.shortcut"
            )
        params[f"block_{i}"] = block
        i += 1
    i = 0
    while f"{prefix}lin_z.{i}.weight" in sd:
        params[f"lin_z_{i}"] = _convert_linear(sd, f"{prefix}lin_z.{i}")
        i += 1
    i = 0
    while f"{prefix}scale_z.{i}.weight" in sd:
        params[f"scale_z_{i}"] = _convert_linear(sd, f"{prefix}scale_z.{i}")
        i += 1
    return params


def convert_reference_state_dict(sd: dict, backbone: str = "resnet34"):
    """Full PixelNeRFNet state_dict -> {"params", "batch_stats"} pytree.

    The encoder branch handles torchvision backbones; the reference's
    "custom" (external YOLOv7) backbone has no weight correspondence to our
    ELAN backbone and is left untouched (random init) with a warning.
    """
    variables = {"params": {}, "batch_stats": {}}

    enc_sd = {
        k[len("encoder.model.") :]: v
        for k, v in sd.items()
        if k.startswith("encoder.model.")
    }
    if "conv1.weight" in enc_sd:
        ported = port_torch_state_dict(enc_sd, backbone=backbone)
        variables["params"]["encoder"] = {"model": ported["params"]}
        variables["batch_stats"]["encoder"] = {"model": ported["batch_stats"]}
    else:
        import warnings

        warnings.warn(
            "checkpoint has no torchvision encoder weights (custom YOLOv7 "
            "backbone?) — encoder left at random init"
        )

    for name in ("mlp_coarse", "mlp_fine"):
        if f"{name}.lin_out.weight" in sd:
            variables["params"][name] = convert_resnetfc(sd, name + ".")

    if "global_encoder.model.conv1.weight" in sd:
        g_sd = {
            k[len("global_encoder.model.") :]: v
            for k, v in sd.items()
            if k.startswith("global_encoder.model.")
        }
        ported = port_torch_state_dict(g_sd, backbone=backbone)
        variables["params"]["global_encoder"] = {"model": ported["params"]}
        variables["batch_stats"]["global_encoder"] = {
            "model": ported["batch_stats"]
        }
        if "global_encoder.fc.weight" in sd:
            variables["params"]["global_encoder"]["fc"] = _convert_linear(
                sd, "global_encoder.fc"
            )
    return variables


def main():  # pragma: no cover - CLI glue
    import argparse

    import torch

    from . import checkpoints

    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--backbone", default="resnet34")
    args = parser.parse_args()

    sd = torch.load(args.torch_ckpt, map_location="cpu")
    variables = convert_reference_state_dict(sd, backbone=args.backbone)
    checkpoints.save_pytree(args.out, variables)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
