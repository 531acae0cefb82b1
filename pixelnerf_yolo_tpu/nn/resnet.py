"""ResNet-18/34 trunk in flax.linen with multi-scale feature taps.

Replaces the torchvision backbone used by the reference SpatialEncoder
(/root/reference/src/model/encoder.py:60-67,139-157).  Structure matches
torchvision exactly (7x7 stem, BasicBlocks, per-stage strides) so pretrained
torch checkpoints can be ported 1:1 via :func:`port_torch_state_dict`.

TPU notes: NHWC layout throughout (XLA's native conv layout on TPU); convs
are explicit-padded like torch; BatchNorm carries running stats in the
``batch_stats`` collection with a ``train`` flag.
"""

from __future__ import annotations

from .precision import matmul_precision
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

STAGE_SIZES = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3]}
# channel sizes of [stem, layer1..layer4] outputs
STAGE_WIDTHS = [64, 64, 128, 256, 512]


def make_norm(norm_type: str, train: bool, dtype: str = "float32"):
    """Norm layer factory with the reference's get_norm_layer semantics
    (/root/reference/src/util/util.py:358-379)."""
    if norm_type == "batch":
        return lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.dtype(dtype), param_dtype=jnp.float32,
        )
    if norm_type == "instance":
        # affine=False, no running stats
        return lambda: nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False
        )
    if norm_type == "group":
        return lambda: nn.GroupNorm(num_groups=32)
    if norm_type == "none":
        return lambda: (lambda x: x)
    raise NotImplementedError(f"norm layer [{norm_type}] is not found")


def conv3x3(filters: int, stride: int = 1, name: str | None = None,
            dtype: str = "float32"):
    return nn.Conv(
        filters,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        use_bias=False,
        precision=matmul_precision(dtype),
        dtype=jnp.dtype(dtype),
        param_dtype=jnp.float32,
        name=name,
    )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv-bn-relu-conv-bn + (projected) identity."""

    filters: int
    stride: int = 1
    norm_type: str = "batch"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.norm_type, train, self.dtype)
        identity = x
        out = conv3x3(self.filters, self.stride, name="conv1",
                      dtype=self.dtype)(x)
        out = norm()(out)
        out = nn.relu(out)
        out = conv3x3(self.filters, 1, name="conv2", dtype=self.dtype)(out)
        out = norm()(out)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(
                self.filters,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                precision=matmul_precision(self.dtype),
                dtype=jnp.dtype(self.dtype),
                param_dtype=jnp.float32,
                name="downsample_conv",
            )(x)
            identity = norm()(identity)
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """ResNet trunk emitting per-stage feature maps.

    __call__ returns a list of NHWC maps:
      [stem(H/2), layer1(H/2 or H/4), layer2(/2), layer3(/2), layer4(/2)]
    truncated at ``num_layers`` entries — the SpatialEncoder's multi-scale
    taps (encoder.py:139-157).
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    norm_type: str = "batch"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        stages: Sequence[int] = STAGE_SIZES[self.backbone]
        norm = make_norm(self.norm_type, train, self.dtype)

        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            precision=matmul_precision(self.dtype),
            dtype=jnp.dtype(self.dtype),
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = norm()(x)
        x = nn.relu(x)

        latents = [x]
        if self.num_layers > 1:
            if self.use_first_pool:
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
                )
            for i in range(stages[0]):
                x = BasicBlock(64, 1, self.norm_type, self.dtype,
                               name=f"layer1_{i}")(x, train)
            latents.append(x)
        for stage_idx, (filters, n_blocks) in enumerate(
            zip([128, 256, 512], stages[1:]), start=2
        ):
            if self.num_layers > stage_idx:
                for i in range(n_blocks):
                    x = BasicBlock(
                        filters,
                        2 if i == 0 else 1,
                        self.norm_type,
                        self.dtype,
                        name=f"layer{stage_idx}_{i}",
                    )(x, train)
                latents.append(x)
        return latents


class ResNetClassifierTrunk(nn.Module):
    """Full trunk -> global average pooled vector (for the global
    ImageEncoder, encoder.py:218-242)."""

    backbone: str = "resnet34"
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ResNetFeatures(
            self.backbone, num_layers=5, use_first_pool=True,
            norm_type=self.norm_type, name="trunk",
        )(x, train)
        return jnp.mean(feats[-1], axis=(1, 2))  # (B, 512)


# ---------------------------------------------------------------------------
# torchvision checkpoint porting
# ---------------------------------------------------------------------------


def port_torch_state_dict(state_dict: dict, backbone: str = "resnet34"):
    """Map a torchvision resnet state_dict (tensors or numpy) onto the
    params/batch_stats pytrees of :class:`ResNetFeatures`.

    Returns (params, batch_stats) dicts.  Conv weights are transposed
    OIHW -> HWIO.  Works with any checkpoint following torchvision naming
    (conv1, bn1, layerN.M.convK/bnK/downsample.{0,1}).
    """
    import numpy as np

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def conv_w(key):
        return arr(state_dict[key]).transpose(2, 3, 1, 0)  # OIHW->HWIO

    params: dict = {}
    stats: dict = {}

    def put_bn(dst_params, dst_stats, prefix):
        dst_params["scale"] = arr(state_dict[prefix + ".weight"])
        dst_params["bias"] = arr(state_dict[prefix + ".bias"])
        dst_stats["mean"] = arr(state_dict[prefix + ".running_mean"])
        dst_stats["var"] = arr(state_dict[prefix + ".running_var"])

    params["conv1"] = {"kernel": conv_w("conv1.weight")}
    params["BatchNorm_0"] = {}
    stats["BatchNorm_0"] = {}
    put_bn(params["BatchNorm_0"], stats["BatchNorm_0"], "bn1")

    stages = STAGE_SIZES[backbone]
    for stage_idx, n_blocks in enumerate(stages, start=1):
        for i in range(n_blocks):
            tname = f"layer{stage_idx}.{i}"
            if tname + ".conv1.weight" not in state_dict:
                # partial checkpoint (truncated backbone) — stop at what's there
                continue
            fname = f"layer{stage_idx}_{i}"
            block_p: dict = {
                "conv1": {"kernel": conv_w(tname + ".conv1.weight")},
                "conv2": {"kernel": conv_w(tname + ".conv2.weight")},
                "BatchNorm_0": {},
                "BatchNorm_1": {},
            }
            block_s: dict = {"BatchNorm_0": {}, "BatchNorm_1": {}}
            put_bn(block_p["BatchNorm_0"], block_s["BatchNorm_0"], tname + ".bn1")
            put_bn(block_p["BatchNorm_1"], block_s["BatchNorm_1"], tname + ".bn2")
            if tname + ".downsample.0.weight" in state_dict:
                block_p["downsample_conv"] = {
                    "kernel": conv_w(tname + ".downsample.0.weight")
                }
                block_p["BatchNorm_2"] = {}
                block_s["BatchNorm_2"] = {}
                put_bn(
                    block_p["BatchNorm_2"],
                    block_s["BatchNorm_2"],
                    tname + ".downsample.1",
                )
            params[fname] = block_p
            stats[fname] = block_s

    return {"params": params, "batch_stats": stats}
