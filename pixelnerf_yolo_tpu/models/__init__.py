"""Model layer: PixelNeRF field + encoders + factories.

Factory parity: /root/reference/src/model/__init__.py:4-11,
src/model/model_util.py:5-26.
"""

from .encoder import ImageEncoder, SpatialEncoder, make_encoder
from .pixelnerf import CondState, PixelNeRF, make_mlp
from .yolo_backbone import YOLOBackbone, YOLO_BACKBONE_LATENT


def make_model(conf, *args, **kwargs) -> PixelNeRF:
    model_type = conf.get_string("type", "pixelnerf")
    if model_type == "pixelnerf":
        return PixelNeRF(conf, *args, **kwargs)
    raise NotImplementedError("Unsupported model type", model_type)


__all__ = [
    "CondState",
    "ImageEncoder",
    "PixelNeRF",
    "SpatialEncoder",
    "YOLOBackbone",
    "YOLO_BACKBONE_LATENT",
    "make_encoder",
    "make_mlp",
    "make_model",
]
