"""Rendering layer: NeRF volume renderer + YOLO ray renderer."""

from .nerf import NeRFRenderer
from .yolo import YoloRenderer, make_renderer

__all__ = ["NeRFRenderer", "YoloRenderer", "make_renderer"]
