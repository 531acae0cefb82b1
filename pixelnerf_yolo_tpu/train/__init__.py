"""Training layer: base loop, NeRF + YOLO trainers, checkpointing."""

from . import checkpoints
from .nerf_trainer import PixelNeRFTrainer
from .trainer import Trainer
from .yolo_trainer import YOLOTrainer, make_trainer

__all__ = [
    "PixelNeRFTrainer",
    "Trainer",
    "YOLOTrainer",
    "checkpoints",
    "make_trainer",
]
