"""Native PointRend instance segmentation (preproc's mask source).

The reference's ``scripts/preproc.py`` removes backgrounds from real
photos with detectron2's PointRend R50-FPN COCO model, vendoring the
PointRend subset (/root/reference/scripts/preproc.py:19-29 +
scripts/detectron2/projects/PointRend/, ~980 LoC) and downloading the
rest of detectron2 plus pretrained weights at run time.  This package is
the TPU-native equivalent: the full inference graph — ResNet-50-FrozenBN
+ FPN backbone, RPN, ROI box head, PointRend coarse-mask + point-head
subdivision — as pure JAX functions over a params pytree, with a weight
port from the published detectron2 checkpoint
(``scripts/port_detectron2.py``) following the same pipeline as the
LPIPS and torchvision backbone ports (nn/pretrained.py).

Offline tooling: runs once per photo; clarity over throughput.
"""

from .predictor import (  # noqa: F401
    PointRendPredictor,
    load_pointrend_params,
    pointrend_npz_path,
)
from .port import port_detectron2_state_dict  # noqa: F401
