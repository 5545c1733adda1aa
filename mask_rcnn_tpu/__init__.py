"""mask_rcnn_tpu — a TPU-native Mask R-CNN framework (JAX/XLA/Pallas/pjit).

Re-designed from scratch with the capability surface of
wkentaro/chainer-mask-rcnn (see SURVEY.md / DESIGN.md). The compute path is
functional JAX compiled by XLA for TPU; the reference's CUDA-in-Python kernels
are replaced by MXU-friendly formulations (RoIAlign as separable einsums) and
static-shape on-device ops (padded NMS, on-device target creation).
"""

__version__ = "0.1.0"

from mask_rcnn_tpu import ops  # noqa: F401
from mask_rcnn_tpu import models  # noqa: F401
from mask_rcnn_tpu import utils  # noqa: F401
