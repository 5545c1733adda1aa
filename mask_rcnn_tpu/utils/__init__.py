"""Flat utils surface mirroring the reference package's
``chainer_mask_rcnn.utils`` re-exports (reference utils/__init__.py), so
migrating code can keep its import sites."""

from mask_rcnn_tpu.utils.checkpoint import load_params  # noqa: F401
from mask_rcnn_tpu.utils.checkpoint import save_params  # noqa: F401
from mask_rcnn_tpu.utils.masks import paste_masks  # noqa: F401

from mask_rcnn_tpu.utils._itertools import batch  # noqa: F401
from mask_rcnn_tpu.utils.logging import git_hash  # noqa: F401

from mask_rcnn_tpu.utils.voc_eval import eval_instseg_voc  # noqa: F401
from mask_rcnn_tpu.utils.cocoeval import eval_instseg_coco  # noqa: F401

from mask_rcnn_tpu.utils.geometry import get_bbox_overlap  # noqa: F401
from mask_rcnn_tpu.utils.geometry import get_mask_overlap  # noqa: F401
from mask_rcnn_tpu.utils.geometry import instance_boxes2label  # noqa: F401
from mask_rcnn_tpu.utils.geometry import label2instance_boxes  # noqa: F401
from mask_rcnn_tpu.utils.geometry import mask_to_bbox  # noqa: F401

from mask_rcnn_tpu.utils.visualizations import (  # noqa: F401
    draw_instance_bboxes,
    draw_instance_boxes,
    visualize_instance_segmentation,
)
