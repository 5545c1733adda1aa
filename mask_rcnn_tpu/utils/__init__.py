from mask_rcnn_tpu.utils.checkpoint import load_params  # noqa: F401
from mask_rcnn_tpu.utils.checkpoint import save_params  # noqa: F401
from mask_rcnn_tpu.utils.masks import paste_masks  # noqa: F401
