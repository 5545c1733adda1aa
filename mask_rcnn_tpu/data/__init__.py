from mask_rcnn_tpu.data.coco import COCOInstanceSegmentationDataset  # noqa: F401
from mask_rcnn_tpu.data.concat import ConcatDataset  # noqa: F401
from mask_rcnn_tpu.data.loader import TrainLoader, pad_batch  # noqa: F401
from mask_rcnn_tpu.data.transforms import MaskRCNNTransform  # noqa: F401
from mask_rcnn_tpu.data.voc import (  # noqa: F401
    IndexingDataset,
    SBDInstanceSegmentationDataset,
    VOC2012InstanceSegmentationDataset,
    VOCLikeDataset,
)
from mask_rcnn_tpu.data.legacy import MaskRcnnDataset  # noqa: F401
