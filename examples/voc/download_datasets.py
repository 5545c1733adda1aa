#!/usr/bin/env python
"""Print VOC/SBD download sources and md5-verify any archives already on
disk (reference examples/voc/download_datasets.py; no egress here)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    from mask_rcnn_tpu.data.voc import (
        SBDInstanceSegmentationDataset,
        VOC2012InstanceSegmentationDataset,
    )

    VOC2012InstanceSegmentationDataset.download()
    SBDInstanceSegmentationDataset.download()
    print("Place under ~/data/datasets/VOC/")


if __name__ == "__main__":
    main()
