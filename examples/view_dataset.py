#!/usr/bin/env python
"""Interactive dataset viewer CLI (reference datasets/view_dataset.py flow):
n = next, p = previous, q = quit."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=("coco", "voc", "sbd"))
    parser.add_argument("--split", default="train")
    args = parser.parse_args()

    from mask_rcnn_tpu.data import (
        COCOInstanceSegmentationDataset,
        SBDInstanceSegmentationDataset,
        VOC2012InstanceSegmentationDataset,
    )
    from mask_rcnn_tpu.data.view_dataset import view_dataset

    ds = {
        "coco": COCOInstanceSegmentationDataset,
        "voc": VOC2012InstanceSegmentationDataset,
        "sbd": SBDInstanceSegmentationDataset,
    }[args.dataset](args.split)
    view_dataset(ds, class_names=ds.class_names)


if __name__ == "__main__":
    main()
