#!/usr/bin/env python
"""Print COCO download instructions (reference
examples/coco/download_datasets.py; no egress in this environment)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))


def main():
    from mask_rcnn_tpu.data import COCOInstanceSegmentationDataset

    try:
        COCOInstanceSegmentationDataset("train").download()
    except FileNotFoundError:
        for k, (url, md5) in (
            COCOInstanceSegmentationDataset.DOWNLOAD_URLS.items()
        ):
            print(f"{k}: {url}" + (f" (md5 {md5})" if md5 else ""))
        print("Place under ~/data/datasets/COCO/")


if __name__ == "__main__":
    main()
