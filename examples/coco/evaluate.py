#!/usr/bin/env python
"""COCO minival evaluation (reference examples/coco/evaluate.py parity)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))

import evaluate_common  # noqa: E402


def main():
    import os

    from mask_rcnn_tpu.data import COCOInstanceSegmentationDataset

    test_data = COCOInstanceSegmentationDataset(
        "minival", root=os.environ.get("COCO_ROOT", "~/data/datasets/COCO"),
        use_crowd=True, return_crowd=True, return_area=True,
    )
    evaluate_common.evaluate(
        test_data,
        class_names=test_data.class_names,
        dataset_kind="coco",
        indices_vis=list(range(9)),
    )


if __name__ == "__main__":
    main()
