#!/usr/bin/env python
"""SBD val evaluation (reference examples/voc/evaluate.py parity)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))

import evaluate_common  # noqa: E402


def main():
    import os

    from mask_rcnn_tpu.data import SBDInstanceSegmentationDataset

    root = os.environ.get(
        "SBD_ROOT", "~/data/datasets/VOC/benchmark_RELEASE/dataset"
    )
    test_data = SBDInstanceSegmentationDataset("val", root=root)
    evaluate_common.evaluate(
        test_data,
        class_names=test_data.class_names,
        dataset_kind="voc",
        indices_vis=list(range(9)),
        use_07_metric=True,
    )


if __name__ == "__main__":
    main()
