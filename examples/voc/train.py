#!/usr/bin/env python
"""VOC/SBD training entry (reference examples/voc/train.py parity):
SBD train/val, min 600 / max 1000, anchor scales (4, 8, 16, 32)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))

import train_common  # noqa: E402


def main():
    import os

    from mask_rcnn_tpu.data import SBDInstanceSegmentationDataset

    args = train_common.parse_args(dataset_defaults=dict(max_epoch=19.0))
    root = os.environ.get(
        "SBD_ROOT", "~/data/datasets/VOC/benchmark_RELEASE/dataset"
    )
    train_data = SBDInstanceSegmentationDataset("train", root=root)
    test_data = SBDInstanceSegmentationDataset("val", root=root)
    train_common.train(
        args,
        train_data,
        test_data,
        class_names=train_data.class_names,
        dataset_kind="voc",
        min_size=600,
        max_size=1000,
        anchor_scales=(4, 8, 16, 32),
    )


if __name__ == "__main__":
    main()
