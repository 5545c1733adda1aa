#!/usr/bin/env python
"""Bring-your-own-dataset training (reference examples/custom_dataset/
train.py parity): a directory of images + labelme-exported npy class/instance
label images, repeated to form a usable epoch."""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))

import train_common  # noqa: E402


class RepeatedDataset:
    def __init__(self, dataset, repeats):
        self.dataset = dataset
        self.repeats = repeats

    def __len__(self):
        return len(self.dataset) * self.repeats

    def __getitem__(self, i):
        return self.dataset[i % len(self.dataset)]


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--dataset-dir", required=True,
                        help="dir with img/*.jpg cls/*.npy ins/*.npy + "
                             "class_names.txt")
    known, rest = parser.parse_known_args()
    sys.argv = [sys.argv[0]] + rest

    from mask_rcnn_tpu.data import VOCLikeDataset

    root = known.dataset_dir
    imgs = sorted(glob.glob(osp.join(root, "img", "*")))
    cls = sorted(glob.glob(osp.join(root, "cls", "*.npy")))
    ins = sorted(glob.glob(osp.join(root, "ins", "*.npy")))
    with open(osp.join(root, "class_names.txt")) as f:
        class_names = [line.strip() for line in f if line.strip()]

    dataset = VOCLikeDataset(imgs, cls, ins, class_names)
    train_data = RepeatedDataset(dataset, 20)
    args = train_common.parse_args(dataset_defaults=dict(max_epoch=2.0))
    train_common.train(
        args,
        train_data,
        dataset,
        class_names=class_names,
        dataset_kind="voc",
        min_size=600,
        max_size=1000,
        anchor_scales=(4, 8, 16, 32),
    )


if __name__ == "__main__":
    main()
