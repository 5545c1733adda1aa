#!/usr/bin/env python
"""Custom-dataset evaluation (reference examples/custom_dataset/evaluate.py
parity)."""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))

import evaluate_common  # noqa: E402


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--dataset-dir", required=True)
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
    evaluate_common.evaluate(
        dataset, class_names=class_names, dataset_kind="voc",
        indices_vis=list(range(min(9, len(dataset)))),
        # match the training-time validation metric (train_common.py sets
        # use_07_metric for dataset_kind == 'voc'), so best_map in the log
        # and this eval_result are comparable numbers
        use_07_metric=True,
    )


if __name__ == "__main__":
    main()
