#!/usr/bin/env python
"""Import Detectron e2e_mask_rcnn_R-50-C4_1x weights into this framework
(reference examples/coco/convert_caffe2_to_chainer.py parity).

No egress in this environment, so the pkl must already be on disk (the
reference downloads it from
https://dl.fbaipublicfiles.com/detectron/35858828/.../model_final.pkl).
Writes logs/R-50-C4_x1_caffe2/snapshot_model.npz + params.yaml.
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pkl_path", help="Detectron model_final.pkl")
    parser.add_argument(
        "--out", default="logs/R-50-C4_x1_caffe2",
    )
    args = parser.parse_args()

    from mask_rcnn_tpu.utils.checkpoint import flatten_params, save_params
    from mask_rcnn_tpu.utils.detectron_import import (
        DETECTRON_MEAN,
        import_detectron_pkl,
    )
    from mask_rcnn_tpu.utils.logging import dump_params

    params = import_detectron_pkl(args.pkl_path, n_fg_class=80)

    flat = flatten_params(params)
    vals = np.concatenate([v.ravel() for v in flat.values()])
    print(
        f"{len(flat)} tensors, {vals.size} params, "
        f"min={vals.min():.4f} mean={vals.mean():.4f} max={vals.max():.4f}"
    )

    os.makedirs(args.out, exist_ok=True)
    save_params(osp.join(args.out, "snapshot_model.npz"), params)
    dump_params(
        args.out,
        {
            "dataset": "coco",
            "model": "resnet50",
            "model_config": dict(
                n_fg_class=80,
                n_layers=50,
                min_size=800,
                max_size=1333,
                anchor_scales=[2, 4, 8, 16, 32],
                roi_size=14,
                mean=list(DETECTRON_MEAN),
                pooling="align",
            ),
            "pretrained_from": args.pkl_path,
        },
    )
    print(f"-> {args.out}/snapshot_model.npz")


if __name__ == "__main__":
    main()
