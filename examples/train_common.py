#!/usr/bin/env python
"""Shared training CLI (reference examples/train_common.py parity).

Same flag surface: --model {resnet50,resnet101}, --pooling-func
{pooling,align,resize}, --roi-size, --initializer, --max-epoch,
--batch-size-per-gpu (per-device here), --lr, --seed, --multi-node
(jax.distributed), plus TPU-native --compute-dtype.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import random
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args(dataset_defaults: dict):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "--model", choices=("resnet50", "resnet101"), default="resnet50"
    )
    parser.add_argument(
        "--pooling-func", choices=("pooling", "align", "resize"),
        default="align",
    )
    parser.add_argument("--roi-size", type=int, default=14)
    parser.add_argument(
        "--initializer", choices=("normal", "he_normal"),
        default="normal",
        help="mask-branch initializer (reference train_common.py:146-156)",
    )
    parser.add_argument(
        "--pretrained-model", default=None,
        help="'auto' / 'auto:<imagenet npz>' / '<detectron>.pkl' / "
        "snapshot npz (reference default is 'auto'; needs the ImageNet "
        "npz on disk in this egress-less environment)",
    )
    parser.add_argument(
        "--max-epoch", type=float,
        default=dataset_defaults.get("max_epoch", (180e3 * 8) / 118287),
    )
    parser.add_argument("--batch-size-per-gpu", type=int, default=1)
    parser.add_argument("--lr", type=float, default=None,
                        help="default: 0.00125 * global batch size")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-boxes", type=int, default=64)
    parser.add_argument("--logs-dir", default="logs")
    parser.add_argument("--eval-interval-epochs", type=float, default=1.0)
    parser.add_argument("--max-eval-examples", type=int, default=None)
    parser.add_argument(
        "--compute-dtype", choices=("float32", "bfloat16"),
        default="float32",
    )
    parser.add_argument(
        "--min-size", type=int, default=None,
        help="override the dataset's resize min side (default: the "
        "dataset-specific reference value, e.g. 800 for COCO)",
    )
    parser.add_argument(
        "--max-size", type=int, default=None,
        help="override the dataset's resize max side (default: the "
        "dataset-specific reference value, e.g. 1333 for COCO)",
    )
    parser.add_argument(
        "--multi-node", action="store_true",
        help="initialize jax.distributed for multi-host training",
    )
    parser.add_argument(
        "--pool-detections", action="store_true",
        help="multi-process eval: gather every rank's compact match "
        "records and score them globally (exact global mAP, identical on "
        "every rank) instead of averaging per-rank reports (the reference "
        "chainermn contract, examples/train_common.py:271-272)",
    )
    parser.add_argument(
        "--resume", default=None,
        help="train_state checkpoint dir to resume from",
    )
    parser.add_argument(
        "--checkpoint-interval", type=int, default=None,
        help="save full train_state every N steps (enables --resume)",
    )
    parser.add_argument(
        "--clip-norm", type=float, default=None,
        help="global gradient-norm clip (off = reference parity)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize backbone stages (larger per-chip batches)",
    )
    parser.add_argument(
        "--input-uint8", action="store_true",
        help="ship uint8 images and mean-subtract on device (4x less "
        "host->device traffic; resize rounds to uint8 — off = strict "
        "reference parity)",
    )
    return parser.parse_args()


def train(args, train_data, test_data, class_names, dataset_kind,
          min_size, max_size, anchor_scales):
    if args.multi_node:
        import jax

        jax.distributed.initialize()

    import jax

    from mask_rcnn_tpu.data import MaskRCNNTransform, TrainLoader
    from mask_rcnn_tpu.engine.evaluator import (
        InstanceSegmentationEvaluator,
        VisReport,
    )
    from mask_rcnn_tpu.engine.loop import train as run_train
    from mask_rcnn_tpu.models import MaskRCNNConfig
    from mask_rcnn_tpu.utils.logging import timestamp_dir

    random.seed(args.seed)
    np.random.seed(args.seed)

    if args.min_size is not None:
        min_size = args.min_size
    if args.max_size is not None:
        max_size = args.max_size
    cfg = MaskRCNNConfig(
        n_fg_class=len(class_names),
        n_layers=50 if args.model == "resnet50" else 101,
        min_size=min_size,
        max_size=max_size,
        anchor_scales=tuple(float(s) for s in anchor_scales),
        roi_size=args.roi_size,
        pooling=args.pooling_func,
        compute_dtype=args.compute_dtype,
        remat=args.remat,
    )
    transform = MaskRCNNTransform(
        min_size, max_size, cfg.mean, train=True,
        rng=np.random.RandomState(args.seed),
        keep_uint8=getattr(args, "input_uint8", False),
    )
    loader = TrainLoader(
        train_data,
        transform,
        # per-host batch: this process's devices only (the loop builds a
        # global mesh across processes; each host feeds its local shard)
        batch_size=args.batch_size_per_gpu * len(jax.local_devices()),
        max_boxes=args.max_boxes,
        min_size=min_size,
        max_size=max_size,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    evaluator = InstanceSegmentationEvaluator(
        test_data, class_names, kind=dataset_kind,
        # reference trains VOC with the 11-point 2007 AP
        # (train_common.py:253-257)
        use_07_metric=(dataset_kind == "voc"),
        max_examples=args.max_eval_examples,
        pool_detections=args.pool_detections,
    )
    out_dir = timestamp_dir(args.logs_dir)
    vis = VisReport(test_data, class_names, out_dir)
    print(f"logs -> {out_dir}")
    result = run_train(
        cfg,
        loader,
        out_dir,
        max_epoch=args.max_epoch,
        batch_size_per_device=args.batch_size_per_gpu,
        evaluator=evaluator,
        vis_report=vis,
        eval_interval_epochs=args.eval_interval_epochs,
        seed=args.seed,
        lr=args.lr,
        resume_from=args.resume,
        checkpoint_interval_steps=args.checkpoint_interval,
        clip_norm=args.clip_norm,
        initializer=args.initializer,
        pretrained_model=args.pretrained_model,
        extra_params={
            "dataset": dataset_kind,
            "model": args.model,
            "pooling_func": args.pooling_func,
            "roi_size": args.roi_size,
            "initializer": args.initializer,
            "pretrained_model": args.pretrained_model,
        },
    )
    print(result)
    return result
