#!/usr/bin/env python
"""Shared evaluation CLI (reference examples/evaluate_common.py parity):
rebuild model from params.yaml + snapshot, run visualizations on selected
indices, evaluate over the test set, dump eval_result.yaml."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def evaluate(test_data, class_names, dataset_kind, indices_vis=None,
             use_07_metric=False):
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir")
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--max-examples", type=int, default=None)
    parser.add_argument(
        "--strict-parity", action="store_true",
        help="bit-closest reference decode: per-class NMS considers every "
        "box above score 0.05 (nms_topk_per_class=0) and compute runs in "
        "float32 (docs/parity.md)",
    )
    parser.add_argument(
        "--pool-detections", action="store_true",
        help="multi-process eval: gather every rank's compact match "
        "records and score them globally (exact global mAP) instead of "
        "averaging per-rank reports",
    )
    args = parser.parse_args()

    import yaml

    from demo import build_model_from_log_dir
    from mask_rcnn_tpu.data import IndexingDataset
    from mask_rcnn_tpu.engine.evaluator import (
        InstanceSegmentationEvaluator,
        VisReport,
    )

    model, _ = build_model_from_log_dir(args.log_dir)
    # pad_to_bucket defaults True, so the dataset sweep compiles at most
    # two inference graphs (one per orientation bucket).
    if args.strict_parity:
        import dataclasses

        model.config = dataclasses.replace(
            model.config, nms_topk_per_class=0, compute_dtype="float32"
        )
        # bucket padding is the one documented deliberate decode deviation
        # (mean-level padding is only float-tolerance-equal to tight
        # padding, docs/parity.md) — strict mode removes it too.
        model.pad_to_bucket = False

    if indices_vis:
        indices_vis = [i for i in indices_vis if i < len(test_data)]
    if indices_vis:
        vis = VisReport(
            IndexingDataset(test_data, indices_vis), class_names,
            args.log_dir, indices=range(len(indices_vis)),
        )
        model.score_thresh = 0.7
        vis(model)
        model.score_thresh = 0.05

    evaluator = InstanceSegmentationEvaluator(
        test_data, class_names, kind=dataset_kind,
        batch_size=args.batch_size, use_07_metric=use_07_metric,
        max_examples=args.max_examples,
        pool_detections=args.pool_detections,
    )
    report = evaluator(model)
    out = osp.join(args.log_dir, "snapshot_model.npz.eval_result.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(
            {k: float(v) for k, v in report.items()}, f,
            default_flow_style=False,
        )
    for k, v in sorted(report.items()):
        print(f"{k}: {v:.4f}")
    print(f"-> {out}")
    return report
