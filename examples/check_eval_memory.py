#!/usr/bin/env python
"""COCO-scale evaluation memory check.

Runs the streaming ``InstanceSegmentationEvaluator`` over a synthetic
dataset at COCO-minival scale (default 5000 images, ~1 MP, up to 100
detections each) with a fake predict, and reports peak RSS growth. The
pre-streaming evaluator held every full-resolution mask in RAM (~100+ GB at
this scale); the streaming path must stay within a few GB.

Usage: ./examples/check_eval_memory.py [--images 5000] [--dets 100]

Recorded result (2026-08-17, 1-core host): 5000 images x 100 dets at
800x1216 -> peak RSS 0.96 GB (vs ~486 GB of raw mask bytes), 2173 s.
With the native ingestion kernel (2026-08-18,
native/cocoeval.cpp::boxlocal_inter): same sweep in 855 s (2.5x), peak
RSS 1.17 GB.
"""

from __future__ import annotations

import argparse
import os.path as osp
import resource
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


class SyntheticCOCOScaleDataset:
    """~1 MP images with a handful of rectangular gt instances."""

    def __init__(self, n: int, h: int = 800, w: int = 1216, n_gt: int = 8):
        self.n, self.h, self.w, self.n_gt = n, h, w, n_gt

    def __len__(self):
        return self.n

    def _boxes(self, i):
        rng = np.random.RandomState(i)
        boxes = []
        for _ in range(self.n_gt):
            y = rng.randint(0, self.h - 120)
            x = rng.randint(0, self.w - 120)
            boxes.append((y, x, y + rng.randint(40, 120),
                          x + rng.randint(40, 120)))
        return boxes, rng

    def __getitem__(self, i):
        boxes, rng = self._boxes(i)
        img = np.full((self.h, self.w, 3), 127, np.uint8)
        masks = np.zeros((self.n_gt, self.h, self.w), np.int32)
        for k, (y1, x1, y2, x2) in enumerate(boxes):
            masks[k, y1:y2, x1:x2] = 1
        bboxes = np.asarray(boxes, np.float32)
        labels = rng.randint(0, 80, self.n_gt).astype(np.int32)
        crowds = np.zeros(self.n_gt, np.int32)
        areas = masks.sum(axis=(1, 2)).astype(np.float32)
        # stash for the fake model (keyed by image checksum is overkill;
        # the model re-derives from the image index channel below)
        # index encoded across three channel-0 pixels so every image (not
        # just the first 251) round-trips exactly through the fake model,
        # which reads the CHW-transposed image at [0, 0, 0:3]
        img[0, 0, 0] = i % 251
        img[0, 1, 0] = (i // 251) % 251
        img[0, 2, 0] = i // (251 * 251)
        return img, bboxes, labels, masks, crowds, areas


class FakePredictModel:
    """Up to ``n_dets`` detections per image: jittered gt + noise."""

    def __init__(self, dataset, n_dets: int):
        self.dataset = dataset
        self.n_dets = n_dets

    def predict(self, imgs):
        bboxes, masks, labels, scores = [], [], [], []
        for img in imgs:
            h, w = img.shape[1:]
            i = (int(img[0, 0, 0]) + 251 * int(img[0, 0, 1])
                 + 251 * 251 * int(img[0, 0, 2]))
            boxes, rng = self.dataset._boxes(i)
            ms = np.zeros((self.n_dets, h, w), bool)
            ls = rng.randint(0, 80, self.n_dets).astype(np.int32)
            ss = rng.rand(self.n_dets).astype(np.float32)
            for k in range(self.n_dets):
                if k < len(boxes):
                    y1, x1, y2, x2 = boxes[k]
                    dy, dx = rng.randint(-6, 7, 2)
                    ms[k, max(y1 + dy, 0):y2 + dy, max(x1 + dx, 0):x2 + dx] = True
                else:
                    y = rng.randint(0, h - 60)
                    x = rng.randint(0, w - 60)
                    ms[k, y:y + 50, x:x + 50] = True
            bboxes.append(np.zeros((self.n_dets, 4), np.float32))
            masks.append(ms)
            labels.append(ls)
            scores.append(ss)
        return bboxes, masks, labels, scores


class FakeRawPredictModel(FakePredictModel):
    """Same detections as boxes + (14, 14) roi probabilities — the form the
    production api layer hands the evaluator (``predict_collect_raw``), so
    the sweep scores via ``add_boxlocal`` without any full-image paste."""

    score_thresh = 0.0

    def predict_submit(self, imgs):
        out = []
        for img in imgs:
            h, w = img.shape[1:]
            i = (int(img[0, 0, 0]) + 251 * int(img[0, 0, 1])
                 + 251 * 251 * int(img[0, 0, 2]))
            boxes, rng = self.dataset._boxes(i)
            bb = np.zeros((self.n_dets, 4), np.float32)
            for k in range(self.n_dets):
                if k < len(boxes):
                    y1, x1, y2, x2 = boxes[k]
                    dy, dx = rng.randint(-6, 7, 2)
                    bb[k] = (max(y1 + dy, 0), max(x1 + dx, 0),
                             min(y2 + dy, h), min(x2 + dx, w))
                else:
                    y = rng.randint(0, h - 60)
                    x = rng.randint(0, w - 60)
                    bb[k] = (y, x, y + 50, x + 50)
            pr = np.full((self.n_dets, 14, 14), 0.9, np.float32)
            ls = rng.randint(0, 80, self.n_dets).astype(np.int32)
            ss = rng.rand(self.n_dets).astype(np.float32)
            out.append((bb, pr, ls, ss, (h, w)))
        return out

    def predict_collect_raw(self, handle):
        return (
            [x[0] for x in handle],
            [x[1] for x in handle],
            [x[2] for x in handle],
            [x[3] for x in handle],
            [x[4] for x in handle],
        )


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=5000)
    parser.add_argument("--dets", type=int, default=100)
    parser.add_argument("--rss-limit-gb", type=float, default=8.0)
    parser.add_argument(
        "--raw", action="store_true",
        help="score via raw (box, roi-probs) detections / add_boxlocal — "
             "the production evaluator path (no full-image paste)",
    )
    args = parser.parse_args()

    from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator

    ds = SyntheticCOCOScaleDataset(args.images)
    model = (FakeRawPredictModel if args.raw else FakePredictModel)(
        ds, args.dets)
    class_names = [f"c{i}" for i in range(80)]
    ev = InstanceSegmentationEvaluator(ds, class_names, kind="coco",
                                       batch_size=4)
    rss0 = rss_gb()
    t0 = time.time()
    report = ev(model)
    dt = time.time() - t0
    peak = rss_gb()
    naive_gb = args.images * args.dets * 800 * 1216 / 1e9
    print(f"images={args.images} dets/img={args.dets}")
    print(f"map={report.get('validation/main/map', float('nan')):.4f}")
    print(f"elapsed: {dt:.1f}s ({args.images / dt:.1f} img/s scoring)")
    print(f"peak RSS: {peak:.2f} GB (start {rss0:.2f} GB); "
          f"mask bytes if retained as lists: ~{naive_gb:.0f} GB")
    ok = peak < args.rss_limit_gb
    print("RSS BOUNDED: " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
