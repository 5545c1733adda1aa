#!/usr/bin/env python
"""Inference speed benchmark (reference examples/coco/speedtest.py parity):
R-50-C4 COCO model, warmup + timed predict() including host pre/post.

Note: in the dev environment the TPU sits behind a ~40ms-RTT network tunnel,
so this all-inclusive host loop (image upload + detections download per
call) is tunnel-bound; the device-side throughput benchmark is bench.py at
the repo root."""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "../.."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-times", type=int, default=10)
    parser.add_argument("--log-dir", default=None,
                        help="load weights from a log dir (else random)")
    parser.add_argument("--image", default=None)
    parser.add_argument(
        "--compute-dtype", choices=("float32", "bfloat16"),
        default="bfloat16",
    )
    parser.add_argument(
        "--uint8", action="store_true",
        help="ship uint8 pixels and normalize on device (4x less H2D)",
    )
    parser.add_argument(
        "--pipeline", action="store_true",
        help="double-buffered predict_stream: overlap host prepare/paste "
        "and transfers with device compute of the next image",
    )
    parser.add_argument(
        "--depth", type=int, default=2,
        help="predict_stream in-flight depth (>2 also overlaps uploads "
        "with downloads on a high-latency link)",
    )
    args = parser.parse_args()

    from mask_rcnn_tpu.models.api import MaskRCNNResNet

    if args.log_dir:
        sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
        from demo import build_model_from_log_dir

        model, _ = build_model_from_log_dir(args.log_dir)
    else:
        model = MaskRCNNResNet(
            n_layers=50,
            n_fg_class=80,
            min_size=800,
            max_size=1333,
            anchor_scales=(2, 4, 8, 16, 32),
            compute_dtype=args.compute_dtype,
        )
    model.score_thresh = 0.7
    model.uint8_input = args.uint8

    if args.image:
        import cv2

        bgr = cv2.imread(args.image, cv2.IMREAD_COLOR)
        img = bgr[:, :, ::-1].transpose(2, 0, 1).astype(np.float32)
    else:
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (3, 640, 1066)).astype(np.float32)

    for _ in range(5):
        model.predict([img])
    if args.pipeline:
        # throughput of the double-buffered serving loop (results for image
        # i are pasted/downloaded while image i+1 runs on the device)
        t0 = time.perf_counter()
        for _ in model.predict_stream(
            ([img] for _ in range(args.n_times)), depth=args.depth
        ):
            pass
        dt = (time.perf_counter() - t0) / args.n_times
        print(
            f"Average pipelined time: {dt * 1000:.1f} ms ({1 / dt:.2f} Hz)"
        )
    else:
        t0 = time.perf_counter()
        for _ in range(args.n_times):
            model.predict([img])
        dt = (time.perf_counter() - t0) / args.n_times
        print(f"Average inference time: {dt * 1000:.1f} ms ({1 / dt:.2f} Hz)")


if __name__ == "__main__":
    main()
