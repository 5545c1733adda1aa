#!/usr/bin/env python
"""Inference demo (reference examples/demo.py parity): rebuild a model from
a log dir's params.yaml + snapshot_model.npz, predict on images, draw and
save visualizations."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

DATASET_DEFAULTS = {
    "coco": dict(min_size=800, max_size=1333,
                 anchor_scales=(2, 4, 8, 16, 32), n_fg_class=80),
    "voc": dict(min_size=600, max_size=1000,
                anchor_scales=(4, 8, 16, 32), n_fg_class=20),
}


def build_model_from_log_dir(log_dir: str):
    from mask_rcnn_tpu.models.api import MaskRCNNResNet
    from mask_rcnn_tpu.utils.logging import load_params_yaml

    params_yaml = load_params_yaml(log_dir)
    mc = dict(params_yaml.get("model_config", {}))
    if not mc:
        # A reference log dir: its params.yaml is the flat serialized
        # argparse namespace (reference examples/train_common.py:286-288,
        # examples/demo.py:39-76). Map the flat keys so a migrating user's
        # reference-trained log dir works here unchanged — in particular
        # `model: resnet101` must pick the matching depth or the snapshot
        # import rejects the tree.
        if "model" in params_yaml:
            # exact match, mirroring the reference's
            # int(model.lstrip('resnet')) contract — substring sniffing
            # would silently map an unsupported depth (e.g. resnet152)
            # onto 50/101 and the later snapshot-import failure would
            # point at the wrong cause.
            depths = {"resnet50": 50, "resnet101": 101}
            name = str(params_yaml["model"])
            if name not in depths:
                raise ValueError(
                    f"unsupported model {name!r} in params.yaml; expected "
                    f"one of {sorted(depths)}"
                )
            mc["n_layers"] = depths[name]
        if params_yaml.get("class_names"):
            mc["n_fg_class"] = len(params_yaml["class_names"])
        for key in ("min_size", "max_size", "anchor_scales", "roi_size",
                    "mean"):
            if params_yaml.get(key) is not None:
                mc[key] = params_yaml[key]
        if params_yaml.get("pooling_func"):
            mc["pooling"] = params_yaml["pooling_func"]
    dataset = params_yaml.get("dataset", "coco")
    defaults = DATASET_DEFAULTS.get(dataset, DATASET_DEFAULTS["coco"])
    kwargs = {}
    if mc.get("mean") is not None:
        kwargs["mean"] = tuple(mc["mean"])
    model = MaskRCNNResNet(
        n_layers=mc.get("n_layers", 50),
        n_fg_class=mc.get("n_fg_class", defaults["n_fg_class"]),
        min_size=mc.get("min_size", defaults["min_size"]),
        max_size=mc.get("max_size", defaults["max_size"]),
        anchor_scales=tuple(
            mc.get("anchor_scales", defaults["anchor_scales"])
        ),
        roi_size=mc.get("roi_size", 14),
        pooling_func=mc.get("pooling", "align"),
        pretrained_model=osp.join(log_dir, "snapshot_model.npz"),
        **kwargs,
    )
    return model, params_yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", help="logs/<timestamp> directory")
    parser.add_argument("--images", nargs="+", required=True)
    parser.add_argument("--score-thresh", type=float, default=0.7)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from mask_rcnn_tpu.utils.visualizations import draw_instance_bboxes
    from mask_rcnn_tpu.utils import _itertools

    def load_image(path):
        # URL support for parity with the reference demo (its skimage.io
        # imread accepts URLs — reference examples/demo.py usage in
        # README.md:37-52); plain paths go through cv2.
        if path.startswith(("http://", "https://")):
            import urllib.request

            data = urllib.request.urlopen(path).read()
            bgr = cv2.imdecode(
                np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR
            )
        else:
            bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(f"could not read image: {path}")
        return bgr[:, :, ::-1].copy()

    # load (and fail on bad paths) before the expensive model build
    imgs = [(path, load_image(path)) for path in args.images]

    model, params_yaml = build_model_from_log_dir(args.log_dir)
    out_dir = args.out or tempfile.mkdtemp(prefix="mask_rcnn_tpu_demo_")
    os.makedirs(out_dir, exist_ok=True)

    saved = 0
    for chunk in _itertools.batch(imgs, n=2):
        chw = [im.transpose(2, 0, 1).astype(np.float32) for _, im in chunk]
        bboxes, masks, labels, scores = model.predict(chw)
        for (path, img), bb, mk, lb, sc in zip(
            chunk, bboxes, masks, labels, scores
        ):
            keep = sc >= args.score_thresh
            order = np.argsort(-sc[keep])
            viz = draw_instance_bboxes(
                img, bb[keep][order], lb[keep][order],
                n_class=model.n_class, masks=mk[keep][order],
                scores=sc[keep][order],
            )
            # numbered prefix: inputs sharing a basename (or URLs with
            # query strings) must not overwrite each other's output
            base = osp.basename(path).split("?")[0] or "image.jpg"
            out_path = osp.join(out_dir, f"{saved:03d}_{base}")
            saved += 1
            cv2.imwrite(out_path, viz[:, :, ::-1])
            print(f"{path}: {int(keep.sum())} detections -> {out_path}")


if __name__ == "__main__":
    main()
