"""COCO instance-segmentation dataset (native JSON parsing, no pycocotools).

Capability parity with reference datasets/coco.py:19-208: 2014 splits
including train/val/minival/valminusminival, contiguous category ids,
images-without-annotations filtered, polygon segmentations rasterized and
RLE decoded, bbox recomputed from the mask, optional crowd/area returns.

The reference auto-downloads with md5 (coco.py:24-50); this environment has
no egress, so ``download()`` only validates presence and prints the URLs.
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Dict, List

import cv2
import numpy as np

from mask_rcnn_tpu.utils import rle as rle_util
from mask_rcnn_tpu.utils.geometry import mask_to_bbox


def polygons_to_mask(polygons: List[List[float]], h: int, w: int
                     ) -> np.ndarray:
    """Rasterize COCO polygons exactly like the reference pipeline
    (datasets/coco.py:137-143): PIL ImageDraw.polygon(outline=1, fill=1)
    per polygon onto one shared canvas. PIL's boundary-pixel semantics
    differ from cv2.fillPoly; gt-mask parity requires matching them."""
    import PIL.Image
    import PIL.ImageDraw

    canvas = PIL.Image.fromarray(np.zeros((h, w), np.uint8))
    draw = PIL.ImageDraw.Draw(canvas)
    for p in polygons:
        xy = np.asarray(p, np.float64).reshape(-1, 2)
        if len(xy) < 3:
            continue
        draw.polygon([tuple(pt) for pt in xy], outline=1, fill=1)
    return np.asarray(canvas)


def segmentation_to_mask(segm, h: int, w: int) -> np.ndarray:
    """COCO segmentation (polygon list | uncompressed RLE | compressed RLE)
    -> (h, w) uint8."""
    if isinstance(segm, list):
        return polygons_to_mask(segm, h, w)
    if isinstance(segm, dict):
        return rle_util.decode_rle(segm).astype(np.uint8)
    raise ValueError(f"unsupported segmentation type: {type(segm)}")


class COCOInstanceSegmentationDataset:
    """Examples: (img (H, W, 3) RGB uint8, bboxes (R, 4) float32 y1x1y2x2,
    labels (R,) int32 0-based fg, masks (R, H, W) int32
    [, crowds (R,), areas (R,)])."""

    # url + md5 of the archive (md5s from the reference download table,
    # /root/reference/chainer_mask_rcnn/datasets/coco.py:24-50; the image
    # zips are unchecksummed there too).
    DOWNLOAD_URLS = {
        "train2014": (
            "http://images.cocodataset.org/zips/train2014.zip", None,
        ),
        "val2014": (
            "http://images.cocodataset.org/zips/val2014.zip", None,
        ),
        "instances_train-val2014.zip": (
            "http://msvocds.blob.core.windows.net/annotations-1-0-3/"
            "instances_train-val2014.zip",
            "59582776b8dd745d649cd249ada5acf7",
        ),
        "annotations/instances_minival2014.json.zip": (
            "https://dl.dropboxusercontent.com/s/o43o90bna78omob/"
            "instances_minival2014.json.zip",
            "395a089042d356d97017bf416e4e99fb",
        ),
        "annotations/instances_valminusminival2014.json.zip": (
            "https://dl.dropboxusercontent.com/s/s3tw5zcg7395368/"
            "instances_valminusminival2014.json.zip",
            "f72ed643338e184978e8228948972e84",
        ),
    }

    def __init__(
        self,
        split: str = "train",
        year: str = "2014",
        root: str = "~/data/datasets/COCO",
        use_crowd: bool = False,
        return_crowd: bool = False,
        return_area: bool = False,
    ):
        if split not in ("train", "val", "minival", "valminusminival"):
            raise ValueError(f"unsupported split: {split}")
        self.root = osp.expanduser(root)
        self.split = split
        self.year = year
        self.use_crowd = use_crowd
        self.return_crowd = return_crowd
        self.return_area = return_area

        img_split = "train" if split == "train" else "val"
        self.img_dir = osp.join(self.root, f"{img_split}{year}")
        ann_file = osp.join(
            self.root, "annotations", f"instances_{split}{year}.json"
        )
        if not osp.exists(ann_file):
            raise FileNotFoundError(
                f"{ann_file} not found; see download() for sources"
            )
        with open(ann_file) as f:
            coco = json.load(f)

        cats = sorted(coco["categories"], key=lambda c: c["id"])
        self.class_names = tuple(c["name"] for c in cats)
        self.cat_id_to_class_id: Dict[int, int] = {
            c["id"]: i for i, c in enumerate(cats)
        }

        self.images = {im["id"]: im for im in coco["images"]}
        anns_by_img: Dict[int, list] = {}
        for ann in coco["annotations"]:
            anns_by_img.setdefault(ann["image_id"], []).append(ann)
        # Filter images without (non-crowd, unless use_crowd) annotations —
        # reference coco.py:94-100.
        self.img_ids = [
            iid
            for iid in sorted(self.images)
            if any(
                self.use_crowd or not a.get("iscrowd", 0)
                for a in anns_by_img.get(iid, [])
            )
        ]
        self.anns_by_img = anns_by_img

    def __len__(self):
        return len(self.img_ids)

    def image_sizes(self):
        """(H, W) per example without decoding images (from the json) —
        enables aspect-ratio grouping in the train loader."""
        return [
            (self.images[i]["height"], self.images[i]["width"])
            for i in self.img_ids
        ]

    def download(self):
        """No network egress in this environment: print sources, and md5-
        verify any archive already present on disk (reference behavior:
        cached_download with md5, datasets/coco.py:24-50)."""
        from mask_rcnn_tpu.data._download import print_sources_and_verify

        print_sources_and_verify(
            self.root,
            [(name, url, md5)
             for name, (url, md5) in self.DOWNLOAD_URLS.items()],
        )

    def get_example(self, i: int):
        img_id = self.img_ids[i]
        info = self.images[img_id]
        path = osp.join(self.img_dir, info["file_name"])
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise IOError(f"failed to read {path}")
        img = bgr[:, :, ::-1].copy()  # RGB
        h, w = img.shape[:2]

        bboxes, labels, masks, crowds, areas = [], [], [], [], []
        for ann in self.anns_by_img.get(img_id, []):
            iscrowd = int(ann.get("iscrowd", 0))
            if iscrowd and not self.use_crowd:
                continue
            mask = segmentation_to_mask(ann["segmentation"], h, w)
            if mask.sum() == 0:
                continue
            bboxes.append(mask_to_bbox(mask))
            labels.append(self.cat_id_to_class_id[ann["category_id"]])
            masks.append(mask.astype(np.int32))
            crowds.append(iscrowd)
            areas.append(float(ann.get("area", mask.sum())))

        bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int32)
        masks = np.asarray(masks, np.int32).reshape((-1, h, w))
        out = [img, bboxes, labels, masks]
        if self.return_crowd:
            out.append(np.asarray(crowds, np.int32))
        if self.return_area:
            out.append(np.asarray(areas, np.float32))
        return tuple(out)

    __getitem__ = get_example
