"""Training/eval transforms (reference datasets/transforms.py:4-51 parity).

Train mode: scale so min side = min_size capped by max_size (cv2 bilinear),
mean subtraction, bbox rescale, nearest-neighbor mask resize, random
horizontal flip of image/bbox/mask. Returns HWC float32 plus the scale.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def compute_scale(h: int, w: int, min_size: int, max_size: int) -> float:
    scale = 1.0
    if min_size:
        scale = min_size / min(h, w)
    if max_size and scale * max(h, w) > max_size:
        scale = max_size / max(h, w)
    return scale


def resize_example(img, bboxes, masks, min_size, max_size,
                   keep_uint8=False):
    h, w = img.shape[:2]
    scale = compute_scale(h, w, min_size, max_size)
    img = cv2.resize(
        img if keep_uint8 else img.astype(np.float32),
        None, fx=scale, fy=scale,
    )
    nh, nw = img.shape[:2]
    bboxes = bboxes * np.asarray(
        [nh / h, nw / w, nh / h, nw / w], np.float32
    )
    if len(masks):
        masks = np.stack(
            [
                cv2.resize(
                    m.astype(np.uint8), (nw, nh),
                    interpolation=cv2.INTER_NEAREST,
                )
                for m in masks
            ]
        )
    else:
        masks = np.zeros((0, nh, nw), np.uint8)
    return img, bboxes.astype(np.float32), masks, scale


def flip_horizontal(img, bboxes, masks):
    w = img.shape[1]
    img = img[:, ::-1].copy()
    x1 = w - bboxes[:, 3]
    x2 = w - bboxes[:, 1]
    bboxes = np.stack([bboxes[:, 0], x1, bboxes[:, 2], x2], axis=1)
    masks = masks[:, :, ::-1].copy()
    return img, bboxes.astype(np.float32), masks


class MaskRCNNTransform:
    """Callable transform: example tuple -> (img HWC f32 mean-subtracted,
    bboxes, labels, masks uint8, scale)."""

    def __init__(self, min_size: int, max_size: int,
                 mean: Tuple[float, float, float], train: bool = True,
                 rng: np.random.RandomState | None = None,
                 keep_uint8: bool = False):
        """``keep_uint8`` defers mean subtraction to the device and ships
        uint8 images (4x less host->device traffic; the train step casts
        and subtracts on-chip). The resize then runs on uint8 — up to
        0.5/255 per-pixel rounding vs the reference's float32 resize, so
        the float path stays the parity default."""
        self.min_size = min_size
        self.max_size = max_size
        self.mean = np.asarray(mean, np.float32)
        self.train = train
        self.rng = rng or np.random.RandomState()
        self.keep_uint8 = keep_uint8

    def __call__(self, example):
        img, bboxes, labels, masks = example[:4]
        if not self.train:
            img = img.astype(np.float32) - self.mean
            return img, bboxes, labels, masks.astype(np.uint8), 1.0
        img, bboxes, masks, scale = resize_example(
            img, bboxes, masks, self.min_size, self.max_size,
            keep_uint8=self.keep_uint8,
        )
        if not self.keep_uint8:
            img = img - self.mean
        if self.rng.rand() < 0.5:
            img, bboxes, masks = flip_horizontal(img, bboxes, masks)
        return img, bboxes, labels, masks.astype(np.uint8), scale
