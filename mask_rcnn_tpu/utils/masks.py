"""Host-side mask pasting (Detectron ``segm_results`` parity).

Replicates reference models/mask_rcnn.py:44-107 (expand_boxes/segm_results):
the 14x14 roi mask is zero-padded to 16x16, the box expanded by (M+2)/M,
cv2-resized to the integer box size, thresholded at 0.5 and pasted into the
full-image mask with clipping. Kept on host (numpy + cv2) because exact cv2
bilinear parity here is what the COCO mAP comparison hinges on.
"""

from __future__ import annotations

import cv2
import numpy as np


def expand_boxes(boxes: np.ndarray, scale: float) -> np.ndarray:
    """Scale (x1, y1, x2, y2) boxes about their centers."""
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    out = np.zeros(boxes.shape)
    out[:, 0] = x_c - w_half
    out[:, 2] = x_c + w_half
    out[:, 1] = y_c - h_half
    out[:, 3] = y_c + h_half
    return out


def boxlocal_masks(bbox, mask_probs, im_h: int, im_w: int):
    """Per-detection clipped box-local binarized masks.

    Exactly the pixels :func:`paste_masks` would write, without the
    full-image canvases: for each detection, the cv2-parity resize +
    0.5 threshold of its (M, M) probabilities, clipped to the image.

    Returns a list of ``(local (h_i, w_i) bool, y0, x0)``; an empty local
    (shape (0, 0)) marks a detection fully outside the image.
    """
    r = len(bbox)
    empty = np.zeros((0, 0), dtype=bool)
    if r == 0:
        return []
    m = mask_probs.shape[1]
    ref_boxes = bbox[:, [1, 0, 3, 2]]  # -> x1, y1, x2, y2
    ref_boxes = expand_boxes(ref_boxes, (m + 2.0) / m)
    ref_boxes = ref_boxes.astype(np.int32)
    padded = np.zeros((m + 2, m + 2), dtype=np.float32)

    out = []
    for i in range(r):
        padded[1:-1, 1:-1] = mask_probs[i]
        ref = ref_boxes[i]
        w = max(ref[2] - ref[0] + 1, 1)
        h = max(ref[3] - ref[1] + 1, 1)
        resized = cv2.resize(padded, (w, h))
        binarized = resized > 0.5

        x_0 = max(ref[0], 0)
        x_1 = min(ref[2] + 1, im_w)
        y_0 = max(ref[1], 0)
        y_1 = min(ref[3] + 1, im_h)
        if x_1 <= x_0 or y_1 <= y_0:
            out.append((empty, 0, 0))
            continue
        out.append((
            binarized[
                (y_0 - ref[1]):(y_1 - ref[1]), (x_0 - ref[0]):(x_1 - ref[0])
            ],
            y_0,
            x_0,
        ))
    return out


def paste_masks(
    bbox: np.ndarray, mask_probs: np.ndarray, im_h: int, im_w: int
) -> np.ndarray:
    """Paste per-detection (M, M) mask probabilities into full-image masks.

    Args:
        bbox: (R, 4) detection boxes, (y1, x1, y2, x2), image coords.
        mask_probs: (R, M, M) sigmoid probabilities for the detected class.
        im_h, im_w: original image size.

    Returns:
        (R, im_h, im_w) bool masks.
    """
    r = len(bbox)
    out = np.zeros((r, im_h, im_w), dtype=bool)
    for i, (local, y0, x0) in enumerate(
        boxlocal_masks(bbox, mask_probs, im_h, im_w)
    ):
        h, w = local.shape
        out[i, y0:y0 + h, x0:x0 + w] = local
    return out


def boxlocal_inter_areas(locals_, gt_masks, det_labels, gt_labels):
    """Det-vs-gt intersections + areas from box-local masks.

    The shared ingestion core of ``COCOEvaluation.add_boxlocal`` and
    ``VOCEvaluation.add_boxlocal`` (one implementation so the two metrics
    cannot diverge): intersections are integer counts over each detection's
    clipped box crop, computed for label-equal pairs only (cross-class
    entries stay 0 — the evaluators never read them). Dispatches to the C++
    kernel (``native.boxlocal_inter``) when available; the numpy path below
    is the fallback oracle (tests/test_native.py).

    Args:
        locals_: ``[(local (h, w) bool, y0, x0), ...]`` from
            :func:`boxlocal_masks` (already clipped to the image).
        gt_masks: (G, H, W) bool.
        det_labels, gt_labels: int labels.

    Returns:
        (inter (D, G) int64, det_area (D,) int64, gt_area (G,) int64).
    """
    from mask_rcnn_tpu.utils import native

    dl = np.asarray(det_labels)
    gl = np.asarray(gt_labels)
    d, g = len(dl), len(gl)
    if d and g:
        res = native.boxlocal_inter(locals_, gt_masks, dl, gl)
        if res is not None:
            return res
    det_area = np.asarray(
        [local.sum() for local, _, _ in locals_], np.int64
    )
    gt_area = (
        gt_masks.sum(axis=(1, 2)).astype(np.int64)
        if g else np.zeros(0, np.int64)
    )
    inter = np.zeros((d, g), np.int64)
    if d and g:
        for lbl in np.unique(np.concatenate([dl, gl])):
            di = np.flatnonzero(dl == lbl)
            gi = np.flatnonzero(gl == lbl)
            if not len(di) or not len(gi):
                continue
            gmc = gt_masks[gi]  # hoisted: one copy per class, not per det
            for p in di:
                local, y0, x0 = locals_[p]
                h, w = local.shape
                if h and w:
                    crop = gmc[:, y0:y0 + h, x0:x0 + w]
                    inter[p, gi] = (crop & local[None]).sum(axis=(1, 2))
    return inter, det_area, gt_area
