"""Box geometry ops (pure JAX, vectorized, static shapes).

Conventions follow the reference framework (chainercv surface used by
wkentaro/chainer-mask-rcnn, see SURVEY.md §2.8): boxes are ``(y1, x1, y2, x2)``
float32, locs are ``(dy, dx, dh, dw)`` (y-first), IoU uses no +1 offsets.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bbox_area(bbox: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) boxes; negative extents clamp to zero."""
    h = jnp.maximum(bbox[..., 2] - bbox[..., 0], 0.0)
    w = jnp.maximum(bbox[..., 3] - bbox[..., 1], 0.0)
    return h * w


def bbox_iou(bbox_a: jnp.ndarray, bbox_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix between (N, 4) and (K, 4) boxes -> (N, K).

    Matches chainercv ``bbox_iou`` (used at reference
    models/utils/proposal_target_creator.py:124): intersection from
    max-top-left / min-bottom-right, areas without +1.
    """
    tl = jnp.maximum(bbox_a[:, None, :2], bbox_b[None, :, :2])
    br = jnp.minimum(bbox_a[:, None, 2:], bbox_b[None, :, 2:])
    wh = jnp.maximum(br - tl, 0.0)
    area_i = wh[..., 0] * wh[..., 1]
    area_a = bbox_area(bbox_a)[:, None]
    area_b = bbox_area(bbox_b)[None, :]
    denom = area_a + area_b - area_i
    return jnp.where(denom > 0, area_i / denom, 0.0)


def bbox2loc(src_bbox: jnp.ndarray, dst_bbox: jnp.ndarray) -> jnp.ndarray:
    """Encode dst boxes relative to src boxes as (dy, dx, dh, dw).

    Matches chainercv ``bbox2loc``: height/width clamped to float eps before
    the division/log.
    """
    height = src_bbox[..., 2] - src_bbox[..., 0]
    width = src_bbox[..., 3] - src_bbox[..., 1]
    ctr_y = src_bbox[..., 0] + 0.5 * height
    ctr_x = src_bbox[..., 1] + 0.5 * width

    base_height = dst_bbox[..., 2] - dst_bbox[..., 0]
    base_width = dst_bbox[..., 3] - dst_bbox[..., 1]
    base_ctr_y = dst_bbox[..., 0] + 0.5 * base_height
    base_ctr_x = dst_bbox[..., 1] + 0.5 * base_width

    eps = jnp.asarray(np.finfo(np.float32).eps, dtype=height.dtype)
    height = jnp.maximum(height, eps)
    width = jnp.maximum(width, eps)

    dy = (base_ctr_y - ctr_y) / height
    dx = (base_ctr_x - ctr_x) / width
    dh = jnp.log(jnp.maximum(base_height, eps) / height)
    dw = jnp.log(jnp.maximum(base_width, eps) / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def loc2bbox(src_bbox: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Decode (dy, dx, dh, dw) locs on top of src boxes -> (y1, x1, y2, x2).

    Matches chainercv ``loc2bbox`` (reference models/mask_rcnn.py:38).
    """
    src_height = src_bbox[..., 2] - src_bbox[..., 0]
    src_width = src_bbox[..., 3] - src_bbox[..., 1]
    src_ctr_y = src_bbox[..., 0] + 0.5 * src_height
    src_ctr_x = src_bbox[..., 1] + 0.5 * src_width

    dy = loc[..., 0]
    dx = loc[..., 1]
    dh = loc[..., 2]
    dw = loc[..., 3]

    ctr_y = dy * src_height + src_ctr_y
    ctr_x = dx * src_width + src_ctr_x
    h = jnp.exp(dh) * src_height
    w = jnp.exp(dw) * src_width

    return jnp.stack(
        [ctr_y - 0.5 * h, ctr_x - 0.5 * w, ctr_y + 0.5 * h, ctr_x + 0.5 * w],
        axis=-1,
    )


def clip_boxes(bbox: jnp.ndarray, size) -> jnp.ndarray:
    """Clip (..., 4) boxes to an image of (H, W)."""
    h, w = size
    y1 = jnp.clip(bbox[..., 0], 0.0, h)
    x1 = jnp.clip(bbox[..., 1], 0.0, w)
    y2 = jnp.clip(bbox[..., 2], 0.0, h)
    x2 = jnp.clip(bbox[..., 3], 0.0, w)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def flip_boxes_horizontal(bbox: jnp.ndarray, width) -> jnp.ndarray:
    """Horizontally flip boxes within an image of the given pixel width."""
    x1 = width - bbox[..., 3]
    x2 = width - bbox[..., 1]
    return jnp.stack([bbox[..., 0], x1, bbox[..., 2], x2], axis=-1)


def resize_boxes(bbox: jnp.ndarray, scale_y, scale_x) -> jnp.ndarray:
    """Rescale boxes by per-axis factors."""
    return bbox * jnp.asarray(
        [scale_y, scale_x, scale_y, scale_x], dtype=bbox.dtype
    )
