"""Pure-numpy reference oracles for the compiled TPU ops.

These re-derive the reference semantics (scalar loops, float64 free) so the
vectorized/compiled implementations can be checked against an independent
implementation — the same testing strategy the reference uses for its CUDA
kernels (its numpy CPU paths are the oracle, SURVEY.md §4).
"""

import numpy as np


def roi_align_np(features, rois, roi_indices, out_size, spatial_scale,
                 sampling_ratio=0):
    """Scalar-loop Detectron RoIAlign. features: (N, H, W, C) float."""
    n, height, width, c = features.shape
    r = rois.shape[0]
    p = out_size
    out = np.zeros((r, p, p, c), dtype=np.float32)
    for i in range(r):
        b = int(roi_indices[i])
        start_h = rois[i, 0] * spatial_scale
        start_w = rois[i, 1] * spatial_scale
        end_h = rois[i, 2] * spatial_scale
        end_w = rois[i, 3] * spatial_scale
        roi_h = max(end_h - start_h, 1.0)
        roi_w = max(end_w - start_w, 1.0)
        bin_h = roi_h / p
        bin_w = roi_w / p
        if sampling_ratio > 0:
            grid_h = grid_w = sampling_ratio
        else:
            grid_h = int(np.ceil(roi_h / p))
            grid_w = int(np.ceil(roi_w / p))
        count = grid_h * grid_w
        for ph in range(p):
            for pw in range(p):
                val = np.zeros((c,), dtype=np.float64)
                for iy in range(grid_h):
                    y = start_h + ph * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        x = start_w + pw * bin_w + (ix + 0.5) * bin_w / grid_w
                        if y < -1 or y > height or x < -1 or x > width:
                            continue
                        yy = max(y, 0.0)
                        xx = max(x, 0.0)
                        y_low = int(yy)
                        x_low = int(xx)
                        if y_low >= height - 1:
                            y_high = y_low = height - 1
                            yy = float(y_low)
                        else:
                            y_high = y_low + 1
                        if x_low >= width - 1:
                            x_high = x_low = width - 1
                            xx = float(x_low)
                        else:
                            x_high = x_low + 1
                        ly = yy - y_low
                        lx = xx - x_low
                        hy = 1.0 - ly
                        hx = 1.0 - lx
                        val += (
                            hy * hx * features[b, y_low, x_low]
                            + hy * lx * features[b, y_low, x_high]
                            + ly * hx * features[b, y_high, x_low]
                            + ly * lx * features[b, y_high, x_high]
                        )
                out[i, ph, pw] = val / count
    return out


def roi_pool_np(features, rois, roi_indices, out_size, spatial_scale):
    """Scalar-loop chainer ``roi_pooling_2d`` (ROIPooling2D.forward_cpu
    semantics, reached via reference functions/roi_pooling_2d.py:4-14):
    integer-rounded rois, ``extent = max(end - start + 1, 1)``,
    bin [k] = [floor(k*stride), ceil((k+1)*stride)) shifted by the roi start
    and clipped to the map, empty bins -> 0. features: (N, H, W, C)."""
    _, height, width, c = features.shape
    r = rois.shape[0]
    p = out_size
    out = np.zeros((r, p, p, c), np.float32)
    for i in range(r):
        b = int(roi_indices[i])
        # round-half-even like python round / np.round (chainer uses round())
        ymin = int(np.round(rois[i, 0] * spatial_scale))
        xmin = int(np.round(rois[i, 1] * spatial_scale))
        ymax = int(np.round(rois[i, 2] * spatial_scale))
        xmax = int(np.round(rois[i, 3] * spatial_scale))
        roi_h = max(ymax - ymin + 1, 1)
        roi_w = max(xmax - xmin + 1, 1)
        stride_h = roi_h / p
        stride_w = roi_w / p
        for ph in range(p):
            for pw in range(p):
                hs = min(max(int(np.floor(ph * stride_h)) + ymin, 0), height)
                he = min(max(int(np.ceil((ph + 1) * stride_h)) + ymin, 0),
                         height)
                ws = min(max(int(np.floor(pw * stride_w)) + xmin, 0), width)
                we = min(max(int(np.ceil((pw + 1) * stride_w)) + xmin, 0),
                         width)
                if he <= hs or we <= ws:
                    continue  # empty bin -> 0
                out[i, ph, pw] = features[b, hs:he, ws:we].max(axis=(0, 1))
    return out


def nms_np(bbox, score, thresh):
    """Greedy NMS keep-indices (score order), chainercv semantics."""
    order = np.argsort(-score, kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            tl = np.maximum(bbox[i, :2], bbox[j, :2])
            br = np.minimum(bbox[i, 2:], bbox[j, 2:])
            wh = np.maximum(br - tl, 0.0)
            inter = wh[0] * wh[1]
            area_i = max(bbox[i, 2] - bbox[i, 0], 0) * max(
                bbox[i, 3] - bbox[i, 1], 0
            )
            area_j = max(bbox[j, 2] - bbox[j, 0], 0) * max(
                bbox[j, 3] - bbox[j, 1], 0
            )
            union = area_i + area_j - inter
            iou = inter / union if union > 0 else 0.0
            if iou > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return np.asarray(keep, dtype=np.int32)


def loc2bbox_np(src, loc):
    h = src[:, 2] - src[:, 0]
    w = src[:, 3] - src[:, 1]
    cy = src[:, 0] + 0.5 * h
    cx = src[:, 1] + 0.5 * w
    cy2 = loc[:, 0] * h + cy
    cx2 = loc[:, 1] * w + cx
    h2 = np.exp(loc[:, 2]) * h
    w2 = np.exp(loc[:, 3]) * w
    return np.stack(
        [cy2 - h2 / 2, cx2 - w2 / 2, cy2 + h2 / 2, cx2 + w2 / 2], axis=1
    )


def bbox2loc_np(src, dst):
    eps = np.finfo(np.float32).eps
    h = np.maximum(src[:, 2] - src[:, 0], eps)
    w = np.maximum(src[:, 3] - src[:, 1], eps)
    cy = src[:, 0] + 0.5 * (src[:, 2] - src[:, 0])
    cx = src[:, 1] + 0.5 * (src[:, 3] - src[:, 1])
    bh = dst[:, 2] - dst[:, 0]
    bw = dst[:, 3] - dst[:, 1]
    bcy = dst[:, 0] + 0.5 * bh
    bcx = dst[:, 1] + 0.5 * bw
    return np.stack(
        [
            (bcy - cy) / h,
            (bcx - cx) / w,
            np.log(np.maximum(bh, eps) / h),
            np.log(np.maximum(bw, eps) / w),
        ],
        axis=1,
    )


def bbox_iou_np(a, b):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(
        a[:, 3] - a[:, 1], 0
    )
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
        b[:, 3] - b[:, 1], 0
    )
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def random_boxes(rng, n, height, width, min_size=1.0):
    """Random (y1,x1,y2,x2) boxes inside an image."""
    y1 = rng.uniform(0, height - min_size, n)
    x1 = rng.uniform(0, width - min_size, n)
    y2 = y1 + rng.uniform(min_size, height, n)
    x2 = x1 + rng.uniform(min_size, width, n)
    return np.stack(
        [y1, x1, np.minimum(y2, height), np.minimum(x2, width)], axis=1
    ).astype(np.float32)
