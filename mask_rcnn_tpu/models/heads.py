"""C4 RoI head: res5 + box/class/mask branches.

Replicates reference ``ResNetRoIHead`` (models/mask_rcnn_resnet.py:119-196):
RoIAlign(roi_size, 1/16) -> res5 (stride roi_size//7) -> 7x7 global average
-> Linear cls_loc (n_class*4) / Linear score (n_class); mask branch:
relu(Deconv 2x2/2: 2048->256) -> 1x1 conv -> n_fg_class channel logits.

The 2x2-stride-2 deconvolution has non-overlapping windows, so it is
implemented as a single einsum + reshape (pure MXU) instead of a transposed
convolution. Outputs are NHWC; callers select mask channels on the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mask_rcnn_tpu.models.resnet import (
    init_res5,
    res5_forward,
)
from mask_rcnn_tpu.ops.roi_align import roi_align, roi_align_grouped


def deconv2x2_s2(x, w, b):
    """(N, H, W, C) -> (N, 2H, 2W, O) with kernel w (2, 2, C, O)."""
    n, h, ww, c = x.shape
    o = w.shape[-1]
    y = jnp.einsum("nhwc,ijco->nhiwjo", x, w)
    return y.reshape(n, h * 2, ww * 2, o) + b


def head_forward(
    params,
    features,
    rois,
    roi_indices,
    roi_size=14,
    spatial_scale=1.0 / 16,
    pred_bbox=True,
    pred_mask=True,
    pooling_func=roi_align,
    sampling_ratio=0,
    mask_subset=None,
):
    """Run the RoI head.

    ``rois`` may be flat (R, 4) with per-roi batch indices in
    ``roi_indices``, or grouped per image as (N, R_i, 4) — the grouped form
    routes RoIAlign through the per-image batched einsums
    (``roi_align_grouped``: 1/N the contraction FLOPs, shorter-axis
    intermediate) and needs no ``roi_indices`` (pass None). All outputs are
    flat over rois in roi-major order either way.

    ``mask_subset``: optional (M,) flat row indices of ``rois`` to run the
    mask branch on (training: only positive samples carry mask targets, so
    the deconv/mask convs run on pos_ratio of the rois — the box/class
    branches still see every roi).

    Returns dict with any of:
        cls_locs: (R, n_class*4)
        scores: (R, n_class)
        masks: (R or len(mask_subset), mask_size, mask_size, n_fg_class)
            logits, NHWC.
    """
    grouped = rois.ndim == 3
    s5 = roi_size // 7
    if pooling_func is roi_align and s5 > 1:
        # The caffe-convention res5 puts its stride on 1x1 convs, which read
        # only every s5-th pooled cell — so with roi_size=14 only the even
        # 7x7 subgrid of the 14x14 pooling is ever used. Computing just
        # those bins (bin_stride) and running res5 at stride 1 is
        # bit-identical and does 1/s5^2 of the pooling work.
        if grouped:
            pool = roi_align_grouped(
                features, rois, out_size=7, spatial_scale=spatial_scale,
                sampling_ratio=sampling_ratio, bin_stride=s5,
            ).reshape(-1, 7, 7, features.shape[-1])
        else:
            pool = roi_align(
                features, rois, roi_indices, out_size=7,
                spatial_scale=spatial_scale, sampling_ratio=sampling_ratio,
                bin_stride=s5,
            )
        h = res5_forward(params["res5"], pool, stride=1)
    else:
        if grouped:
            n_img, r_img = rois.shape[:2]
            if pooling_func is roi_align:
                pool = roi_align_grouped(
                    features, rois, out_size=roi_size,
                    spatial_scale=spatial_scale,
                    sampling_ratio=sampling_ratio,
                ).reshape(-1, roi_size, roi_size, features.shape[-1])
            else:
                pool = pooling_func(
                    features,
                    rois.reshape(n_img * r_img, 4),
                    jnp.repeat(jnp.arange(n_img, dtype=jnp.int32), r_img),
                    out_size=roi_size,
                    spatial_scale=spatial_scale,
                )
        else:
            pool = pooling_func(
                features,
                rois,
                roi_indices,
                out_size=roi_size,
                spatial_scale=spatial_scale,
                **({"sampling_ratio": sampling_ratio}
                   if pooling_func is roi_align else {}),
            )
        h = res5_forward(params["res5"], pool, stride=s5)

    out = {}
    if pred_bbox:
        p5 = jnp.mean(h, axis=(1, 2))  # == 7x7 average pooling
        out["cls_locs"] = p5 @ params["cls_loc"]["W"] + params["cls_loc"]["b"]
        out["scores"] = p5 @ params["score"]["W"] + params["score"]["b"]
    if pred_mask:
        hm = h if mask_subset is None else jnp.take(h, mask_subset, axis=0)
        d = jax.nn.relu(
            deconv2x2_s2(hm, params["deconv6"]["W"], params["deconv6"]["b"])
        )
        out["masks"] = (
            jax.lax.conv_general_dilated(
                d,
                params["mask"]["W"],
                (1, 1),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + params["mask"]["b"]
        )
    return out


def init_head(key, n_class, n_layers=50, loc_std=0.001, std=0.01,
              initializer="normal"):
    """Initializers match the reference (mask_rcnn_resnet.py:57-64):
    Normal(0.001) for cls_loc, Normal(0.01) for score, and for the mask
    branch (deconv6 + mask) the ``--initializer`` choice
    (train_common.py:146-156): 'normal' -> Normal(0.01), 'he_normal' ->
    HeNormal(fan_option='fan_out') with chainer's fan convention
    (fan_out = W.shape[0] * prod(kernel) in chainer layout)."""
    ks = jax.random.split(key, 5)
    n_fg = n_class - 1
    if initializer == "he_normal":
        # chainer layouts: deconv6 W (2048, 256, 2, 2), mask W (n_fg, 256,
        # 1, 1) -> fans 2048*4 and n_fg*1.
        deconv_std = float(np.sqrt(2.0 / (2048 * 2 * 2)))
        mask_std = float(np.sqrt(2.0 / n_fg))
    elif initializer == "normal":
        deconv_std = mask_std = std
    else:
        raise ValueError(f"unsupported initializer: {initializer}")
    return {
        "res5": init_res5(ks[0], n_layers),
        "cls_loc": {
            "W": jax.random.normal(ks[1], (2048, n_class * 4), jnp.float32)
            * loc_std,
            "b": jnp.zeros((n_class * 4,), jnp.float32),
        },
        "score": {
            "W": jax.random.normal(ks[2], (2048, n_class), jnp.float32)
            * std,
            "b": jnp.zeros((n_class,), jnp.float32),
        },
        "deconv6": {
            "W": jax.random.normal(ks[3], (2, 2, 2048, 256), jnp.float32)
            * deconv_std,
            "b": jnp.zeros((256,), jnp.float32),
        },
        "mask": {
            "W": jax.random.normal(ks[4], (1, 1, 256, n_fg), jnp.float32)
            * mask_std,
            "b": jnp.zeros((n_fg,), jnp.float32),
        },
    }
