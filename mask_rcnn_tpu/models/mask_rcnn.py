"""Mask R-CNN (R-50/101-C4): config, parameter init, and the jitted
inference graph.

Everything from pixels to final per-class-NMS'd detections and mask logits is
one XLA program with static shapes — the reference's device->host round-trips
for NMS (models/mask_rcnn.py:242-243), python loops over classes (:183-198)
and the second mask head pass (:267-290) all stay on device here. Only image
resize/normalize (host prepare) and the final mask paste-to-image
(``segm_results``) remain host-side, matching where cv2 parity matters for
mAP.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mask_rcnn_tpu.models import heads, resnet, rpn
from mask_rcnn_tpu.ops import anchors as anchor_ops
from mask_rcnn_tpu.ops.boxes import loc2bbox
from mask_rcnn_tpu.ops.nms import nms_padded
from mask_rcnn_tpu.ops.roi_align import POOLING_FUNCS


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    """Static model/inference configuration.

    Defaults mirror the reference MaskRCNNResNet
    (models/mask_rcnn_resnet.py:34-56) with the training drivers' roi_size=14
    (examples/train_common.py:44).
    """

    n_fg_class: int
    n_layers: int = 50
    min_size: int = 600
    max_size: int = 1000
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_scales: Tuple[float, ...] = (4.0, 8.0, 16.0, 32.0)
    mean: Tuple[float, float, float] = (123.152, 115.903, 103.063)
    feat_stride: int = 16
    rpn_hidden: int = 1024
    roi_size: int = 14
    mask_size: int = 14
    pooling: str = "align"
    sampling_ratio: int = 0
    proposal: rpn.ProposalConfig = rpn.ProposalConfig()
    loc_normalize_mean: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    loc_normalize_std: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    nms_thresh: float = 0.5
    score_thresh: float = 0.05
    detections_per_im: int = 100
    compute_dtype: str = "float32"
    # Per-class candidate cap before NMS at decode time. Greedy NMS only
    # depends on candidates above score_thresh; capping to the top-K scored
    # boxes per class is exact unless more than K boxes of one class clear
    # the 0.05 threshold (vanishingly rare; set 0 to disable for strict
    # parity). Cuts the (Rp x Rp) per-class NMS work ~15x.
    nms_topk_per_class: int = 256
    # Rematerialize backbone stages in the backward pass (larger per-chip
    # training batches at ~1/3 extra backbone FLOPs).
    remat: bool = False

    @property
    def n_class(self) -> int:
        return self.n_fg_class + 1

    @property
    def n_anchor(self) -> int:
        return len(self.ratios) * len(self.anchor_scales)


def init_params(key, cfg: MaskRCNNConfig, initializer="normal"):
    """``initializer`` selects the mask-branch init like the reference's
    --initializer flag (train_common.py:146-156); the backbone always uses
    he_normal from-scratch init (it is overwritten by pretrained weights
    in the reference recipe)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "extractor": resnet.init_extractor(k1, cfg.n_layers),
        "rpn": rpn.init_rpn(
            k2, 1024, cfg.rpn_hidden, cfg.n_anchor, std=0.01
        ),
        "head": heads.init_head(
            k3, cfg.n_class, cfg.n_layers, initializer=initializer
        ),
    }


def make_anchors(cfg: MaskRCNNConfig, feat_h: int, feat_w: int) -> np.ndarray:
    base = anchor_ops.generate_anchor_base(
        base_size=16.0,
        ratios=cfg.ratios,
        anchor_scales=cfg.anchor_scales,
    )
    return anchor_ops.enumerate_shifted_anchors(
        base, cfg.feat_stride, feat_h, feat_w
    )


def pooling_func(cfg: MaskRCNNConfig):
    """head_forward forwards ``sampling_ratio`` only when this is roi_align."""
    return POOLING_FUNCS[cfg.pooling]


def cast_params(params, dtype):
    """Cast float params to the compute dtype (master params stay float32
    outside the graph — standard mixed precision)."""
    if dtype in (None, "float32", jnp.float32):
        return params
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        params,
    )


def forward_backbone_rpn(params, cfg, images, train=False):
    """images (N, H, W, 3) float, already mean-subtracted/padded ->
    (features, rpn_locs, rpn_scores, anchors)."""
    x = images.astype(cfg.compute_dtype)
    feats = resnet.extractor_forward(
        params["extractor"], x, cfg.n_layers, train=train, remat=cfg.remat
    )
    locs, scores = rpn.rpn_forward(params["rpn"], feats)
    anchors = jnp.asarray(
        make_anchors(cfg, feats.shape[1], feats.shape[2])
    )
    return feats, locs, scores, anchors


def _decode_single(cfg, roi, roi_valid, cls_loc, score, size, scale):
    """Per-image detection decode: de-normalize locs, per-class NMS,
    zero-area drop, top detections_per_im (reference _to_bboxes + _suppress,
    models/mask_rcnn.py:178-265).

    Returns (boxes (D, 4) original-image coords, labels (D,), scores (D,),
    valid (D,)).
    """
    n_class = cfg.n_class
    d = cfg.detections_per_im
    rp = roi.shape[0]

    prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1)  # (Rp, n_class)
    mean = jnp.tile(jnp.asarray(cfg.loc_normalize_mean, jnp.float32), n_class)
    std = jnp.tile(jnp.asarray(cfg.loc_normalize_std, jnp.float32), n_class)
    cls_loc = (cls_loc.astype(jnp.float32) * std + mean).reshape(
        rp, n_class, 4
    )
    roi_img = roi / scale
    cls_bbox = loc2bbox(
        jnp.broadcast_to(roi_img[:, None, :], cls_loc.shape), cls_loc
    )
    # clip to the *original* image extent (size is dynamic data)
    cls_bbox = jnp.stack(
        [
            jnp.clip(cls_bbox[..., 0], 0.0, size[0]),
            jnp.clip(cls_bbox[..., 1], 0.0, size[1]),
            jnp.clip(cls_bbox[..., 2], 0.0, size[0]),
            jnp.clip(cls_bbox[..., 3], 0.0, size[1]),
        ],
        axis=-1,
    )

    k = cfg.nms_topk_per_class
    if k and k < rp:
        def per_class(boxes_l, prob_l):
            valid_l = roi_valid & (prob_l > cfg.score_thresh)
            top_p, top_i = jax.lax.top_k(
                jnp.where(valid_l, prob_l, -jnp.inf), k
            )
            top_b = jnp.take(boxes_l, top_i, axis=0)
            idx, mask = nms_padded(
                top_b, top_p, cfg.nms_thresh, d,
                valid=jnp.isfinite(top_p), presorted=True,
            )
            b = jnp.take(top_b, jnp.maximum(idx, 0), axis=0)
            s = jnp.take(top_p, jnp.maximum(idx, 0))
            return b, jnp.where(mask, s, 0.0), mask
    else:
        def per_class(boxes_l, prob_l):
            valid_l = roi_valid & (prob_l > cfg.score_thresh)
            idx, mask = nms_padded(boxes_l, prob_l, cfg.nms_thresh, d,
                                   valid=valid_l)
            b = jnp.take(boxes_l, jnp.maximum(idx, 0), axis=0)
            s = jnp.take(prob_l, jnp.maximum(idx, 0))
            return b, s, mask

    # classes 1..n_class-1 (skip background)
    fg_boxes = jnp.swapaxes(cls_bbox[:, 1:, :], 0, 1)  # (n_fg, Rp, 4)
    fg_probs = jnp.swapaxes(prob[:, 1:], 0, 1)  # (n_fg, Rp)
    b, s, m = jax.vmap(per_class)(fg_boxes, fg_probs)  # (n_fg, D, ...)

    labels = jnp.broadcast_to(
        jnp.arange(cfg.n_fg_class, dtype=jnp.int32)[:, None], m.shape
    )
    b = b.reshape(-1, 4)
    s = s.reshape(-1)
    m = m.reshape(-1)
    labels = labels.reshape(-1)

    # Drop boxes whose rounded integer area is zero (reference
    # mask_rcnn.py:247-250).
    bi = jnp.round(b)
    area = (bi[:, 2] - bi[:, 0]) * (bi[:, 3] - bi[:, 1])
    m = m & (area > 0)

    top_s, top_i = jax.lax.top_k(jnp.where(m, s, -jnp.inf), d)
    out_valid = jnp.isfinite(top_s)
    out_boxes = jnp.take(b, top_i, axis=0)
    out_labels = jnp.take(labels, top_i)
    out_scores = jnp.where(out_valid, top_s, 0.0)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    out_labels = jnp.where(out_valid, out_labels, -1)
    return out_boxes, out_labels, out_scores, out_valid


def predict_step(
    params, cfg: MaskRCNNConfig, images, sizes, scales
) -> Dict[str, Any]:
    """Full inference graph on a padded batch.

    Args:
        images: (N, H, W, 3) float32 mean-subtracted zero-padded — or uint8
            raw pixels (mean-padded), normalized here on device.
        sizes: (N, 2) float32 original (pre-resize) image sizes.
        scales: (N,) float32 preprocessing scale factors.

    Returns dict of padded detections:
        boxes (N, D, 4) in original image coords; labels (N, D) 0-based fg
        (-1 pad); scores (N, D); valid (N, D); mask_probs (N, D, M, M)
        sigmoid probabilities for the detected class.
    """
    n = images.shape[0]
    d = cfg.detections_per_im
    if images.dtype == jnp.uint8:
        # uint8 host path: cast + mean-subtract on device (4x less H2D).
        images = images.astype(jnp.float32) - jnp.asarray(
            cfg.mean, jnp.float32
        )
    params = cast_params(params, cfg.compute_dtype)
    feats, locs, scores, anchors = forward_backbone_rpn(
        params, cfg, images, train=False
    )
    img_size = images.shape[1:3]
    rois, rois_valid = rpn.propose_batch(
        locs, scores, anchors, img_size, scales, cfg.proposal, train=False
    )  # (N, Rp, 4)

    rp = rois.shape[1]
    head_out = heads.head_forward(
        params["head"],
        feats,
        rois,
        None,
        roi_size=cfg.roi_size,
        spatial_scale=1.0 / cfg.feat_stride,
        pred_bbox=True,
        pred_mask=False,
        pooling_func=pooling_func(cfg),
        sampling_ratio=cfg.sampling_ratio,
    )
    cls_locs = head_out["cls_locs"].reshape(n, rp, -1)
    cls_scores = head_out["scores"].reshape(n, rp, -1)

    boxes, labels, det_scores, valid = jax.vmap(
        lambda r, rv, cl, sc, sz, s: _decode_single(
            cfg, r, rv, cl, sc, sz, s
        )
    )(rois, rois_valid, cls_locs, cls_scores, sizes, scales)

    # Second head pass on detected boxes for masks (reference _to_roi_masks,
    # mask_rcnn.py:267-290).
    mask_rois = boxes * scales[:, None, None]  # (N, D, 4) grouped
    mask_out = heads.head_forward(
        params["head"],
        feats,
        mask_rois,
        None,
        roi_size=cfg.roi_size,
        spatial_scale=1.0 / cfg.feat_stride,
        pred_bbox=False,
        pred_mask=True,
        pooling_func=pooling_func(cfg),
        sampling_ratio=cfg.sampling_ratio,
    )
    masks = mask_out["masks"].reshape(
        n, d, cfg.mask_size, cfg.mask_size, cfg.n_fg_class
    )
    sel = jnp.clip(labels, 0)
    mask_logits = jnp.take_along_axis(
        masks, sel[:, :, None, None, None], axis=-1
    )[..., 0]
    mask_probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))

    return {
        "boxes": boxes,
        "labels": labels,
        "scores": det_scores,
        "valid": valid,
        "mask_probs": mask_probs,
    }
