"""On-device training target creation (static shapes, jax.random).

Replaces the reference's per-iteration CPU round-trips:
  * chainercv AnchorTargetCreator (used at mask_rcnn_train_chain.py:151-160) —
    numpy on host;
  * ProposalTargetCreator (models/utils/proposal_target_creator.py:25-184) —
    explicitly ships rois to CPU for numpy RNG sampling + cv2 mask resize
    (:112-115), then back (:179-184).

Both become pure jax with padded shapes. Random sampling *without replacement*
from a masked candidate set uses the random-priority trick: draw iid uniform
priorities, take a static top-k, and accept ranks below the (dynamic) quota —
every fixed-size subset of candidates is equally likely, matching
``np.random.choice(..., replace=False)`` in distribution.

Unfilled slots carry label -1, which the chainer-parity losses ignore and
exclude from their normalizers, so padded outputs produce identical loss
values to ragged ones.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mask_rcnn_tpu.ops.boxes import bbox2loc, bbox_iou


def _sample_masked(key, candidate_mask, k_static):
    """Uniform sample of up to ``k_static`` True positions of a mask.

    Returns (idx (k_static,), picked (k_static,) bool). Fewer than k_static
    candidates -> all candidates picked.
    """
    priority = jax.random.uniform(key, candidate_mask.shape)
    priority = jnp.where(candidate_mask, priority, -jnp.inf)
    k = min(k_static, candidate_mask.shape[0])
    top, idx = jax.lax.top_k(priority, k)
    return idx, jnp.isfinite(top)


@dataclasses.dataclass(frozen=True)
class AnchorTargetConfig:
    """chainercv AnchorTargetCreator defaults."""

    n_sample: int = 256
    pos_iou_thresh: float = 0.7
    neg_iou_thresh: float = 0.3
    pos_ratio: float = 0.5


def anchor_targets(
    key,
    bbox: jnp.ndarray,
    bbox_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    img_size,
    cfg: AnchorTargetConfig = AnchorTargetConfig(),
):
    """RPN training targets for one image.

    Args:
        key: PRNG key.
        bbox: (G, 4) padded gt boxes.
        bbox_valid: (G,) validity.
        anchors: (S, 4) all anchors (compile-time constant).
        img_size: static (H, W) of the padded input image.
        cfg: sampling parameters.

    Returns:
        loc: (S, 4) regression targets (garbage where label != 1).
        label: (S,) int32 in {-1 ignore, 0 neg, 1 pos}.
    """
    h, w = img_size
    s = anchors.shape[0]
    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= h)
        & (anchors[:, 3] <= w)
    )

    iou = bbox_iou(anchors, bbox)  # (S, G)
    iou = jnp.where(bbox_valid[None, :], iou, -1.0)
    iou = jnp.where(inside[:, None], iou, -1.0)
    argmax = jnp.argmax(iou, axis=1)
    max_iou = jnp.max(iou, axis=1)

    # Anchors achieving the per-gt max IoU (ties included), chainercv style.
    gt_max = jnp.max(iou, axis=0)  # (G,) — iou is already masked above
    is_gt_argmax = jnp.any(
        (iou == gt_max[None, :]) & bbox_valid[None, :] & (gt_max[None, :] > 0),
        axis=1,
    )

    label = jnp.full((s,), -1, jnp.int32)
    label = jnp.where(inside & (max_iou < cfg.neg_iou_thresh), 0, label)
    label = jnp.where(inside & is_gt_argmax, 1, label)
    label = jnp.where(inside & (max_iou >= cfg.pos_iou_thresh), 1, label)

    # Subsample positives to pos_ratio * n_sample, then negatives to fill.
    n_pos_quota = int(cfg.pos_ratio * cfg.n_sample)
    kpos, kneg = jax.random.split(key)
    pos_idx, pos_picked = _sample_masked(kpos, label == 1, n_pos_quota)
    n_pos = jnp.sum(pos_picked)
    neg_idx, neg_avail = _sample_masked(kneg, label == 0, cfg.n_sample)
    neg_rank_ok = jnp.arange(neg_idx.shape[0]) < (cfg.n_sample - n_pos)
    neg_picked = neg_avail & neg_rank_ok

    # Anything labeled but not picked gets disabled to -1. Scatter with max
    # (never unset): unpicked top-k slots carry arbitrary indices.
    keep = jnp.zeros((s,), jnp.int32)
    keep = keep.at[pos_idx].max(pos_picked.astype(jnp.int32))
    keep = keep.at[neg_idx].max(neg_picked.astype(jnp.int32))
    label = jnp.where(keep > 0, label, -1)

    loc = bbox2loc(anchors, jnp.take(bbox, argmax, axis=0))
    return loc, label


@dataclasses.dataclass(frozen=True)
class ProposalTargetConfig:
    """Reference ProposalTargetCreator defaults
    (models/utils/proposal_target_creator.py:49-61)."""

    n_sample: int = 512
    pos_ratio: float = 0.25
    pos_iou_thresh: float = 0.5
    neg_iou_thresh_hi: float = 0.5
    neg_iou_thresh_lo: float = 0.0
    mask_size: int = 14


def _mask_sample_coords(roi, size, out_size):
    """cv2-parity bilinear sample positions for one rounded roi crop.

    Replicates reference proposal_target_creator.py:164-177: roi rounded to
    ints (round-half-even like np.round), crop, bilinear resize (cv2 samples
    at ``(i + .5) * crop/out - .5``); binarize at 0.5 (the one-hot+argmax
    construction reduces to interp > 0.5 for a binary mask).

    Exact-0.5 ties (sample exactly midway between two mask rows) binarize
    by sub-ulp rounding of the f32 coordinate; cv2's double-precision
    coordinates wobble on the same ties, so bit-parity there is undefined
    on either side. Measured deviation: 0.1% of cells on tie-prone crops,
    boundary pixels only (docs/parity.md, test_crop_resize_tie_flip_rate).
    """
    h, w = size
    r = jnp.round(roi).astype(jnp.int32)
    y1, x1 = r[0], r[1]
    ch = jnp.maximum(r[2] - y1, 1).astype(jnp.float32)
    cw = jnp.maximum(r[3] - x1, 1).astype(jnp.float32)

    i = jnp.arange(out_size, dtype=jnp.float32)
    ys = jnp.clip((i + 0.5) * (ch / out_size) - 0.5, 0.0, ch - 1.0)
    xs = jnp.clip((i + 0.5) * (cw / out_size) - 0.5, 0.0, cw - 1.0)
    ys = ys + y1.astype(jnp.float32)
    xs = xs + x1.astype(jnp.float32)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    x0 = jnp.clip(x0, 0, w - 1)
    ly = ys - y0.astype(jnp.float32)
    lx = xs - x0.astype(jnp.float32)
    return y0, y1i, x0, x1i, ly, lx


def _crop_resize_mask(mask, roi, out_size):
    """Single-mask crop-resize (kept for tests/direct use)."""
    y0, y1i, x0, x1i, ly, lx = _mask_sample_coords(roi, mask.shape, out_size)
    m = mask.astype(jnp.float32)
    v00 = m[y0][:, x0]
    v01 = m[y0][:, x1i]
    v10 = m[y1i][:, x0]
    v11 = m[y1i][:, x1i]
    interp = (
        v00 * ((1 - ly)[:, None] * (1 - lx)[None, :])
        + v01 * ((1 - ly)[:, None] * lx[None, :])
        + v10 * (ly[:, None] * (1 - lx)[None, :])
        + v11 * (ly[:, None] * lx[None, :])
    )
    return (interp > 0.5).astype(jnp.int32)


def _crop_resize_masks_indexed(masks, gt_index, rois, out_size,
                               packed=False):
    """Batched crop-resize gathering directly from the (G, H, W) mask stack
    (or its bit-packed (G, H, W/8) form when ``packed``).

    Gathers only the needed mask rows (contiguous reads, and 8x less gather
    volume when packed) then columns within them — point-wise byte gathers
    from the full stack are ~6x slower, and materializing a full-resolution
    mask copy per sampled roi costs ~GB/step at COCO sizes.
    """
    g, h, wm = masks.shape
    w = wm * 8 if packed else wm
    s = rois.shape[0]

    def coords(roi):
        return _mask_sample_coords(roi, (h, w), out_size)

    y0, y1i, x0, x1i, ly, lx = jax.vmap(coords)(rois)  # (S, out) each

    rows2d = masks.reshape(g * h, wm)
    base = (gt_index.astype(jnp.int32) * h)[:, None]
    row_idx = jnp.concatenate([base + y0, base + y1i], axis=1)  # (S, 2out)
    rows = jnp.take(rows2d, row_idx.reshape(-1), axis=0)
    if packed:
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        rows = (
            (rows[..., None] >> shifts) & jnp.uint8(1)
        ).reshape(rows.shape[0], w)
    rows = rows.reshape(s, 2 * out_size, w).astype(jnp.float32)
    r_y0 = rows[:, :out_size]  # (S, out, W)
    r_y1 = rows[:, out_size:]

    def cols(rws, xx):
        idx = jnp.broadcast_to(
            xx[:, None, :], (s, out_size, out_size)
        )
        return jnp.take_along_axis(rws, idx, axis=2)

    wy0 = (1 - ly)[:, :, None]
    wy1 = ly[:, :, None]
    wx0 = (1 - lx)[:, None, :]
    wx1 = lx[:, None, :]
    interp = (
        cols(r_y0, x0) * (wy0 * wx0)
        + cols(r_y0, x1i) * (wy0 * wx1)
        + cols(r_y1, x0) * (wy1 * wx0)
        + cols(r_y1, x1i) * (wy1 * wx1)
    )
    return (interp > 0.5).astype(jnp.int32)


def proposal_targets(
    key,
    roi: jnp.ndarray,
    roi_valid: jnp.ndarray,
    bbox: jnp.ndarray,
    label: jnp.ndarray,
    bbox_valid: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ProposalTargetConfig = ProposalTargetConfig(),
    loc_normalize_mean=(0.0, 0.0, 0.0, 0.0),
    loc_normalize_std=(0.1, 0.1, 0.2, 0.2),
    mask_packed: bool = False,
):
    """Sample rois + build head training targets for one image.

    Args:
        roi: (P, 4) padded proposals.
        roi_valid: (P,) proposal validity.
        bbox: (G, 4) padded gt boxes.
        label: (G,) gt fg-class labels in [0, n_fg).
        bbox_valid: (G,) gt validity.
        mask: (G, H, W) binary instance masks (padded image resolution).

    Returns:
        sample_roi: (n_sample, 4) — positives first.
        gt_loc: (n_sample, 4) normalized regression targets.
        gt_label: (n_sample,) int32 in [0, n_class); -1 for unused slots.
        gt_mask: (n_sample, mask_size, mask_size) int32 {0,1}; -1 ignore
            everywhere for non-positive slots.
    """
    n = cfg.n_sample
    # Reference concatenates gt boxes into the candidate pool (:121).
    cand = jnp.concatenate([roi, bbox], axis=0)
    cand_valid = jnp.concatenate([roi_valid, bbox_valid], axis=0)

    iou = bbox_iou(cand, bbox)
    iou = jnp.where(bbox_valid[None, :], iou, -1.0)
    gt_assignment = jnp.argmax(iou, axis=1)
    # With zero valid gt boxes every candidate's max IoU is the -1 padding
    # sentinel, which would fail the negative window [0, 0.5) and leave the
    # image contributing nothing. Treat proposals as IoU-0 background
    # instead so annotation-less images still train the head on negatives.
    # (The reference never sees this case — its datasets drop images
    # without annotations and its creator would crash on an empty gt
    # array — so background-only is the only sensible semantics.)
    no_gt_iou = jnp.where(jnp.any(bbox_valid), -1.0, 0.0)
    max_iou = jnp.where(
        cand_valid,
        jnp.maximum(jnp.max(iou, axis=1), no_gt_iou),
        -1.0,
    )

    pos_quota = int(round(n * cfg.pos_ratio))
    kpos, kneg = jax.random.split(key)
    pos_cand = max_iou >= cfg.pos_iou_thresh
    neg_cand = (max_iou < cfg.neg_iou_thresh_hi) & (
        max_iou >= cfg.neg_iou_thresh_lo
    )
    pos_idx, pos_picked = _sample_masked(kpos, pos_cand, pos_quota)
    n_pos = jnp.sum(pos_picked)
    neg_idx, neg_avail = _sample_masked(kneg, neg_cand, n)
    neg_picked = neg_avail & (jnp.arange(neg_idx.shape[0]) < (n - n_pos))

    # Compact [positives..., negatives...] into n slots, positives first.
    all_idx = jnp.concatenate([pos_idx, neg_idx])
    all_picked = jnp.concatenate([pos_picked, neg_picked])
    is_pos = jnp.concatenate(
        [pos_picked, jnp.zeros_like(neg_picked)]
    )
    if all_idx.shape[0] < n:  # tiny candidate pools (tests)
        pad = n - all_idx.shape[0]
        all_idx = jnp.pad(all_idx, (0, pad))
        all_picked = jnp.pad(all_picked, (0, pad))
        is_pos = jnp.pad(is_pos, (0, pad))
    take = jnp.argsort(~all_picked, stable=True)[:n]
    sel_idx = jnp.take(all_idx, take)
    sel_valid = jnp.take(all_picked, take)
    sel_pos = jnp.take(is_pos, take)

    sample_roi = jnp.take(cand, sel_idx, axis=0)
    sel_gt = jnp.take(gt_assignment, sel_idx)
    gt_roi_label = jnp.take(label, sel_gt) + 1
    gt_roi_label = jnp.where(sel_pos, gt_roi_label, 0)
    gt_roi_label = jnp.where(sel_valid, gt_roi_label, -1)

    gt_loc = bbox2loc(sample_roi, jnp.take(bbox, sel_gt, axis=0))
    gt_loc = (gt_loc - jnp.asarray(loc_normalize_mean, gt_loc.dtype)) / (
        jnp.asarray(loc_normalize_std, gt_loc.dtype)
    )

    # Only positives carry mask targets (negatives are -1 ignore), and the
    # compaction above places all positives in the first pos_quota slots —
    # so crop-resize only those rois: 1/(1-pos_ratio) less gather work in
    # the train step's hottest non-matmul op.
    n_crop = min(pos_quota, n)
    crops = _crop_resize_masks_indexed(
        mask, sel_gt[:n_crop], sample_roi[:n_crop], cfg.mask_size,
        packed=mask_packed,
    )
    gt_mask = jnp.full((n, cfg.mask_size, cfg.mask_size), -1, jnp.int32)
    gt_mask = gt_mask.at[:n_crop].set(
        jnp.where(sel_pos[:n_crop, None, None], crops, -1)
    )

    return sample_roi, gt_loc, gt_roi_label, gt_mask
