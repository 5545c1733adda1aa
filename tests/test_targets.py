import cv2
import jax
import numpy as np

from mask_rcnn_tpu.models.targets import (
    AnchorTargetConfig,
    ProposalTargetConfig,
    _crop_resize_mask,
    anchor_targets,
    proposal_targets,
)
from mask_rcnn_tpu.ops.anchors import (
    enumerate_shifted_anchors,
    generate_anchor_base,
)
from tests.oracles import bbox2loc_np, bbox_iou_np


def setup_anchor_case():
    base = generate_anchor_base(anchor_scales=(2, 4))
    anchors = enumerate_shifted_anchors(base, 16, 6, 6)  # 216 anchors
    bbox = np.array(
        [[10.0, 10.0, 50.0, 60.0], [30.0, 40.0, 90.0, 95.0], [0, 0, 0, 0]],
        np.float32,
    )
    valid = np.array([True, True, False])
    return anchors, bbox, valid


def test_anchor_targets_invariants():
    anchors, bbox, valid = setup_anchor_case()
    cfg = AnchorTargetConfig(n_sample=32)
    loc, label = anchor_targets(
        jax.random.PRNGKey(0), bbox, valid, anchors, (96, 96), cfg
    )
    loc, label = np.asarray(loc), np.asarray(label)

    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] <= 96)
        & (anchors[:, 3] <= 96)
    )
    # outside anchors never labeled
    assert np.all(label[~inside] == -1)
    # sample budget respected
    assert ((label == 1).sum() + (label == 0).sum()) <= cfg.n_sample
    assert (label == 1).sum() <= cfg.n_sample * cfg.pos_ratio
    assert (label == 1).sum() >= 1  # every gt has an argmax anchor

    iou = bbox_iou_np(anchors, bbox[:2])
    max_iou = iou.max(axis=1)
    # negatives must have low IoU, positives high (or be a gt argmax)
    assert np.all(max_iou[label == 0] < cfg.neg_iou_thresh)
    gt_max = iou[inside].max(axis=0)
    pos_ok = (max_iou[label == 1] >= cfg.pos_iou_thresh) | np.isin(
        max_iou[label == 1].round(6), gt_max.round(6)
    )
    assert np.all(pos_ok)

    # loc targets encode the argmax gt
    pos_idx = np.where(label == 1)[0]
    assign = iou.argmax(axis=1)
    want = bbox2loc_np(anchors[pos_idx], bbox[assign[pos_idx]])
    np.testing.assert_allclose(loc[pos_idx], want, rtol=1e-3, atol=1e-4)


def test_anchor_targets_deterministic_per_key():
    anchors, bbox, valid = setup_anchor_case()
    a = anchor_targets(jax.random.PRNGKey(7), bbox, valid, anchors, (96, 96))
    b = anchor_targets(jax.random.PRNGKey(7), bbox, valid, anchors, (96, 96))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_proposal_targets_invariants():
    rng = np.random.RandomState(0)
    gt = np.array([[10.0, 10.0, 40.0, 50.0], [50.0, 30.0, 90.0, 80.0]],
                  np.float32)
    gt_label = np.array([0, 2], np.int32)
    gt_valid = np.array([True, True])
    # proposals: jittered copies of gts + random junk
    jitter = gt[None] + rng.randn(20, 2, 4).astype(np.float32) * 3
    junk = rng.rand(40, 4).astype(np.float32) * 50
    junk = np.concatenate(
        [junk[:, :2], junk[:, :2] + 5 + junk[:, 2:]], axis=1
    )
    rois = np.concatenate([jitter.reshape(-1, 4), junk], axis=0)
    roi_valid = np.ones(len(rois), bool)
    masks = np.zeros((2, 96, 96), np.uint8)
    masks[0, 10:40, 10:50] = 1
    masks[1, 50:90, 30:80] = 1

    cfg = ProposalTargetConfig(n_sample=32)
    s_roi, s_loc, s_label, s_mask = proposal_targets(
        jax.random.PRNGKey(1), rois, roi_valid, gt, gt_label, gt_valid,
        masks, cfg
    )
    s_roi, s_loc, s_label, s_mask = map(
        np.asarray, (s_roi, s_loc, s_label, s_mask)
    )

    assert s_roi.shape == (32, 4)
    pos = s_label > 0
    neg = s_label == 0
    assert pos.sum() <= round(cfg.n_sample * cfg.pos_ratio)
    assert pos.sum() + neg.sum() <= cfg.n_sample
    # positives come first
    first_nonpos = np.argmax(~pos) if (~pos).any() else len(pos)
    assert np.all(~pos[first_nonpos:])

    iou = bbox_iou_np(s_roi, gt)
    assert np.all(iou.max(axis=1)[pos] >= cfg.pos_iou_thresh)
    assert np.all(iou.max(axis=1)[neg] < cfg.neg_iou_thresh_hi)

    # positive labels match the assigned gt's class + 1
    assign = iou.argmax(axis=1)
    np.testing.assert_array_equal(
        s_label[pos], gt_label[assign[pos]] + 1
    )

    # loc targets: normalized bbox2loc vs assigned gt
    want = bbox2loc_np(s_roi[pos], gt[assign[pos]]) / np.array(
        [0.1, 0.1, 0.2, 0.2], np.float32
    )
    np.testing.assert_allclose(s_loc[pos], want, rtol=1e-2, atol=1e-3)

    # mask targets: -1 everywhere on non-positives, {0,1} on positives
    assert np.all(s_mask[~pos] == -1)
    assert set(np.unique(s_mask[pos])) <= {0, 1}
    # a positive roi overlapping gt0's filled box must contain 1s
    assert s_mask[0].max() == 1


def test_crop_resize_mask_matches_cv2():
    rng = np.random.RandomState(2)
    mask = (rng.rand(60, 70) > 0.5).astype(np.uint8)
    for roi in [
        np.array([5.2, 7.8, 44.9, 60.1], np.float32),
        np.array([0.0, 0.0, 59.0, 69.0], np.float32),
        np.array([10.0, 10.0, 12.0, 13.0], np.float32),
    ]:
        got = np.asarray(_crop_resize_mask(mask, roi, 14))
        r = np.round(roi).astype(np.int32)
        crop = mask[r[0]:max(r[2], r[0] + 1), r[1]:max(r[3], r[1] + 1)]
        want = cv2.resize(
            crop.astype(np.float32), (14, 14),
            interpolation=cv2.INTER_LINEAR,
        )
        want = (want > 0.5).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_crop_resize_tie_flip_rate_bounded():
    """Exact-0.5 bilinear ties binarize by sub-ulp rounding on both sides
    (cv2's double coordinate arithmetic wobbles on the same ties), so
    bit-parity at ties is undefined; pin the deviation to boundary-pixel
    noise: <= 0.6% of cells on a tie-heavy crop mix (docs/parity.md;
    measured ~0.4% here, ~0.1% on a natural extent mix)."""
    f = jax.jit(lambda m, r: _crop_resize_mask(m, r, 14))
    rng = np.random.RandomState(0)
    H, W = 128, 128
    total = diff = 0
    for t in range(120):
        mask = (rng.rand(H, W) > 0.5).astype(np.uint8)
        y1, x1 = rng.randint(0, H // 2), rng.randint(0, W // 2)
        if t % 3 == 0:  # extent 28 = 2*14: every sample offset ends in .5
            y2, x2 = min(y1 + 28, H - 1), min(x1 + 28, W - 1)
        elif t % 3 == 1:  # extent 56 = 4*14
            y2, x2 = min(y1 + 56, H - 1), min(x1 + 56, W - 1)
        else:
            y2 = rng.randint(y1 + 2, H)
            x2 = rng.randint(x1 + 2, W)
        roi = np.array([y1, x1, y2, x2], np.float32)
        got = np.asarray(f(mask, roi))
        r = np.round(roi).astype(np.int32)
        crop = mask[r[0]:max(r[2], r[0] + 1), r[1]:max(r[3], r[1] + 1)]
        want = (
            cv2.resize(
                crop.astype(np.float32), (14, 14),
                interpolation=cv2.INTER_LINEAR,
            ) > 0.5
        ).astype(np.int32)
        total += got.size
        diff += int((got != want).sum())
    assert diff / total <= 0.006, f"{diff}/{total} cells deviate from cv2"


def test_proposal_targets_zero_gt_samples_negatives():
    """An image with no valid gt must still contribute background rois to
    the head losses (all-IoU-0 negatives), not silently drop out of the
    batch (the reference never sees this case: its datasets filter
    annotation-less images and its creator would crash on empty gt)."""
    rng = np.random.RandomState(0)
    junk = rng.rand(48, 4).astype(np.float32) * 50
    rois = np.concatenate(
        [junk[:, :2], junk[:, :2] + 5 + junk[:, 2:]], axis=1
    )
    roi_valid = np.ones(len(rois), bool)
    gt = np.zeros((2, 4), np.float32)
    gt_label = np.zeros(2, np.int32)
    gt_valid = np.zeros(2, bool)  # every gt slot is padding
    masks = np.zeros((2, 96, 96), np.uint8)

    cfg = ProposalTargetConfig(n_sample=32)
    _, _, s_label, s_mask = proposal_targets(
        jax.random.PRNGKey(3), rois, roi_valid, gt, gt_label, gt_valid,
        masks, cfg
    )
    s_label, s_mask = np.asarray(s_label), np.asarray(s_mask)
    # reference semantics: negatives fill n_sample - n_pos (= everything
    # here, since there are no positives to sample)
    assert (s_label == 0).sum() == cfg.n_sample, (
        "background negatives must fill every slot"
    )
    assert not (s_label > 0).any()
    assert np.all(s_mask == -1)  # no positives -> every mask slot ignored
