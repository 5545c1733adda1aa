"""Proposal creation vs a numpy re-derivation of chainercv ProposalCreator."""

import jax
import numpy as np
import pytest

from mask_rcnn_tpu.models.rpn import ProposalConfig, propose_single
from mask_rcnn_tpu.ops.anchors import (
    enumerate_shifted_anchors,
    generate_anchor_base,
)
from tests.oracles import loc2bbox_np, nms_np


def proposal_oracle(loc, score, anchors, img_size, scale, cfg, train):
    """chainercv ProposalCreator semantics in numpy."""
    n_pre = cfg.n_train_pre_nms if train else cfg.n_test_pre_nms
    n_post = cfg.n_train_post_nms if train else cfg.n_test_post_nms
    roi = loc2bbox_np(anchors.astype(np.float64), loc.astype(np.float64))
    roi[:, 0::2] = np.clip(roi[:, 0::2], 0, img_size[0])
    roi[:, 1::2] = np.clip(roi[:, 1::2], 0, img_size[1])
    min_size = cfg.min_size * scale
    hs = roi[:, 2] - roi[:, 0]
    ws = roi[:, 3] - roi[:, 1]
    keep = np.where((hs >= min_size) & (ws >= min_size))[0]
    roi, s = roi[keep], score[keep]
    order = np.argsort(-s, kind="stable")[:n_pre]
    roi, s = roi[order], s[order]
    keep = nms_np(roi.astype(np.float32), s, cfg.nms_thresh)[:n_post]
    return roi[keep].astype(np.float32)


@pytest.mark.parametrize("train", [False, True])
def test_propose_single_matches_oracle(train):
    rng = np.random.RandomState(0)
    base = generate_anchor_base(anchor_scales=(2, 4))
    anchors = enumerate_shifted_anchors(base, 16, 6, 8)  # 288 anchors
    n = len(anchors)
    loc = (rng.randn(n, 4) * 0.2).astype(np.float32)
    # distinct scores for unambiguous ordering
    score = rng.permutation(n).astype(np.float32) / n
    img_size = (96, 128)
    cfg = ProposalConfig(
        n_train_pre_nms=150, n_train_post_nms=40,
        n_test_pre_nms=100, n_test_post_nms=30, min_size=0.0,
    )

    want = proposal_oracle(loc, score, anchors, img_size, 1.0, cfg, train)
    rois, mask = jax.jit(
        lambda l, s: propose_single(
            l, s, anchors, img_size, 1.0, cfg, train
        )
    )(loc, score)
    got = np.asarray(rois)[np.asarray(mask)]
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_propose_min_size_filter():
    """min_size > 0 must drop tiny proposals (scaled by the image scale)."""
    base = generate_anchor_base(anchor_scales=(0.25, 4))  # 4px + 64px anchors
    anchors = enumerate_shifted_anchors(base, 16, 4, 4)
    n = len(anchors)
    loc = np.zeros((n, 4), np.float32)
    rng = np.random.RandomState(1)
    score = rng.rand(n).astype(np.float32)
    cfg = ProposalConfig(n_test_pre_nms=n, n_test_post_nms=n, min_size=16.0)
    rois, mask = propose_single(
        loc, score, anchors, (64, 64), 1.0, cfg, train=False
    )
    got = np.asarray(rois)[np.asarray(mask)]
    hs = got[:, 2] - got[:, 0]
    ws = got[:, 3] - got[:, 1]
    assert np.all(hs >= 16.0) and np.all(ws >= 16.0)
    assert len(got) > 0
