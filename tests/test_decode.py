"""Detection decode vs a numpy re-derivation of the reference's
_to_bboxes + _suppress (models/mask_rcnn.py:178-265)."""

import jax
import numpy as np

from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig
from mask_rcnn_tpu.models.mask_rcnn import _decode_single
from tests.oracles import loc2bbox_np, nms_np, random_boxes


def decode_oracle(cfg, roi, cls_loc, score, size, scale):
    n_class = cfg.n_class
    prob = np.exp(score - score.max(axis=1, keepdims=True))
    prob = prob / prob.sum(axis=1, keepdims=True)
    mean = np.tile(np.asarray(cfg.loc_normalize_mean), n_class)
    std = np.tile(np.asarray(cfg.loc_normalize_std), n_class)
    cls_loc = (cls_loc * std + mean).reshape(-1, n_class, 4)
    roi_img = roi / scale
    cls_bbox = np.stack(
        [
            loc2bbox_np(roi_img, cls_loc[:, l, :])
            for l in range(n_class)
        ],
        axis=1,
    )
    cls_bbox[..., 0::2] = np.clip(cls_bbox[..., 0::2], 0, size[0])
    cls_bbox[..., 1::2] = np.clip(cls_bbox[..., 1::2], 0, size[1])

    bboxes, labels, scores = [], [], []
    for l in range(1, n_class):
        b = cls_bbox[:, l, :]
        p = prob[:, l]
        keep = p > cfg.score_thresh
        b, p = b[keep], p[keep]
        kept = nms_np(b.astype(np.float32), p.astype(np.float32),
                      cfg.nms_thresh)
        bboxes.append(b[kept])
        labels.append(np.full(len(kept), l - 1, np.int32))
        scores.append(p[kept])
    b = np.concatenate(bboxes)
    l = np.concatenate(labels)
    s = np.concatenate(scores)
    bi = np.round(b)
    area = (bi[:, 2] - bi[:, 0]) * (bi[:, 3] - bi[:, 1])
    keep = area > 0
    b, l, s = b[keep], l[keep], s[keep]
    order = np.argsort(-s, kind="stable")[: cfg.detections_per_im]
    return b[order], l[order], s[order]


def test_decode_matches_reference_oracle():
    rng = np.random.RandomState(0)
    cfg = MaskRCNNConfig(
        n_fg_class=6,
        min_size=200,
        max_size=300,
        proposal=ProposalConfig(),
        detections_per_im=20,
    )
    rp = 80
    roi = random_boxes(rng, rp, 200, 300, min_size=8)
    cls_loc = (rng.randn(rp, cfg.n_class * 4) * 0.8).astype(np.float32)
    # spread scores so some clear the 0.05 softmax threshold per class
    score = (rng.randn(rp, cfg.n_class) * 2).astype(np.float32)
    size = np.asarray([180.0, 260.0], np.float32)
    scale = np.float32(1.1)

    want_b, want_l, want_s = decode_oracle(
        cfg, roi.astype(np.float64), cls_loc.astype(np.float64),
        score.astype(np.float64), size, float(scale),
    )
    assert len(want_b) > 0, "oracle produced no detections; bad fixture"

    got = jax.jit(
        lambda r, cl, sc: _decode_single(
            cfg, r, np.ones(rp, bool), cl, sc, size, scale
        )
    )(roi, cls_loc, score)
    g_b, g_l, g_s, g_v = [np.asarray(x) for x in got]
    g_b, g_l, g_s = g_b[g_v], g_l[g_v], g_s[g_v]

    assert len(g_b) == len(want_b)
    # same detections in the same score order (float32 vs float64 tolerance)
    np.testing.assert_array_equal(g_l, want_l)
    np.testing.assert_allclose(g_s, want_s, rtol=1e-4)
    np.testing.assert_allclose(g_b, want_b, rtol=1e-3, atol=0.1)
