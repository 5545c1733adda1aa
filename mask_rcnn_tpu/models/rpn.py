"""Region Proposal Network + static-shape proposal generation.

Replicates the reference RPN (models/region_proposal_network.py:26-167):
3x3 conv + relu, a 1x1 ``loc`` head -> (N, HWA, 4) and a 1x1 ``score`` head
producing a **single sigmoid foreground logit per anchor** -> (N, HWA)
(reference quirk — differs from chainercv's 2-channel softmax RPN; trained
with sigmoid cross entropy).

Proposal generation replicates chainercv's ``ProposalCreator``
(params overridden at reference models/mask_rcnn_resnet.py:48-52:
min_size=0, test 6000 pre-NMS / 1000 post-NMS; train 12000/2000,
NMS threshold 0.7) — but fully on-device with static shapes: `lax.top_k`
pre-NMS, padded fixpoint NMS, padded post-NMS output. The reference's
per-image Python loop with detached arrays becomes a `vmap` over the batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mask_rcnn_tpu.ops.boxes import clip_boxes, loc2bbox
from mask_rcnn_tpu.ops.nms import nms_padded
from mask_rcnn_tpu.models.resnet import conv2d


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    """chainercv ProposalCreator parameters (reference defaults for this
    model: mask_rcnn_resnet.py:48-52)."""

    nms_thresh: float = 0.7
    n_train_pre_nms: int = 12000
    n_train_post_nms: int = 2000
    n_test_pre_nms: int = 6000
    n_test_post_nms: int = 1000
    min_size: float = 0.0


def rpn_forward(params, features):
    """Features (N, H, W, C) -> (locs (N, HWA, 4), scores (N, HWA)).

    The (H, W, A) -> HWA flattening is cell-major then anchor, matching
    ``enumerate_shifted_anchors`` ordering.
    """
    n = features.shape[0]
    h = jax.nn.relu(
        conv2d(features, params["conv1"]["W"], padding=[(1, 1), (1, 1)])
        + params["conv1"]["b"]
    )
    locs = conv2d(h, params["loc"]["W"], padding="VALID") + params["loc"]["b"]
    scores = (
        conv2d(h, params["score"]["W"], padding="VALID")
        + params["score"]["b"]
    )
    locs = locs.reshape(n, -1, 4)
    scores = scores.reshape(n, -1)
    return locs, scores


def init_rpn(key, in_channels=1024, mid_channels=1024, n_anchor=12,
             std=0.01):
    ks = jax.random.split(key, 3)

    def conv(key, kh, kw, cin, cout):
        return {
            "W": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
            * std,
            "b": jnp.zeros((cout,), jnp.float32),
        }

    return {
        "conv1": conv(ks[0], 3, 3, in_channels, mid_channels),
        "loc": conv(ks[1], 1, 1, mid_channels, n_anchor * 4),
        "score": conv(ks[2], 1, 1, mid_channels, n_anchor),
    }


def propose_single(
    loc,
    score,
    anchors,
    img_size,
    scale,
    cfg: ProposalConfig,
    train: bool,
):
    """Proposals for one image.

    Args:
        loc: (HWA, 4) predicted offsets.
        score: (HWA,) foreground logits (any monotone score works; the
            reference passes raw single-logit scores).
        anchors: (HWA, 4) static anchor boxes.
        img_size: static (H, W) of the (padded) input image.
        scale: scalar preprocessing scale of this image (for min_size).
        cfg: proposal parameters.
        train: picks train vs test pre/post NMS counts.

    Returns:
        rois: (n_post_nms, 4) padded proposal boxes.
        mask: (n_post_nms,) validity.
    """
    n_pre = cfg.n_train_pre_nms if train else cfg.n_test_pre_nms
    n_post = cfg.n_train_post_nms if train else cfg.n_test_post_nms

    roi = loc2bbox(anchors, loc)
    roi = clip_boxes(roi, img_size)

    hs = roi[:, 2] - roi[:, 0]
    ws = roi[:, 3] - roi[:, 1]
    min_size = cfg.min_size * scale
    size_ok = (hs >= min_size) & (ws >= min_size)

    neg_inf = jnp.asarray(-jnp.inf, score.dtype)
    masked_score = jnp.where(size_ok, score, neg_inf)

    k = min(n_pre, score.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_score, k)
    top_rois = jnp.take(roi, top_idx, axis=0)
    top_valid = jnp.isfinite(top_scores)

    keep_idx, keep_mask = nms_padded(
        top_rois, top_scores, cfg.nms_thresh, n_post, valid=top_valid,
        presorted=True,  # straight out of top_k
    )
    rois = jnp.take(top_rois, jnp.maximum(keep_idx, 0), axis=0)
    rois = jnp.where(keep_mask[:, None], rois, 0.0)
    return rois, keep_mask


def propose_batch(locs, scores, anchors, img_size, scales, cfg, train):
    """vmap'd proposal creation: (N, HWA, ...) -> (N, n_post, 4) + mask."""
    return jax.vmap(
        lambda l, s, sc: propose_single(
            l, s, anchors, img_size, sc, cfg, train
        )
    )(locs, scores, scales)
