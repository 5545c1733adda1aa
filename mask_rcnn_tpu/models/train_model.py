"""Training loss graph (reference MaskRCNNTrainChain,
models/mask_rcnn_train_chain.py:25-213) as one pure jax function.

The reference's per-image python loops over ProposalTargetCreator /
AnchorTargetCreator (with device->host->device copies) become `vmap`s of the
on-device target creators; proposals are detached exactly where the reference
detaches (`rpn_locs[i].array`, region_proposal_network.py:137).

Loss normalizer parity: padded/unfilled slots carry label -1 which every loss
ignores and excludes from its denominator, so the padded static-shape losses
equal the reference's ragged ones.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mask_rcnn_tpu.models import heads, rpn
from mask_rcnn_tpu.models.mask_rcnn import (
    MaskRCNNConfig,
    cast_params,
    forward_backbone_rpn,
    pooling_func,
)
from mask_rcnn_tpu.models.targets import (
    AnchorTargetConfig,
    ProposalTargetConfig,
    anchor_targets,
    proposal_targets,
)
from mask_rcnn_tpu.ops.losses import (
    fast_rcnn_loc_loss,
    sigmoid_cross_entropy,
    softmax_cross_entropy,
)


def train_loss(
    params,
    cfg: MaskRCNNConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    rpn_sigma: float = 3.0,
    roi_sigma: float = 1.0,
    anchor_cfg: AnchorTargetConfig = AnchorTargetConfig(),
    proposal_cfg: ProposalTargetConfig = ProposalTargetConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the 5-term Mask R-CNN loss on a padded batch.

    batch keys:
        image: (N, H, W, 3) float32 mean-subtracted — or uint8 raw pixels
            (keep_uint8 loaders), cast + mean-subtracted here on device.
        bbox: (N, G, 4); label: (N, G) 0-based fg; bbox_valid: (N, G) bool.
        mask: (N, G, H, W) binary instance masks (uint8/bool/int).
        scale: (N,) preprocessing scales.
    """
    images = batch["image"]
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) - jnp.asarray(
            cfg.mean, jnp.float32
        )
    n = images.shape[0]
    img_size = images.shape[1:3]

    # Masks arrive bit-packed along W from the loader (pack_mask_bits): 8x
    # less H2D traffic, and the target creator consumes the packed form
    # directly (unpacking only the gathered crop rows).
    mask_packed = batch["mask"].shape[-1] * 8 == img_size[1]

    params = cast_params(params, cfg.compute_dtype)
    feats, rpn_locs, rpn_scores, anchors = forward_backbone_rpn(
        params, cfg, images, train=True
    )

    # Proposals are created from detached RPN outputs (reference
    # region_proposal_network.py:137: `rpn_locs[i].array`).
    rois, rois_valid = rpn.propose_batch(
        jax.lax.stop_gradient(rpn_locs.astype(jnp.float32)),
        jax.lax.stop_gradient(rpn_scores.astype(jnp.float32)),
        anchors,
        img_size,
        batch["scale"],
        cfg.proposal,
        train=True,
    )

    key_p, key_a = jax.random.split(rng)
    sample_rois, gt_locs, gt_labels, gt_masks = jax.vmap(
        lambda k, r, rv, b, l, bv, m: proposal_targets(
            k, r, rv, b, l, bv, m, proposal_cfg,
            cfg.loc_normalize_mean, cfg.loc_normalize_std,
            mask_packed=mask_packed,
        )
    )(
        jax.random.split(key_p, n),
        rois,
        rois_valid,
        batch["bbox"],
        batch["label"],
        batch["bbox_valid"],
        batch["mask"],
    )

    s = proposal_cfg.n_sample
    # Only positives carry mask targets, and proposal_targets compacts them
    # into the first pos_quota slots per image — run the deconv/mask branch
    # just on those rows (pos_ratio of the rois, exactly the slots whose
    # loss isn't the -1-ignore constant). Identical loss, ~4x less mask-
    # branch compute fwd+bwd.
    q = min(int(round(s * proposal_cfg.pos_ratio)), s)
    mask_subset = (
        jnp.arange(n, dtype=jnp.int32)[:, None] * s
        + jnp.arange(q, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    # sample_rois stay grouped (N, S, 4): head_forward routes them through
    # the per-image batched RoIAlign einsums (1/N the contraction FLOPs).
    head_out = heads.head_forward(
        params["head"],
        feats,
        sample_rois,
        None,
        roi_size=cfg.roi_size,
        spatial_scale=1.0 / cfg.feat_stride,
        pred_bbox=True,
        pred_mask=True,
        pooling_func=pooling_func(cfg),
        sampling_ratio=cfg.sampling_ratio,
        mask_subset=mask_subset,
    )

    # ---- RPN losses ----
    gt_rpn_locs, gt_rpn_labels = jax.vmap(
        lambda k, b, bv: anchor_targets(k, b, bv, anchors, img_size,
                                        anchor_cfg)
    )(jax.random.split(key_a, n), batch["bbox"], batch["bbox_valid"])

    rpn_loc_loss = fast_rcnn_loc_loss(
        rpn_locs.reshape(-1, 4).astype(jnp.float32),
        gt_rpn_locs.reshape(-1, 4),
        gt_rpn_labels.reshape(-1),
        rpn_sigma,
    )
    rpn_cls_loss = sigmoid_cross_entropy(
        rpn_scores.reshape(-1).astype(jnp.float32),
        gt_rpn_labels.reshape(-1),
    )

    # ---- Head losses ----
    gt_labels_flat = gt_labels.reshape(-1)
    cls_locs = head_out["cls_locs"].astype(jnp.float32).reshape(
        n * s, cfg.n_class, 4
    )
    picked_locs = jnp.take_along_axis(
        cls_locs, jnp.clip(gt_labels_flat, 0)[:, None, None], axis=1
    )[:, 0, :]
    roi_loc_loss = fast_rcnn_loc_loss(
        picked_locs, gt_locs.reshape(-1, 4), gt_labels_flat, roi_sigma
    )
    roi_cls_loss = softmax_cross_entropy(
        head_out["scores"].astype(jnp.float32), gt_labels_flat
    )

    # Mask loss over the positive-candidate slots only — the remaining
    # slots are all-(-1) ignore (proposal_targets) and contribute nothing
    # to either the numerator or the normalizer.
    mask_logits = head_out["masks"].astype(jnp.float32)  # (NQ, M, M, n_fg)
    mask_labels = gt_labels[:, :q].reshape(-1)
    sel = jnp.clip(mask_labels - 1, 0)
    picked_masks = jnp.take_along_axis(
        mask_logits, sel[:, None, None, None], axis=-1
    )[..., 0]
    roi_mask_loss = sigmoid_cross_entropy(
        picked_masks,
        gt_masks[:, :q].reshape(n * q, cfg.mask_size, cfg.mask_size),
    )

    loss = (
        rpn_loc_loss
        + rpn_cls_loss
        + roi_loc_loss
        + roi_cls_loss
        + roi_mask_loss
    )
    metrics = {
        "rpn_loc_loss": rpn_loc_loss,
        "rpn_cls_loss": rpn_cls_loss,
        "roi_loc_loss": roi_loc_loss,
        "roi_cls_loss": roi_cls_loss,
        "roi_mask_loss": roi_mask_loss,
        "loss": loss,
    }
    return loss, metrics
