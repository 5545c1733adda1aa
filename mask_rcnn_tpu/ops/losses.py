"""Loss functions with chainer-parity semantics (SURVEY.md §2.8).

The -1 "ignore label" convention of chainer's sigmoid/softmax cross entropy is
load-bearing for the RPN objectness and mask losses
(models/mask_rcnn_train_chain.py:165,176-178): ignored entries contribute
nothing and the normalizer is the count of non-ignored entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(x, t, in_weight, sigma):
    """Summed smooth-L1: quadratic below 1/sigma^2, linear above.

    Matches reference ``_smooth_l1_loss`` (mask_rcnn_train_chain.py:192-201).
    """
    sigma2 = sigma**2
    diff = in_weight * (x - t)
    abs_diff = jnp.abs(diff)
    flag = (abs_diff < (1.0 / sigma2)).astype(x.dtype)
    y = flag * (sigma2 / 2.0) * jnp.square(diff) + (1 - flag) * (
        abs_diff - 0.5 / sigma2
    )
    return jnp.sum(y)


def fast_rcnn_loc_loss(pred_loc, gt_loc, gt_label, sigma):
    """Smooth-L1 over positive rows, normalized by #(label >= 0).

    Matches reference ``_fast_rcnn_loc_loss`` (mask_rcnn_train_chain.py:204-213).
    """
    in_weight = (gt_label > 0).astype(pred_loc.dtype)[..., None]
    in_weight = jnp.broadcast_to(in_weight, gt_loc.shape)
    loss = smooth_l1_loss(pred_loc, gt_loc, in_weight, sigma)
    denom = jnp.sum((gt_label >= 0).astype(pred_loc.dtype))
    return loss / jnp.maximum(denom, 1.0)


def sigmoid_cross_entropy(logits, labels):
    """Mean sigmoid CE; ``labels`` in {-1, 0, 1}, -1 entries ignored.

    Matches chainer ``F.sigmoid_cross_entropy(normalize=True)``.
    """
    valid = labels >= 0
    t = jnp.clip(labels, 0).astype(logits.dtype)
    # Numerically stable: max(x,0) - x*t + log1p(exp(-|x|))
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * t
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    loss = jnp.where(valid, loss, 0.0)
    denom = jnp.sum(valid.astype(logits.dtype))
    return jnp.sum(loss) / jnp.maximum(denom, 1.0)


def softmax_cross_entropy(logits, labels):
    """Mean softmax CE over the last axis; label -1 ignored.

    Matches chainer ``F.softmax_cross_entropy`` defaults (normalize=True,
    ignore_label=-1).
    """
    valid = labels >= 0
    safe_labels = jnp.clip(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, safe_labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    loss = jnp.where(valid, -picked, 0.0)
    denom = jnp.sum(valid.astype(logits.dtype))
    return jnp.sum(loss) / jnp.maximum(denom, 1.0)
