"""RoI feature extraction ops, TPU-native.

``roi_align`` replaces the reference's CUDA RoIAlign kernels
(functions/roi_align_2d.py:162-290 fwd, :391-524 bwd). Instead of a
one-thread-per-output gather kernel, the Detectron RoIAlign is reformulated as
two batched matmuls (MXU work):

    out[r, ph, pw, c] = sum_h sum_w Ay[r, ph, h] * Ax[r, pw, w] * feat[h, w, c]

This is exact because every Detectron quirk factorizes per-axis:
  * bilinear weights are products ``wy * wx``;
  * the sample-skip rule (``y < -1 or y > H`` / same for x) zeroes the y- or
    x-factor, and the product is zero iff either is;
  * the divisor ``count = grid_h * grid_w`` (which includes skipped samples)
    splits into ``1/grid_h`` folded into Ay and ``1/grid_w`` into Ax;
  * summing over the ``grid_h x grid_w`` sample grid distributes over the
    product, collapsing the sample dimensions out of the contraction entirely.

The backward pass is the einsum transpose — more matmuls, no atomicAdd
scatter. Like the reference (roi_align_2d.py:524), no gradient flows to rois.

Reference semantics replicated exactly (functions/roi_align_2d.py:61-160):
  * rois scaled by ``spatial_scale``; ``extent = max(end - start, 1)``;
  * sample positions ``start + p*bin + (s+.5)*bin/grid``;
  * adaptive grid ``ceil(extent / pooled)`` when ``sampling_ratio == 0``
    (handled with a static max grid + masking);
  * low clamp ``y <= 0 -> 0``; high clamp ``y_low >= H-1 -> y = y_low = H-1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interp_matrix(
    start: jnp.ndarray,
    extent: jnp.ndarray,
    grid: jnp.ndarray,
    pooled: int,
    max_grid: int,
    axis_size: int,
    total_size: int,
    offset: jnp.ndarray,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """Per-roi 1-D RoIAlign interpolation matrix.

    Args:
        start: (R,) roi start coordinate (already * spatial_scale).
        extent: (R,) roi extent, already clamped to >= 1.
        grid: (R,) int32 samples per bin along this axis.
        pooled: output bins P along this axis.
        max_grid: static upper bound on ``grid``.
        axis_size: feature extent along this axis (H or W).
        total_size: row dimension of the matrix (N*H for y, W for x).
        offset: (R,) int32 global offset of this roi's rows (batch_index *
            axis_size for the y axis, zeros for x).
        bin_stride: compute only every ``bin_stride``-th bin of a
            ``pooled * bin_stride`` grid (bins 0, s, 2s, ...). Used to skip
            pooled cells that a following strided 1x1 conv would discard.

    Returns:
        (R, pooled, total_size) float32 matrix, rows scaled by 1/grid.
    """
    r = start.shape[0]
    bin_size = extent / (pooled * bin_stride)  # (R,)
    p_idx = jnp.arange(pooled, dtype=start.dtype) * bin_stride  # (P,)
    s_idx = jnp.arange(max_grid, dtype=start.dtype)  # (S,)

    gridf = grid.astype(start.dtype)
    # coord[r, p, s] = start + p*bin + (s + .5) * bin / grid
    coord = (
        start[:, None, None]
        + p_idx[None, :, None] * bin_size[:, None, None]
        + (s_idx[None, None, :] + 0.5) * (bin_size / gridf)[:, None, None]
    )
    sample_on = s_idx[None, None, :] < gridf[:, None, None]
    in_range = (coord >= -1.0) & (coord <= axis_size)
    valid = sample_on & in_range

    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    at_edge = low >= axis_size - 1
    low = jnp.where(at_edge, axis_size - 1, low)
    high = jnp.where(at_edge, low, low + 1)
    lw = jnp.where(at_edge, 0.0, c - low.astype(c.dtype))
    hw = 1.0 - lw

    w_scale = jnp.where(valid, 1.0, 0.0) / gridf[:, None, None]
    off = offset[:, None, None]
    rows = jnp.arange(total_size, dtype=jnp.int32)  # (T,)
    # One-hot scatter of (hw @ low) and (lw @ high), summed over samples.
    low_hit = rows[None, None, None, :] == (low + off)[..., None]
    high_hit = rows[None, None, None, :] == (high + off)[..., None]
    contrib = (
        (hw * w_scale)[..., None] * low_hit
        + (lw * w_scale)[..., None] * high_hit
    )
    return contrib.sum(axis=2).reshape(r, pooled, total_size)


def _roi_align_matrices(
    rois, roi_indices, n, h, w, out_h, out_w, spatial_scale, sampling_ratio,
    bin_stride=1,
):
    """Build the (Ay, Ax) interpolation matrices for a batch of rois.

    With ``bin_stride`` s, the matrices cover bins (0, s, 2s, ...) of a
    virtual ``out * s`` grid — identical values to computing the full grid
    and slicing ``[::s]``.
    """
    rois = jax.lax.stop_gradient(rois.astype(jnp.float32))
    start_y = rois[:, 0] * spatial_scale
    start_x = rois[:, 1] * spatial_scale
    extent_y = jnp.maximum(rois[:, 2] * spatial_scale - start_y, 1.0)
    extent_x = jnp.maximum(rois[:, 3] * spatial_scale - start_x, 1.0)

    full_h = out_h * bin_stride
    full_w = out_w * bin_stride
    if sampling_ratio > 0:
        max_grid_y = max_grid_x = int(sampling_ratio)
        grid_y = jnp.full(rois.shape[:1], sampling_ratio, jnp.int32)
        grid_x = grid_y
    else:
        # Adaptive grid = ceil(extent / pooled); extent <= feature size since
        # proposals are clipped to the image, so the static bound is
        # ceil(size / pooled).
        max_grid_y = -(-h // full_h)
        max_grid_x = -(-w // full_w)
        grid_y = jnp.ceil(extent_y / full_h).astype(jnp.int32)
        grid_x = jnp.ceil(extent_x / full_w).astype(jnp.int32)
        grid_y = jnp.clip(grid_y, 1, max_grid_y)
        grid_x = jnp.clip(grid_x, 1, max_grid_x)

    offset_y = roi_indices.astype(jnp.int32) * h
    offset_x = jnp.zeros_like(offset_y)
    ay = _interp_matrix(
        start_y, extent_y, grid_y, out_h, max_grid_y, h, n * h, offset_y,
        bin_stride,
    )
    ax = _interp_matrix(
        start_x, extent_x, grid_x, out_w, max_grid_x, w, w, offset_x,
        bin_stride,
    )
    return ay, ax


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    roi_indices: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    roi_chunk: int = 512,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """Detectron-semantics RoIAlign as two MXU einsums.

    Args:
        features: (N, H, W, C) feature map.
        rois: (R, 4) boxes (y1, x1, y2, x2) in input-image coordinates.
        roi_indices: (R,) int batch index per roi.
        out_size: pooled output size P (square).
        spatial_scale: feature-map scale (e.g. 1/16).
        sampling_ratio: samples per bin per axis; 0 = adaptive (Detectron).
        roi_chunk: rois processed per chunk to bound the (chunk, P, W, C)
            intermediate in HBM.
        bin_stride: compute bins (0, s, 2s, ...) of a virtual
            ``out_size * s`` grid — bit-identical to computing the full grid
            and slicing ``[::s, ::s]``. Lets callers skip pooled cells that a
            following strided 1x1 conv would discard.

    Returns:
        (R, P, P, C) pooled features, dtype of ``features``.
    """
    n, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size
    feats = features.reshape(n * h, w, c)

    chunk = min(roi_chunk, r)
    pad = (-r) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    idx_p = jnp.pad(roi_indices, (0, pad))
    n_chunks = (r + pad) // chunk

    def one_chunk(args):
        rois_c, idx_c = args
        ay, ax = _roi_align_matrices(
            rois_c, idx_c, n, h, w, p, p, spatial_scale, sampling_ratio,
            bin_stride,
        )
        ay = ay.astype(features.dtype)
        ax = ax.astype(features.dtype)
        # The (chunk, P, spatial, C) intermediate dominates HBM traffic;
        # contract the longer spatial axis away first so the intermediate
        # keeps the shorter one (w-first keeps N*H; h-first keeps W).
        if n * h <= w:
            t = jnp.einsum(
                "rqw,hwc->rqhc", ax, feats,
                preferred_element_type=features.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jnp.einsum(
                "rph,rqhc->rpqc", ay, t,
                preferred_element_type=features.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
        t = jnp.einsum(
            "rph,hwc->rpwc", ay, feats,
            preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.einsum(
            "rqw,rpwc->rpqc", ax, t,
            preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    if n_chunks == 1:
        out = one_chunk((rois_p, idx_p))
    else:
        out = jax.lax.map(
            one_chunk,
            (
                rois_p.reshape(n_chunks, chunk, 4),
                idx_p.reshape(n_chunks, chunk),
            ),
        ).reshape(n_chunks * chunk, p, p, c)
    return out[:r]


def roi_align_grouped(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    sampling_ratio: int = 0,
    bin_stride: int = 1,
) -> jnp.ndarray:
    """``roi_align`` for rois grouped per image: rois (N, R, 4).

    Every production caller (the train step's ProposalTargetCreator output
    and both inference head passes) has a static, equal number of rois per
    image, contiguous by image. Exploiting that grouping beats the flat
    formulation twice over:

      * the y-axis contraction runs over a single image's H rows instead of
        the batch-embedded N*H rows (the flat path's ``offset`` trick), so
        the first einsum does 1/N of the FLOPs at batch N;
      * the first contraction is free to eliminate the *longer* spatial
        axis per image, so the (R, P, axis, C) intermediate — the op's
        dominant HBM traffic — keeps ``min(H, W)`` rows, where the flat
        path is forced to ``min(N*H, W)``.

    Measured at the train shape (b2, 52x84 feats, 512 rois/img, bf16):
    5.48 ms fwd+bwd vs 8.58 ms flat (examples/bench_align_variants.py).
    Values equal the flat path up to summation order (bf16 ~3e-2 on randn
    features; exact per-sample arithmetic is identical).

    Returns:
        (N, R, P, P, C) pooled features, dtype of ``features``.
    """
    n, h, w, c = features.shape
    r = rois.shape[1]
    p = out_size

    ay, ax = jax.vmap(
        lambda rc: _roi_align_matrices(
            rc, jnp.zeros(rc.shape[:1], jnp.int32), 1, h, w, p, p,
            spatial_scale, sampling_ratio, bin_stride,
        )
    )(rois)  # ay: (N, R, P, H), ax: (N, R, P, W)
    ay = ay.astype(features.dtype)
    ax = ax.astype(features.dtype)

    # Contract the longer spatial axis first so the big intermediate keeps
    # the shorter one.
    if w <= h:
        t = jnp.einsum(
            "nrph,nhwc->nrpwc", ay, features,
            preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.einsum(
            "nrqw,nrpwc->nrpqc", ax, t,
            preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    t = jnp.einsum(
        "nrqw,nhwc->nrqhc", ax, features,
        preferred_element_type=features.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "nrph,nrqhc->nrpqc", ay, t,
        preferred_element_type=features.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def crop_and_resize(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    roi_indices: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    roi_chunk: int = 512,
) -> jnp.ndarray:
    """Integer crop + align-corners bilinear resize (reference
    functions/crop_and_resize.py:7-41), as separable einsums.

    The crop is ``y1 = round(scale*y1)``, ``y2 = max(round(scale*y2), y1+1)``
    and the resize samples at ``y1 + i * (crop_h - 1) / (out - 1)`` (chainer
    ``resize_images`` align-corners convention). Unlike the reference, roi
    order is preserved (the reference groups output by batch index).
    """
    n, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size
    feats = features.reshape(n * h, w, c)
    rois = jax.lax.stop_gradient(rois.astype(jnp.float32))

    def axis_matrix(lo, hi, axis_size, total, offset):
        lo_i = jnp.round(lo * spatial_scale)
        hi_i = jnp.maximum(jnp.round(hi * spatial_scale), lo_i + 1.0)
        crop = hi_i - lo_i
        i_idx = jnp.arange(p, dtype=jnp.float32)
        denom = max(p - 1, 1)
        coord = lo_i[:, None] + i_idx[None, :] * ((crop - 1.0) / denom)[:, None]
        coord = jnp.clip(coord, 0.0, axis_size - 1.0)
        low = jnp.floor(coord).astype(jnp.int32)
        low = jnp.minimum(low, axis_size - 1)
        high = jnp.minimum(low + 1, axis_size - 1)
        lw = coord - low.astype(coord.dtype)
        hw = 1.0 - lw
        rows = jnp.arange(total, dtype=jnp.int32)
        off = offset[:, None]
        low_hit = rows[None, None, :] == (low + off)[..., None]
        high_hit = rows[None, None, :] == (high + off)[..., None]
        return hw[..., None] * low_hit + lw[..., None] * high_hit

    chunk = min(roi_chunk, r)
    pad = (-r) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    idx_p = jnp.pad(roi_indices, (0, pad))
    n_chunks = (r + pad) // chunk

    def one_chunk(args):
        rois_c, idx_c = args
        off_y = idx_c.astype(jnp.int32) * h
        off_x = jnp.zeros_like(off_y)
        ay = axis_matrix(rois_c[:, 0], rois_c[:, 2], h, n * h, off_y)
        ax = axis_matrix(rois_c[:, 1], rois_c[:, 3], w, w, off_x)
        ay = ay.astype(features.dtype)
        ax = ax.astype(features.dtype)
        t = jnp.einsum(
            "rph,hwc->rpwc", ay, feats, preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.einsum(
            "rqw,rpwc->rpqc", ax, t, preferred_element_type=features.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    if n_chunks == 1:
        out = one_chunk((rois_p, idx_p))
    else:
        out = jax.lax.map(
            one_chunk,
            (
                rois_p.reshape(n_chunks, chunk, 4),
                idx_p.reshape(n_chunks, chunk),
            ),
        ).reshape(n_chunks * chunk, p, p, c)
    return out[:r]


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    roi_indices: jnp.ndarray,
    out_size: int,
    spatial_scale: float,
    roi_chunk: int = 16,
) -> jnp.ndarray:
    """Quantized max RoI pooling (chainer ``roi_pooling_2d`` semantics, the
    reference's ``--pooling-func pooling`` alternate; functions/roi_pooling_2d.py).

    Rois are integer-rounded; ``roi_extent = max(end - start + 1, 1)``; bin
    [ph] spans ``[floor(ph*stride), ceil((ph+1)*stride))`` clipped to the
    feature map; empty bins produce 0. Max over a rectangle is separable, so
    this runs as a row-max stage then a column-max stage, each a short static
    loop of gathers (bin extent is bounded by ``ceil(size/P) + 1``).
    """
    n, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size
    feats = features.reshape(n * h, w, c)
    rois = jax.lax.stop_gradient(rois.astype(jnp.float32))

    def bin_bounds(lo, hi, axis_size):
        lo_i = jnp.round(lo * spatial_scale)
        hi_i = jnp.round(hi * spatial_scale)
        extent = jnp.maximum(hi_i - lo_i + 1.0, 1.0)
        stride = extent / p
        ph = jnp.arange(p, dtype=jnp.float32)
        bstart = jnp.floor(ph[None, :] * stride[:, None]) + lo_i[:, None]
        bend = jnp.ceil((ph[None, :] + 1.0) * stride[:, None]) + lo_i[:, None]
        bstart = jnp.clip(bstart, 0.0, axis_size).astype(jnp.int32)
        bend = jnp.clip(bend, 0.0, axis_size).astype(jnp.int32)
        return bstart, bend  # (R, P) each

    ys, ye = bin_bounds(rois[:, 0], rois[:, 2], h)
    xs, xe = bin_bounds(rois[:, 1], rois[:, 3], w)
    smax_y = -(-h // p) + 1
    smax_x = -(-w // p) + 1

    chunk = min(roi_chunk, r)
    pad = (-r) % chunk
    n_chunks = (r + pad) // chunk

    def pad_to(x, value=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    ys_p, ye_p, xs_p, xe_p = map(pad_to, (ys, ye, xs, xe))
    idx_p = pad_to(roi_indices)

    neg_inf = jnp.asarray(-jnp.inf, dtype=features.dtype)

    def one_chunk(args):
        ys_c, ye_c, xs_c, xe_c, idx_c = args
        off = idx_c.astype(jnp.int32) * h  # (chunk,)

        # Stage 1: max over bin rows -> (chunk, P, W, C)
        rows0 = jnp.full((chunk, p, w, c), neg_inf, features.dtype)

        def row_step(s, acc):
            row = jnp.clip(ys_c + s, 0, h - 1) + off[:, None]  # (chunk, P)
            vals = jnp.take(feats, row.reshape(-1), axis=0).reshape(
                chunk, p, w, c
            )
            on = ((ys_c + s) < ye_c)[..., None, None]
            return jnp.maximum(acc, jnp.where(on, vals, neg_inf))

        t = jax.lax.fori_loop(0, smax_y, row_step, rows0)

        # Stage 2: max over bin cols -> (chunk, P, P, C)
        out0 = jnp.full((chunk, p, p, c), neg_inf, features.dtype)
        tt = t.transpose(0, 2, 1, 3).reshape(chunk * w, p, c)

        def col_step(s, acc):
            col = jnp.clip(xs_c + s, 0, w - 1)  # (chunk, P)
            base = jnp.arange(chunk, dtype=jnp.int32)[:, None] * w
            vals = jnp.take(tt, (base + col).reshape(-1), axis=0).reshape(
                chunk, p, p, c
            )
            vals = vals.transpose(0, 2, 1, 3)  # (chunk, P_y, P_x, C)
            on = ((xs_c + s) < xe_c)[:, None, :, None]
            return jnp.maximum(acc, jnp.where(on, vals, neg_inf))

        out = jax.lax.fori_loop(0, smax_x, col_step, out0)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    args = (
        ys_p.reshape(n_chunks, chunk, p),
        ye_p.reshape(n_chunks, chunk, p),
        xs_p.reshape(n_chunks, chunk, p),
        xe_p.reshape(n_chunks, chunk, p),
        idx_p.reshape(n_chunks, chunk),
    )
    if n_chunks == 1:
        out = one_chunk(tuple(a[0] for a in args))
    else:
        out = jax.lax.map(one_chunk, args).reshape(n_chunks * chunk, p, p, c)
    return out[:r]


POOLING_FUNCS = {
    "align": roi_align,
    "resize": crop_and_resize,
    "pooling": roi_pool,
}
