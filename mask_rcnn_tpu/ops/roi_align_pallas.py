"""Pallas TPU kernel for the fused RoIAlign contraction.

The einsum formulation (ops/roi_align.py) materializes a
``(R, P, spatial, C)`` intermediate in HBM — the dominant cost of the op.
This kernel performs both interpolation matmuls per roi block inside VMEM,
so HBM traffic drops to: features once per channel block + the interpolation
matrices + the output.

Grid layout ``(n_channel_blocks, n_roi_blocks)`` with the feature block
indexed only by the channel program: consecutive roi-block programs reuse
the resident feature block instead of refetching it.

The backward pass is registered via ``jax.custom_vjp`` as the transpose
einsums (matmuls, no scatter — same property as the forward).

STATUS: EXPERIMENTAL, not wired as the default. Measured on v5e (1000 rois,
(1, 52, 84, 1024) bf16 features, P=14):
  * v1 (4D transpose between matmuls): Mosaic lowering >10 min, aborted;
  * v2 below (pre-flattened feature slabs + per-roi small dots): compiles in
    ~7 s, exact, 14.4 ms;
  * v3 (block-diagonal Ax so stage 2 is one (112, 672)x(672, 1792) matmul):
    compiles in ~5 min, exact, 14.1 ms;
  * production XLA einsum path (ops/roi_align.py): 12.2 ms.
The in-VMEM relayout between the h- and w-contractions costs more than the
HBM round-trip it avoids on this toolchain, so the einsum path stays the
default. Kept for re-evaluation on newer Mosaic releases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mask_rcnn_tpu.ops.roi_align import _roi_align_matrices


def _fused_kernel(ay_ref, ax_ref, f_ref, out_ref):
    """One (channel-block, roi-block) tile.

    ay_ref: (RB, P, NH)   interpolation rows (dtype = feature dtype)
    ax_ref: (RB, P, W)
    f_ref:  (NH, W, CB)   resident feature slab
    out_ref:(RB, P, P, CB)
    """
    rb, p, nh = ay_ref.shape
    w = ax_ref.shape[2]
    cb = f_ref.shape[2]

    f = f_ref[:].reshape(nh, w * cb)
    ay = ay_ref[:].reshape(rb * p, nh)
    # t[r*p, w*cb] = sum_h ay @ f     (f32 accumulation on the MXU)
    t = jnp.dot(ay, f, preferred_element_type=jnp.float32)
    t = t.reshape(rb, p, w, cb).transpose(0, 2, 1, 3).reshape(rb, w, p * cb)
    # out[r, q, p*cb] = sum_w ax[r, q, w] * t[r, w, p*cb]
    o = jax.lax.dot_general(
        ax_ref[:].astype(jnp.float32),
        t,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o = o.reshape(rb, p, p, cb).transpose(0, 2, 1, 3)  # (r, p_y, q_x, cb)
    out_ref[:] = o.astype(out_ref.dtype)


def _fused_kernel_v2(ay_ref, ax_ref, f_ref, out_ref):
    """Variant avoiding the big 4D relayout: f arrives pre-flattened
    (1, NH, W*CB); the second contraction runs per-roi on small tensors.

    ay_ref: (RB, P, NH); ax_ref: (RB, P, W); f_ref: (1, NH, W*CB);
    out_ref: (RB, P, P, CB).
    """
    rb, p, nh = ay_ref.shape
    w = ax_ref.shape[2]
    cb = out_ref.shape[3]

    f2 = f_ref[0]  # (NH, W*CB)
    ay = ay_ref[:].reshape(rb * p, nh)
    t = jnp.dot(ay, f2, preferred_element_type=jnp.float32)  # (RB*P, W*CB)
    for r in range(rb):  # static unroll
        t_r = t[r * p:(r + 1) * p].reshape(p, w, cb)
        o = jax.lax.dot_general(
            ax_ref[r].astype(jnp.float32),
            t_r,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P_q, P_p, CB)
        out_ref[r] = o.transpose(1, 0, 2).astype(out_ref.dtype)


def roi_align_fused_v2(features, rois, roi_indices, out_size, spatial_scale,
                       sampling_ratio=0, roi_block=8, channel_block=128):
    """Forward-only v2 kernel (pre-flattened feature slabs)."""
    n, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size
    nh = n * h
    rb = roi_block
    cb = min(channel_block, c)
    assert c % cb == 0
    ncb = c // cb
    pad = (-r) % rb
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    idx_p = jnp.pad(roi_indices, (0, pad))
    rp = r + pad

    ay, ax = _roi_align_matrices(
        rois_p, idx_p, n, h, w, p, p, spatial_scale, sampling_ratio
    )
    ay = ay.astype(features.dtype)
    ax = ax.astype(features.dtype)
    # (NH, W, C) -> (NCB, NH, W*CB): one cheap XLA relayout outside the
    # kernel so programs read 2D slabs directly.
    fb = features.reshape(nh, w, ncb, cb).transpose(2, 0, 1, 3).reshape(
        ncb, nh, w * cb
    )

    out = pl.pallas_call(
        _fused_kernel_v2,
        out_shape=jax.ShapeDtypeStruct((rp, p, p, c), features.dtype),
        grid=(ncb, rp // rb),
        in_specs=[
            pl.BlockSpec((rb, p, nh), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, p, w), lambda ci, ri: (ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, w * cb), lambda ci, ri: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, p, p, cb), lambda ci, ri: (ri, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
    )(ay, ax, fb)
    return out[:r]


def _forward(features, rois, roi_indices, out_size, spatial_scale,
             sampling_ratio, roi_block, channel_block):
    n, h, w, c = features.shape
    r = rois.shape[0]
    p = out_size
    nh = n * h

    rb = roi_block
    cb = min(channel_block, c)
    assert c % cb == 0, (c, cb)
    pad = (-r) % rb
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    idx_p = jnp.pad(roi_indices, (0, pad))
    rp = r + pad

    ay, ax = _roi_align_matrices(
        rois_p, idx_p, n, h, w, p, p, spatial_scale, sampling_ratio
    )
    ay = ay.astype(features.dtype)
    ax = ax.astype(features.dtype)
    feats = features.reshape(nh, w, c)

    grid = (c // cb, rp // rb)
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((rp, p, p, c), features.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rb, p, nh), lambda ci, ri: (ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rb, p, w), lambda ci, ri: (ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nh, w, cb), lambda ci, ri: (0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, p, p, cb), lambda ci, ri: (ri, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
    )(ay, ax, feats)
    return out[:r], (ay, ax)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def roi_align_fused(features, rois, roi_indices, out_size, spatial_scale,
                    sampling_ratio=0, roi_block=8, channel_block=256):
    """Drop-in replacement for ops.roi_align.roi_align on TPU.

    Same Detectron semantics (the interpolation matrices are shared with the
    einsum path); only the contraction engine differs.
    """
    out, _ = _forward(features, rois, roi_indices, out_size, spatial_scale,
                      sampling_ratio, roi_block, channel_block)
    return out


def _fwd(features, rois, roi_indices, out_size, spatial_scale,
         sampling_ratio, roi_block, channel_block):
    out, (ay, ax) = _forward(
        features, rois, roi_indices, out_size, spatial_scale,
        sampling_ratio, roi_block, channel_block,
    )
    return out, (ay, ax, features.shape, features.dtype)


def _bwd(out_size, spatial_scale, sampling_ratio, roi_block, channel_block,
         res, g):
    ay, ax, fshape, fdtype = res
    n, h, w, c = fshape
    r = g.shape[0]
    pad = ay.shape[0] - r
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0), (0, 0)))
    # dF[h, w, c] = sum_r sum_p sum_q Ay[r,p,h] Ax[r,q,w] g[r,p,q,c]
    t = jnp.einsum(
        "rqw,rpqc->rpwc", ax, g, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    df = jnp.einsum(
        "rph,rpwc->hwc", ay, t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    df = df.reshape(n, h, w, c).astype(fdtype)
    return df, None, None


roi_align_fused.defvjp(_fwd, _bwd)
