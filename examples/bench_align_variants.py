#!/usr/bin/env python
"""RoIAlign formulation shoot-out at the train-step shape.

The train step samples a static 512 rois per image, contiguous by image.
The production ``roi_align`` embeds the batch index into the y-axis
interpolation matrix (contraction over N*H rows), so its first einsum does
N x the per-image FLOPs and its intermediate keeps the *longer* spatial
axis when N*H exceeds W. A per-image batched formulation contracts over a
single image's axis (K = H, not N*H) and is free to keep the shorter axis.
This script measures both (fwd and fwd+bwd) plus precision/chunk variants
to pick the production formulation.

Usage: ./examples/bench_align_variants.py [--rois-per-image 512]
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

PEAK_FLOPS = 197e12


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rois-per-image", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--height", type=int, default=832)
    parser.add_argument("--width", type=int, default=1344)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=("bfloat16", "float32"))
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--reps", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.ops.roi_align import (
        _roi_align_matrices,
        roi_align,
    )
    from mask_rcnn_tpu.utils.profiling import time_fn_chained

    n = args.batch
    h, w, c = args.height // 16, args.width // 16, 1024
    r = args.rois_per_image
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.RandomState(0)
    feats = jax.device_put(
        rng.randn(n, h, w, c).astype(np.float32).astype(dt))
    y1 = rng.uniform(0, args.height - 140, (n, r))
    x1 = rng.uniform(0, args.width - 140, (n, r))
    rois_g = np.stack(
        [y1, x1, y1 + rng.uniform(30, 130, (n, r)),
         x1 + rng.uniform(30, 130, (n, r))], -1).astype(np.float32)
    rois_g = jax.device_put(rois_g)  # (n, r, 4) grouped by image
    rois_f = rois_g.reshape(n * r, 4)
    ridx = jax.device_put(np.repeat(np.arange(n, dtype=np.int32), r))

    def g(fn):
        def wrapped(x):
            def f(xx):
                return jnp.sum(fn(xx).astype(jnp.float32))
            val, grad = jax.value_and_grad(f)(x)
            return val + jnp.sum(grad.astype(jnp.float32))
        return wrapped

    def row(name, build, feed):
        ms = time_fn_chained(build, feed, reps=args.reps, iters=args.iters)
        try:
            ca = jax.jit(build).lower(feed).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            fl = float(ca.get("flops", float("nan")))
            by = float(ca.get("bytes accessed", float("nan")))
        except Exception:
            fl = by = float("nan")
        tf = fl / (ms / 1e3) / 1e12
        print(f"{name:44s} {ms:8.2f} ms {fl / 1e9:9.1f} GF {tf:7.1f} TF/s "
              f"{by / 1e9:8.2f} GB", flush=True)
        return ms

    # ---- production path ----
    prod = lambda f: roi_align(f, rois_f, ridx, out_size=7,
                               spatial_scale=1.0 / 16, bin_stride=2)

    # ---- per-image batched variants ----
    def grouped(f, keep="short", precision=jax.lax.Precision.HIGHEST,
                chunk=None):
        ay, ax = jax.vmap(
            lambda rc: _roi_align_matrices(
                rc, jnp.zeros(rc.shape[:1], jnp.int32), 1, h, w, 7, 7,
                1.0 / 16, 0, 2)
        )(rois_g)  # ay: (n, r, 7, h), ax: (n, r, 7, w)
        ay = ay.astype(f.dtype)
        ax = ax.astype(f.dtype)

        def run(ay_c, ax_c, f):
            y_first = (keep == "w") or (keep == "short" and w <= h)
            if y_first:
                t = jnp.einsum("nrph,nhwc->nrpwc", ay_c, f,
                               preferred_element_type=f.dtype,
                               precision=precision)
                return jnp.einsum("nrqw,nrpwc->nrpqc", ax_c, t,
                                  preferred_element_type=f.dtype,
                                  precision=precision)
            t = jnp.einsum("nrqw,nhwc->nrqhc", ax_c, f,
                           preferred_element_type=f.dtype,
                           precision=precision)
            return jnp.einsum("nrph,nrqhc->nrpqc", ay_c, t,
                              preferred_element_type=f.dtype,
                              precision=precision)

        if chunk is None or chunk >= r:
            out = run(ay, ax, f)
        else:
            nc = r // chunk
            out = jax.lax.map(
                lambda a: run(a[0], a[1], f),
                (ay.reshape(n, nc, chunk, 7, h).transpose(1, 0, 2, 3, 4),
                 ax.reshape(n, nc, chunk, 7, w).transpose(1, 0, 2, 3, 4)),
            ).transpose(1, 0, 2, 3, 4, 5).reshape(n, r, 7, 7, c)
        return out.reshape(n * r, 7, 7, c)

    # correctness vs production first
    ref = np.asarray(jax.jit(prod)(feats), np.float32)
    for keep in ("short", "w"):
        got = np.asarray(jax.jit(
            functools.partial(grouped, keep=keep))(feats), np.float32)
        err = np.abs(got - ref).max()
        print(f"grouped keep={keep}: max|diff| vs production = {err:.3e}")

    print(f"\nshapes: n={n} feat {h}x{w}x{c} rois/img={r} {args.dtype}")
    print(f"{'variant':44s} {'ms':>11s} {'GFLOP':>12s} {'TFLOP/s':>10s} "
          f"{'bytes':>11s}")

    row("production (flat, chunk512, HIGHEST)", prod, feats)
    row("production fwd+bwd", g(prod), feats)

    for keep in ("short", "w"):
        fn = functools.partial(grouped, keep=keep)
        row(f"grouped keep={keep} HIGHEST", fn, feats)
        row(f"grouped keep={keep} HIGHEST fwd+bwd", g(fn), feats)

    fn = functools.partial(grouped, keep="short",
                           precision=jax.lax.Precision.DEFAULT)
    row("grouped keep=short DEFAULT", fn, feats)
    row("grouped keep=short DEFAULT fwd+bwd", g(fn), feats)

    for chunk in (128, 256):
        fn = functools.partial(grouped, keep="short", chunk=chunk)
        row(f"grouped keep=short chunk{chunk}", fn, feats)
        row(f"grouped keep=short chunk{chunk} fwd+bwd", g(fn), feats)


if __name__ == "__main__":
    main()
