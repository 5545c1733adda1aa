#!/usr/bin/env python
"""Micro-attribution of the RoI-head fwd+bwd (the train step's top cost).

Times each head component separately — RoIAlign einsums, res5, the mask
branch, the avgpool+linear tail — forward and fwd+bwd, chained in-graph
(dispatch-free steady state), to locate where the head backward loses MFU
relative to its forward. Companion to examples/train_profile.py.

Usage: ./examples/head_profile.py [--rois 1024] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

PEAK_FLOPS = 197e12


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rois", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=("bfloat16", "float32"))
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.models import MaskRCNNConfig, init_params
    from mask_rcnn_tpu.models import heads
    from mask_rcnn_tpu.models.mask_rcnn import cast_params
    from mask_rcnn_tpu.models.resnet import res5_forward
    from mask_rcnn_tpu.ops.roi_align import roi_align
    from mask_rcnn_tpu.utils.profiling import time_fn_chained

    h, w = 832 // 16, 1344 // 16  # C4 feature grid
    n, r = args.batch, args.rois
    cfg = MaskRCNNConfig(n_fg_class=80, n_layers=50,
                         compute_dtype=args.dtype)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.RandomState(0)
    feats = jax.device_put(rng.randn(n, h, w, 1024).astype(np.float32)
                           .astype(dt))
    # realistic roi mix: uniform boxes over the image
    y1 = rng.uniform(0, 700, r)
    x1 = rng.uniform(0, 1200, r)
    rois = np.stack([y1, x1, y1 + rng.uniform(30, 130, r),
                     x1 + rng.uniform(30, 130, r)], 1).astype(np.float32)
    rois = jax.device_put(rois)
    ridx = jax.device_put(
        np.repeat(np.arange(n, dtype=np.int32), r // n))
    params = init_params(jax.random.PRNGKey(0), cfg)
    hp = jax.device_put(
        jax.jit(lambda p: cast_params(p, cfg.compute_dtype))(params)["head"]
    )
    pooled = jax.block_until_ready(jax.jit(
        lambda f: roi_align(f, rois, ridx, out_size=7,
                            spatial_scale=1.0 / 16, bin_stride=2)
    )(feats))
    res5_out = jax.block_until_ready(jax.jit(
        lambda x: res5_forward(hp["res5"], x, stride=1))(pooled))
    q = r // 4
    mask_in = res5_out[:q]

    def g(fn):
        """fwd+bwd wrapper: scalar folded over every grad leaf."""
        def wrapped(x):
            def f(xx):
                out = fn(xx)
                return jnp.sum(out.astype(jnp.float32))
            val, grad = jax.value_and_grad(f)(x)
            return val + jnp.sum(grad.astype(jnp.float32))
        return wrapped

    def row(name, build, feed):
        ms = time_fn_chained(build, feed, reps=args.reps, iters=args.iters)
        try:
            ca = (jax.jit(build).lower(feed).compile().cost_analysis())
            if isinstance(ca, list):
                ca = ca[0]
            fl = float(ca.get("flops", float("nan")))
            by = float(ca.get("bytes accessed", float("nan")))
        except Exception:
            fl = by = float("nan")
        tf = fl / (ms / 1e3) / 1e12
        print(f"{name:38s} {ms:8.2f} ms {fl/1e9:9.1f} GF {tf:7.1f} TF/s "
              f"{tf*1e12/PEAK_FLOPS:6.1%} {by/1e9:8.2f} GB", flush=True)
        return ms

    print(f"head micro-profile: {r} rois, b{n} feats {h}x{w} {args.dtype}")
    print(f"{'component':38s} {'ms':>11s} {'GFLOP':>12s} {'TFLOP/s':>10s} "
          f"{'MFU':>6s} {'bytes':>9s}")

    al = lambda f: roi_align(f, rois, ridx, out_size=7,
                             spatial_scale=1.0 / 16, bin_stride=2)
    row("align flat fwd", al, feats)
    row("align flat fwd+bwd", g(al), feats)

    from mask_rcnn_tpu.ops.roi_align import roi_align_grouped
    rois_g = jax.device_put(np.asarray(rois).reshape(n, r // n, 4))
    alg = lambda f: roi_align_grouped(f, rois_g, out_size=7,
                                      spatial_scale=1.0 / 16, bin_stride=2)
    row("align grouped fwd", alg, feats)
    row("align grouped fwd+bwd", g(alg), feats)

    r5 = lambda x: res5_forward(hp["res5"], x, stride=1)
    row("res5 fwd", r5, pooled)
    row("res5 fwd+bwd", g(r5), pooled)

    def mask_branch(x):
        d = jax.nn.relu(
            heads.deconv2x2_s2(x, hp["deconv6"]["W"], hp["deconv6"]["b"]))
        return jax.lax.conv_general_dilated(
            d, hp["mask"]["W"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + hp["mask"]["b"]

    row(f"mask branch fwd ({q} rois)", mask_branch, mask_in)
    row(f"mask branch fwd+bwd ({q} rois)", g(mask_branch), mask_in)

    def tail(x):
        p5 = jnp.mean(x, axis=(1, 2))
        return (p5 @ hp["cls_loc"]["W"] + hp["cls_loc"]["b"]).astype(
            jnp.float32).sum() + (
            p5 @ hp["score"]["W"] + hp["score"]["b"]).astype(
            jnp.float32).sum()

    row("avgpool+linears fwd", tail, res5_out)
    row("avgpool+linears fwd+bwd",
        g(lambda x: tail(x).reshape(1)), res5_out)

    def full(f):
        out = heads.head_forward(
            hp, f, rois_g, None, roi_size=14, spatial_scale=1.0 / 16,
            pred_bbox=True, pred_mask=True, sampling_ratio=0,
            mask_subset=jnp.arange(q, dtype=jnp.int32),
        )
        return sum(v.astype(jnp.float32).sum() for v in out.values())

    row("full head fwd", full, feats)
    row("full head fwd+bwd", g(lambda f: full(f).reshape(1)), feats)


if __name__ == "__main__":
    main()
