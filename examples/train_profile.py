#!/usr/bin/env python
"""Per-stage train-step profile for R-50-C4 at COCO scale (one TPU chip).

Splits the batch-2 832x1344 train step into its pipeline stages — backbone
+RPN forward, proposal NMS (12000->2000/img), target creation, RoI head
forward (align + res5 + box/mask branches), the fused loss tail, the full
forward loss, the full fwd+bwd gradient, and the optimizer update — timing
each chained in-graph (utils.profiling.time_fn_chained: dispatch-free
steady-state device time) with XLA cost-analysis FLOPs where available.

The stage times are measured on separately-jitted subgraphs, so their sum
exceeds the fused full step (XLA fuses across stage boundaries); the value
of the table is ATTRIBUTION — which stage owns the gap between the train
step's achieved MFU and the inference path's. Reference workload: the 180k
iteration x batch-16 recipe (reference examples/train_common.py:61-62,
122-133).

Usage: ./examples/train_profile.py [--batch 2] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

PEAK_FLOPS = 197e12  # TPU v5e bf16 peak
HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s


def cost_of(jitted, *args):
    """(flops, bytes accessed) from XLA cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (
            float(ca.get("flops", float("nan"))),
            float(ca.get("bytes accessed", float("nan"))),
        )
    except Exception:
        return float("nan"), float("nan")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=("bfloat16", "float32"))
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--layers", type=int, default=50, choices=(50, 101))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.data.synthetic import make_synthetic_train_batch
    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.models import MaskRCNNConfig, init_params
    from mask_rcnn_tpu.models import heads, rpn
    from mask_rcnn_tpu.models.mask_rcnn import (
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
    from mask_rcnn_tpu.models.train_model import train_loss
    from mask_rcnn_tpu.utils.profiling import (
        time_fn_chained,
        time_train_steps_chained,
    )

    h, w = 832, 1344
    n = args.batch
    cfg = MaskRCNNConfig(
        n_fg_class=80,
        n_layers=args.layers,
        min_size=800,
        max_size=1333,
        anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
        compute_dtype=args.dtype,
    )
    p_cfg = ProposalTargetConfig()
    a_cfg = AnchorTargetConfig()

    rng = np.random.RandomState(0)
    batch = {
        k: jax.device_put(v)
        for k, v in make_synthetic_train_batch(n, h, w, rng).items()
    }
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    optimizer, _ = make_optimizer(params, 0.02, 1000)
    state = jax.device_put(create_train_state(params, optimizer))
    key = jax.device_put(jax.random.PRNGKey(0))

    cparams = jax.jit(lambda p: cast_params(p, cfg.compute_dtype))(params)
    img_size = (h, w)

    # ---- materialize stage inputs once (device-resident) ----
    fwd_bb = jax.jit(
        lambda img: forward_backbone_rpn(cparams, cfg, img, train=True)
    )
    feats, rpn_locs, rpn_scores, anchors = jax.block_until_ready(
        fwd_bb(batch["image"])
    )

    def do_propose(locs):
        return rpn.propose_batch(
            jax.lax.stop_gradient(locs.astype(jnp.float32)),
            jax.lax.stop_gradient(rpn_scores.astype(jnp.float32)),
            anchors, img_size, batch["scale"], cfg.proposal, train=True,
        )

    rois, rois_valid = jax.block_until_ready(jax.jit(do_propose)(rpn_locs))

    def do_ptargets(r):
        key_p = jax.random.fold_in(key, 0)
        return jax.vmap(
            lambda k, rr, rv, b, l, bv, m: proposal_targets(
                k, rr, rv, b, l, bv, m, p_cfg,
                cfg.loc_normalize_mean, cfg.loc_normalize_std,
                mask_packed=True,
            )
        )(jax.random.split(key_p, n), r, rois_valid, batch["bbox"],
          batch["label"], batch["bbox_valid"], batch["mask"])

    sample_rois, _, _, _ = jax.block_until_ready(jax.jit(do_ptargets)(rois))

    def do_atargets(b):
        key_a = jax.random.fold_in(key, 1)
        return jax.vmap(
            lambda k, bb, bv: anchor_targets(k, bb, bv, anchors, img_size,
                                             a_cfg)
        )(jax.random.split(key_a, n), b, batch["bbox_valid"])

    s = p_cfg.n_sample
    q = min(int(round(s * p_cfg.pos_ratio)), s)
    mask_subset = (
        jnp.arange(n, dtype=jnp.int32)[:, None] * s
        + jnp.arange(q, dtype=jnp.int32)[None, :]
    ).reshape(-1)

    def do_head(f):
        # grouped (N, S, 4) rois: the production per-image batched align.
        return heads.head_forward(
            cparams["head"], f, sample_rois, None,
            roi_size=cfg.roi_size, spatial_scale=1.0 / cfg.feat_stride,
            pred_bbox=True, pred_mask=True,
            pooling_func=pooling_func(cfg),
            sampling_ratio=cfg.sampling_ratio, mask_subset=mask_subset,
        )

    def do_loss(img):
        return train_loss(params, cfg, {**batch, "image": img}, key,
                          anchor_cfg=a_cfg, proposal_cfg=p_cfg)[0]

    def grad_sum(grads):
        # Fold every gradient leaf into the chained scalar — without this
        # the fold-in uses only the loss value and XLA dead-code-eliminates
        # the entire backward pass from the timed graph.
        return sum(
            jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(grads)
        )

    def do_grad(img):
        loss, grads = jax.value_and_grad(
            lambda p: train_loss(p, cfg, {**batch, "image": img}, key,
                                 anchor_cfg=a_cfg, proposal_cfg=p_cfg)[0]
        )(params)
        return loss + grad_sum(grads)

    def do_backbone_grad(img):
        # grads wrt the f32 master params with the bf16 cast INSIDE the
        # graph, exactly like train_loss — passing uncast params would
        # silently measure f32 convs.
        def f(p, i):
            cp = cast_params(p, cfg.compute_dtype)
            feats, locs, scores, _ = forward_backbone_rpn(
                cp, cfg, i, train=True
            )
            return (
                jnp.sum(feats.astype(jnp.float32))
                + jnp.sum(locs.astype(jnp.float32))
                + jnp.sum(scores.astype(jnp.float32))
            )

        loss, grads = jax.value_and_grad(f)(params, img)
        return loss + grad_sum(grads)

    def do_head_grad(f):
        def g(hp, ff):
            chp = cast_params(hp, cfg.compute_dtype)
            out = heads.head_forward(
                chp, ff, sample_rois, None,
                roi_size=cfg.roi_size, spatial_scale=1.0 / cfg.feat_stride,
                pred_bbox=True, pred_mask=True,
                pooling_func=pooling_func(cfg),
                sampling_ratio=cfg.sampling_ratio, mask_subset=mask_subset,
            )
            return sum(
                jnp.sum(v.astype(jnp.float32)) for v in out.values()
            )

        loss, grads = jax.value_and_grad(g)(params["head"], f)
        return loss + grad_sum(grads)

    step_fn = make_train_step(cfg, optimizer)

    rows = []

    def stage(name, build, feed, jitted_for_flops, *flop_args):
        ms = time_fn_chained(build, feed, reps=args.reps, iters=args.iters)
        fl, by = (cost_of(jitted_for_flops, *flop_args)
                  if jitted_for_flops else (float("nan"), float("nan")))
        rows.append((name, ms, fl))
        tf = fl / (ms / 1e3) / 1e12 if np.isfinite(fl) else float("nan")
        # roofline floor: max(compute-bound, HBM-bound) time. "bytes
        # accessed" counts every HLO operand/result, so fusion makes the
        # true traffic lower — the floor is conservative (high); achieved%
        # of it can exceed 100 only through cache reuse, never the reverse.
        floor = max(fl / PEAK_FLOPS, by / HBM_BW) * 1e3
        bound = "mem" if by / HBM_BW > fl / PEAK_FLOPS else "flop"
        print(f"{name:34s} {ms:8.2f} ms {fl/1e9:9.1f} GF {tf:7.1f} TF/s "
              f"{tf*1e12/PEAK_FLOPS:6.1%}  {by/1e9:7.2f} GB "
              f"floor={floor:6.2f}ms[{bound}] {floor/ms:6.1%}", flush=True)

    print(f"R-{args.layers}-C4 train profile @ {h}x{w} b{n} {args.dtype} "
          f"(v5e peak {PEAK_FLOPS/1e12:.0f} TF bf16, {HBM_BW/1e9:.0f} GB/s)")
    print(f"{'stage':34s} {'ms':>11s} {'GFLOP':>12s} {'TFLOP/s':>10s} "
          f"{'MFU':>6s} {'bytes':>10s} {'roofline floor':>20s} {'ach.':>6s}")
    stage("backbone+rpn fwd", lambda i: fwd_bb(i), batch["image"],
          fwd_bb, batch["image"])
    stage("propose: NMS 12000->2000 x2", do_propose, rpn_locs,
          jax.jit(do_propose), rpn_locs)
    stage("targets: proposal", do_ptargets, rois,
          jax.jit(do_ptargets), rois)
    stage("targets: anchor", do_atargets, batch["bbox"],
          jax.jit(do_atargets), batch["bbox"])
    stage("head fwd (align+res5+branches)", do_head, feats,
          jax.jit(do_head), feats)
    stage("backbone fwd+bwd", do_backbone_grad, batch["image"],
          jax.jit(do_backbone_grad), batch["image"])
    stage("head fwd+bwd", do_head_grad, feats,
          jax.jit(do_head_grad), feats)
    stage("fwd loss (fused total)", do_loss, batch["image"],
          jax.jit(do_loss), batch["image"])
    stage("fwd+bwd (value_and_grad)", do_grad, batch["image"],
          jax.jit(do_grad), batch["image"])

    full_ms = time_train_steps_chained(
        step_fn, state, batch, key, reps=args.reps, iters=args.iters
    )
    fl, by = cost_of(jax.jit(step_fn), state, batch, key)
    tf = fl / (full_ms / 1e3) / 1e12
    floor = max(fl / PEAK_FLOPS, by / HBM_BW) * 1e3
    print(f"{'full step (scan, fused)':34s} {full_ms:8.2f} ms "
          f"{fl/1e9:9.1f} GF {tf:7.1f} TF/s {tf*1e12/PEAK_FLOPS:6.1%}  "
          f"{by/1e9:7.2f} GB floor={floor:6.2f}ms {floor/full_ms:6.1%}")
    by = {name: ms for name, ms, _ in rows}
    print(f"\nderived: bwd-only ~= "
          f"{by['fwd+bwd (value_and_grad)'] - by['fwd loss (fused total)']:.2f} ms, "
          f"optimizer+state ~= {full_ms - by['fwd+bwd (value_and_grad)']:.2f} ms, "
          f"non-backbone fwd overhead ~= "
          f"{by['fwd loss (fused total)'] - by['backbone+rpn fwd'] - by['head fwd (align+res5+branches)']:.2f} ms")


if __name__ == "__main__":
    main()
