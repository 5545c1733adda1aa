#!/usr/bin/env python
"""FLOPs / MFU accounting for R-50-C4 at COCO scale on one TPU chip.

Measures the jitted inference and train steps (f32 and bf16) at 832x1344,
reads the compiled graph's FLOP count from XLA cost analysis, and prints
achieved TFLOP/s + MFU against the chip's bf16 peak. Also splits the train
step into forward-loss vs full fwd+bwd+update time so backward-pass work is
attributable (VERDICT round-2 directive #4).

Usage: ./examples/mfu_report.py [--batch 2] [--iters 20] [--layers 50]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

# TPU v5e (v5 lite) public peak: 197 TFLOP/s bf16. f32 matmuls run as
# multiple bf16 passes, so MFU is reported against the bf16 peak for both.
PEAK_FLOPS = 197e12


def timed_scan_steps(step, state, batch, key, reps=12, iters=3):
    """Steady-state seconds per train step (see
    utils.profiling.time_train_steps_chained)."""
    from mask_rcnn_tpu.utils.profiling import time_train_steps_chained

    return time_train_steps_chained(
        step, state, batch, key, reps=reps, iters=iters
    ) / 1e3


def graph_flops(lowered_compiled):
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def make_batch(n, h, w, rng):
    from mask_rcnn_tpu.data.synthetic import make_synthetic_train_batch

    return make_synthetic_train_batch(n, h, w, rng)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--layers", type=int, default=50, choices=(50, 101))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.models import MaskRCNNConfig, init_params, predict_step
    from mask_rcnn_tpu.models.train_model import train_loss

    h, w = 832, 1344
    n = args.batch
    rng = np.random.RandomState(0)
    batch = {k: jax.device_put(v) for k, v in make_batch(n, h, w, rng).items()}
    images1 = jax.device_put(
        jnp.asarray((rng.randn(1, h, w, 3) * 60).astype(np.float32))
    )
    sizes1 = jax.device_put(jnp.asarray([[640.0, 1066.0]], np.float32))
    scales1 = jax.device_put(jnp.asarray([1.25], np.float32))
    key = jax.device_put(jax.random.PRNGKey(0))

    def emit(name, t, fl, imgs):
        tf = fl / t / 1e12 if np.isfinite(fl) else float("nan")
        mfu = tf * 1e12 / PEAK_FLOPS
        print(f"{name:28s} {t*1e3:8.1f} {fl/1e9:9.1f} {tf:8.1f} "
              f"{mfu:6.1%} {imgs:7.1f}", flush=True)

    print(f"R-{args.layers}-C4 @ {h}x{w}, TPU v5e "
          f"(peak {PEAK_FLOPS/1e12:.0f} TF bf16)")
    print(f"{'stage':28s} {'ms':>8s} {'GFLOP':>9s} {'TFLOP/s':>8s} "
          f"{'MFU':>6s} {'img/s':>7s}")
    for dtype in ("float32", "bfloat16"):
        cfg = MaskRCNNConfig(
            n_fg_class=80,
            n_layers=args.layers,
            min_size=800,
            max_size=1333,
            anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
            compute_dtype=dtype,
        )
        params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
        optimizer, _ = make_optimizer(params, 0.02, 1000)
        state = jax.device_put(create_train_state(params, optimizer))

        from mask_rcnn_tpu.utils.profiling import time_fn_chained

        # inference (chained in-graph: dispatch-free device time)
        infer = jax.jit(lambda p, i, s, sc: predict_step(p, cfg, i, s, sc))
        lowered = infer.lower(params, images1, sizes1, scales1).compile()
        t = time_fn_chained(
            lambda i: predict_step(params, cfg, i, sizes1, scales1),
            images1, reps=20, iters=args.iters,
        ) / 1e3
        fl = graph_flops(lowered)
        emit(f"infer b1 {dtype}", t, fl, 1 / t)

        # forward loss only (chained on the image tensor)
        fwd = jax.jit(lambda p, b, k: train_loss(p, cfg, b, k)[0])
        lowered = fwd.lower(params, batch, key).compile()
        t = time_fn_chained(
            lambda img: train_loss(
                params, cfg, {**batch, "image": img}, key
            )[0],
            batch["image"], reps=20, iters=args.iters,
        ) / 1e3
        fl = graph_flops(lowered)
        emit(f"train fwd-loss b{n} {dtype}", t, fl, n / t)

        # full train step (scan of real consecutive steps)
        step_fn = make_train_step(cfg, optimizer)
        lowered = jax.jit(step_fn).lower(state, batch, key).compile()
        t = timed_scan_steps(step_fn, state, batch, key, iters=args.iters)
        fl = graph_flops(lowered)
        emit(f"train step b{n} {dtype}", t, fl, n / t)


if __name__ == "__main__":
    main()
