#!/usr/bin/env python
"""Overfit-two-synthetic-images training smoke test (the reference's
tests/models_tests/check_mask_rcnn_train_chain.py flow, TPU-native).

Human-run validation that the full training path (proposals -> on-device
targets -> 5 losses -> SGD) optimizes: loss should fall from ~2.6 to <1.8
within 400 steps and correct-class detections should appear near the
synthetic rectangles. Takes ~6 minutes on one TPU chip.

From-scratch notes: the frozen-affine recipe is tuned for pretrained
weights (reference always starts from ImageNet); from scratch use
clip_norm and expect slow early progress.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.models import (
        MaskRCNNConfig,
        ProposalConfig,
        init_params,
    )
    from mask_rcnn_tpu.models.api import MaskRCNNResNet
    from mask_rcnn_tpu.models.targets import (
        AnchorTargetConfig,
        ProposalTargetConfig,
    )

    cfg = MaskRCNNConfig(
        n_fg_class=2, min_size=256, max_size=320,
        anchor_scales=(2.0, 4.0, 8.0),
        proposal=ProposalConfig(
            n_train_pre_nms=2000, n_train_post_nms=256,
            n_test_pre_nms=1000, n_test_post_nms=100,
        ),
        detections_per_im=10,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer, _ = make_optimizer(
        params, base_lr=2e-3, total_steps=100000, clip_norm=10.0
    )
    state = jax.device_put(create_train_state(params, optimizer))
    step = jax.jit(
        make_train_step(
            cfg, optimizer,
            proposal_cfg=ProposalTargetConfig(n_sample=64),
            anchor_cfg=AnchorTargetConfig(n_sample=64),
        ),
        donate_argnums=(0,),
    )

    rng = np.random.RandomState(0)
    h, w, g = 256, 320, 4
    imgs = rng.randn(2, h, w, 3).astype(np.float32) * 5 + 60
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    valid = np.zeros((2, g), bool)
    masks = np.zeros((2, g, h, w), np.uint8)
    specs = [
        [(40, 50, 140, 160, 0), (160, 180, 230, 290, 1)],
        [(30, 200, 120, 300, 1), (150, 40, 240, 140, 0)],
    ]
    for i, sp in enumerate(specs):
        for j, (y1, x1, y2, x2, c) in enumerate(sp):
            imgs[i, y1:y2, x1:x2] = 140 + 80 * c
            boxes[i, j] = (y1, x1, y2, x2)
            labels[i, j] = c
            valid[i, j] = True
            masks[i, j, y1:y2, x1:x2] = 1
    mean = np.asarray(cfg.mean, np.float32)
    batch = {
        "image": jax.device_put(jnp.asarray(imgs - mean)),
        "bbox": jax.device_put(jnp.asarray(boxes)),
        "label": jax.device_put(jnp.asarray(labels)),
        "bbox_valid": jax.device_put(jnp.asarray(valid)),
        "mask": jax.device_put(jnp.asarray(masks)),
        "scale": jax.device_put(jnp.ones((2,), jnp.float32)),
    }

    t0 = time.time()
    first = None
    for it in range(400):
        key = jax.device_put(jax.random.fold_in(jax.random.PRNGKey(7), it))
        state, metrics = step(state, batch, key)
        if it % 50 == 0 or it == 399:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            if first is None:
                first = m["loss"]
            print(
                f"it {it:4d} loss {m['loss']:.3f} "
                f"rpn_cls {m['rpn_cls_loss']:.3f} "
                f"roi_cls {m['roi_cls_loss']:.3f} "
                f"mask {m['roi_mask_loss']:.3f}"
            )
    last = m["loss"]
    print(f"400 steps in {time.time() - t0:.0f}s; loss {first:.2f} -> "
          f"{last:.2f}")

    model = MaskRCNNResNet.from_config(cfg, jax.device_get(state.params))
    model.score_thresh = 0.3
    bb, mk, lb, sc = model.predict([imgs[0].transpose(2, 0, 1)])
    print(f"detections on train image: {len(bb[0])}")
    for b, l, s in zip(bb[0], lb[0], sc[0]):
        print(f"  label {int(l)} score {s:.2f} box {np.round(b, 1)}")
    assert np.isfinite(last) and last < first, "training did not optimize"
    print("OK")


if __name__ == "__main__":
    main()
