"""Engine integration: a miniature end-to-end train() on the CPU mesh,
plus logging/visualization unit checks."""

import json
import os.path as osp

import numpy as np
import pytest


def make_dataset(n=4, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    examples = []
    for _ in range(n):
        img = rng.randint(0, 100, (h, w, 3)).astype(np.uint8)
        y1, x1 = rng.randint(5, 20, 2)
        y2, x2 = y1 + 25, x1 + 30
        img[y1:y2, x1:x2] = 200
        mask = np.zeros((1, h, w), np.int32)
        mask[0, y1:y2, x1:x2] = 1
        examples.append(
            (
                img,
                np.asarray([[y1, x1, y2, x2]], np.float32),
                np.zeros((1,), np.int32),
                mask,
            )
        )

    class DS:
        class_names = ("thing",)

        def __len__(self):
            return len(examples)

        def __getitem__(self, i):
            return examples[i]

    return DS()


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    from mask_rcnn_tpu.data import MaskRCNNTransform, TrainLoader
    from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator
    from mask_rcnn_tpu.engine.loop import train
    from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig

    ds = make_dataset()
    cfg = MaskRCNNConfig(
        n_fg_class=1,
        min_size=64,
        max_size=64,
        anchor_scales=(1.0, 2.0),
        proposal=ProposalConfig(
            n_train_pre_nms=64, n_train_post_nms=16,
            n_test_pre_nms=64, n_test_post_nms=16,
        ),
        detections_per_im=4,
    )
    loader = TrainLoader(
        ds,
        MaskRCNNTransform(64, 64, cfg.mean, train=True,
                          rng=np.random.RandomState(0)),
        batch_size=2,
        max_boxes=2,
        min_size=64,
        max_size=64,
    )
    evaluator = InstanceSegmentationEvaluator(
        ds, ds.class_names, kind="voc", max_examples=1
    )
    out = str(tmp_path)
    # log_interval > total steps: the 'main/loss' assertion below then
    # relies on the end-of-training accumulator flush, which is what keeps
    # short runs (rehearsal smoke configs) from logging no losses at all.
    result = train(
        cfg, loader, out, max_epoch=1.0, evaluator=evaluator,
        log_interval=5, eval_interval_epochs=1.0,
    )
    assert result["iterations"] == 2
    # artifact contract
    assert osp.exists(osp.join(out, "params.yaml"))
    assert osp.exists(osp.join(out, "snapshot_model.npz"))
    with open(osp.join(out, "log")) as f:
        entries = json.load(f)
    assert any("main/loss" in e for e in entries)
    assert any("validation/main/map" in e for e in entries)
    # the flushed entry is stamped with the epoch its steps ran in (0),
    # not the post-loop epoch counter (1)
    flushed = [e for e in entries if "main/loss" in e]
    assert all(e["epoch"] == 0 for e in flushed)


def test_visualizations_render():
    from mask_rcnn_tpu.utils.visualizations import (
        draw_instance_bboxes,
        get_tile_image,
        label_colormap,
        visualize_instance_segmentation,
    )

    cmap = label_colormap()
    assert cmap.shape == (256, 3) and cmap.dtype == np.uint8
    img = np.zeros((50, 60, 3), np.uint8)
    bboxes = np.asarray([[5, 5, 30, 40]], np.float32)
    labels = np.asarray([1], np.int32)
    masks = np.zeros((1, 50, 60), bool)
    masks[0, 5:30, 5:40] = True
    viz = draw_instance_bboxes(img, bboxes, labels, 3, masks=masks,
                               scores=np.asarray([0.9]))
    assert viz.shape == img.shape and viz.sum() > 0
    panel = visualize_instance_segmentation(
        img, bboxes, labels, masks, bboxes, labels, masks,
        np.asarray([0.9]), 3,
    )
    assert panel.shape == (50, 120, 3)
    tile = get_tile_image([img, img, img])
    assert tile.shape == (100, 120, 3)


def test_log_report_and_params(tmp_path):
    from mask_rcnn_tpu.utils.logging import (
        LogReport,
        dump_params,
        git_hash,
        load_params_yaml,
    )

    out = str(tmp_path)
    log = LogReport(out)
    log.append({"iteration": 1, "main/loss": 2.0})
    log.append({"iteration": 2, "main/loss": np.float32(1.0)})
    with open(osp.join(out, "log")) as f:
        entries = json.load(f)
    assert entries[1]["main/loss"] == 1.0
    # append survives reload
    log2 = LogReport(out)
    assert len(log2.entries) == 2

    dump_params(out, {"model": "resnet50", "lr": 0.01})
    loaded = load_params_yaml(out)
    assert loaded["model"] == "resnet50"
    assert "hostname" in loaded
    assert git_hash() is None or len(git_hash()) >= 6


def test_train_state_npz_roundtrip(tmp_path):
    """save_train_state/restore_train_state: collective-free flat-npz codec
    must restore the full TrainState (params + optimizer trace + step)
    bit-exactly through an arbitrary optax opt_state tree."""
    import jax

    from mask_rcnn_tpu.engine import create_train_state, make_optimizer
    from mask_rcnn_tpu.models import init_params
    from mask_rcnn_tpu.utils.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from tests.test_parallel import tiny_cfg

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(3), cfg)
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=10)
    state = create_train_state(params, optimizer)
    state = state._replace(step=state.step + 7)

    d = str(tmp_path / "ck")
    save_train_state(d, jax.device_get(state))
    like = create_train_state(params, optimizer)
    restored = restore_train_state(d, jax.device_get(like))

    assert int(restored.step) == 7
    got = jax.tree.leaves(restored)
    want = jax.tree.leaves(jax.device_get(state))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_rejects_non_divisible_per_device_batch(tmp_path):
    """batch_size must divide by batch_size_per_device: a silent floor
    would run a different per-device batch than the LR/params.yaml
    accounting assumes (and leave devices idle)."""
    from mask_rcnn_tpu.data import MaskRCNNTransform, TrainLoader
    from mask_rcnn_tpu.engine.loop import train
    from mask_rcnn_tpu.models import MaskRCNNConfig

    ds = make_dataset(n=6)
    loader = TrainLoader(
        ds, MaskRCNNTransform(64, 64, mean=(0, 0, 0)), batch_size=3,
        max_boxes=4, min_size=64, max_size=64,
    )
    with pytest.raises(ValueError, match="multiple of"):
        train(
            MaskRCNNConfig(n_fg_class=1, min_size=64, max_size=64),
            loader, str(tmp_path), max_epoch=1.0,
            batch_size_per_device=2,
        )
