"""The migration guide (docs/migration.md) promises a counterpart for
every public reference symbol — pin the import surface so it cannot rot."""


def test_ops_surface():
    from mask_rcnn_tpu import ops

    for name in [
        "roi_align", "roi_pool", "crop_and_resize", "affine_channel",
        "fold_batch_norm", "nms_padded", "generate_anchor_base",
        "enumerate_shifted_anchors", "loc2bbox", "bbox2loc", "bbox_iou",
        "clip_boxes", "softmax_cross_entropy", "sigmoid_cross_entropy",
        "smooth_l1_loss",
    ]:
        assert callable(getattr(ops, name)), name


def test_models_surface():
    from mask_rcnn_tpu import models

    for name in [
        "MaskRCNNResNet", "MaskRCNNConfig", "init_params", "predict_step",
        "ProposalConfig", "AnchorTargetConfig", "ProposalTargetConfig",
        "anchor_targets", "proposal_targets", "train_loss",
    ]:
        assert getattr(models, name) is not None, name
    assert callable(models.MaskRCNNResNet.predict)
    assert callable(models.MaskRCNNResNet.predict_stream)


def test_data_surface():
    from mask_rcnn_tpu import data

    for name in [
        "COCOInstanceSegmentationDataset",
        "VOC2012InstanceSegmentationDataset",
        "SBDInstanceSegmentationDataset", "VOCLikeDataset",
        "IndexingDataset", "MaskRcnnDataset", "MaskRCNNTransform",
        "TrainLoader", "pad_batch",
    ]:
        assert getattr(data, name) is not None, name


def test_utils_flat_surface_matches_reference():
    # reference chainer_mask_rcnn/utils/__init__.py re-exports
    from mask_rcnn_tpu import utils

    for name in [
        "git_hash", "batch", "eval_instseg_voc", "eval_instseg_coco",
        "get_bbox_overlap", "get_mask_overlap", "instance_boxes2label",
        "label2instance_boxes", "mask_to_bbox", "draw_instance_boxes",
        "draw_instance_bboxes", "visualize_instance_segmentation",
    ]:
        assert callable(getattr(utils, name)), name


def test_engine_surface():
    from mask_rcnn_tpu import engine
    from mask_rcnn_tpu.engine.evaluator import (
        InstanceSegmentationEvaluator,
        VisReport,
    )
    from mask_rcnn_tpu.engine.loop import train

    assert callable(train)
    assert InstanceSegmentationEvaluator is not None
    assert VisReport is not None
    for name in ["make_optimizer", "make_train_step", "step_lr_schedule",
                 "create_train_state", "TrainState", "trainable_mask"]:
        assert getattr(engine, name) is not None, name


def test_parallel_surface():
    from mask_rcnn_tpu import parallel

    for name in ["make_mesh", "make_parallel_train_step", "batch_sharding",
                 "replicated", "shard_batch", "local_batch_slice",
                 "process_zero"]:
        assert getattr(parallel, name) is not None, name


def test_deprecated_alias_warns():
    import warnings

    import numpy as np

    from mask_rcnn_tpu.utils import draw_instance_boxes

    img = np.zeros((8, 8, 3), np.uint8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = draw_instance_boxes(
            img, np.zeros((0, 4), np.float32), np.zeros((0,), np.int32), 3
        )
    assert out.shape == img.shape
    assert any("deprecated" in str(x.message) for x in w)
