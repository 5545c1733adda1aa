"""Shared construction for the 2-process full-train-flow test: the worker
processes and the single-process baseline must build byte-identical
datasets/loaders/configs so their loss sequences are comparable.

The dataset has exactly ``global_batch`` images, so each epoch is one global
step and the concatenation of the per-host contiguous shards equals the full
epoch permutation — the 2-process run then consumes the very same global
batches as the single-process run.
"""

from __future__ import annotations

import numpy as np

from mask_rcnn_tpu.data import MaskRCNNTransform, TrainLoader
from mask_rcnn_tpu.models import MaskRCNNConfig, ProposalConfig


GLOBAL_BATCH = 4


def flow_cfg() -> MaskRCNNConfig:
    return MaskRCNNConfig(
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


class PerExampleFlipTransform(MaskRCNNTransform):
    """Flip decision derived from the example content instead of a
    sequential RNG — host sharding must not change which images flip."""

    def __call__(self, example):
        seed = int(np.asarray(example[0], np.int64).sum() % (2**31))
        self.rng = np.random.RandomState(seed)
        return super().__call__(example)


def make_flow_loader(process_index: int, process_count: int) -> TrainLoader:
    from tests.test_engine import make_dataset

    cfg = flow_cfg()
    ds = make_dataset(n=GLOBAL_BATCH)
    return TrainLoader(
        ds,
        PerExampleFlipTransform(64, 64, cfg.mean, train=True),
        batch_size=GLOBAL_BATCH // process_count,
        max_boxes=2,
        min_size=64,
        max_size=64,
        process_index=process_index,
        process_count=process_count,
    )


def run_failing_eval():
    """Distributed evaluation where ONLY rank 1's shard contains a poisoned
    example. The evaluator must exchange failure flags collectively so BOTH
    ranks raise (instead of rank 0 hanging forever in process_allgather).
    Returns the raised message, or None if no error surfaced."""
    import jax

    from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator
    from mask_rcnn_tpu.models import init_params
    from mask_rcnn_tpu.models.api import MaskRCNNResNet
    from tests.test_engine import make_dataset

    cfg = flow_cfg()
    ds = make_dataset(n=GLOBAL_BATCH)

    class Poisoned:
        class_names = ds.class_names

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 3:  # strided shard [1::2] -> only rank 1 sees this
                raise ValueError("poisoned example")
            return ds[i]

    params = init_params(jax.random.PRNGKey(0), cfg)
    model = MaskRCNNResNet.from_config(cfg, params)
    ev = InstanceSegmentationEvaluator(
        Poisoned(), ds.class_names, kind="voc", batch_size=2
    )
    try:
        ev(model)
    except RuntimeError as e:
        return str(e)
    return None


class StubDetector:
    """Deterministic non-jit detector for the pooled-eval test: recovers
    the GT rectangle from the bright region of each synthetic image and
    emits it as a perfect detection plus a rolled false positive, each
    with an independent image-dependent hash score in [0.5, 0.75) — an
    image's FP can outscore its own TP, and TP/FP scores interleave
    ACROSS images, so the precision-recall curve — and hence the AP —
    depends on the global score ordering, which is exactly what detection
    pooling must preserve."""

    def predict(self, imgs):
        bboxes, masks, labels, scores = [], [], [], []
        for chw in imgs:
            img = np.asarray(chw).transpose(1, 2, 0)
            m = img.max(axis=2) > 150
            ys, xs = np.nonzero(m)
            tp = [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
            false_m = np.roll(m, (17, 23), axis=(0, 1))
            fys, fxs = np.nonzero(false_m)
            fp = [fys.min(), fxs.min(), fys.max() + 1, fxs.max() + 1]
            total = int(img.sum())
            s = 0.5 + float(total % 997) / 4000.0
            s_fp = 0.5 + float((total * 7919) % 997) / 4000.0
            bboxes.append(np.asarray([tp, fp], np.float32))
            masks.append(np.stack([m, false_m]))
            labels.append(np.zeros(2, np.int32))
            scores.append(np.asarray([s, s_fp], np.float32))
        return bboxes, masks, labels, scores


def run_pooled_eval() -> dict:
    """Distributed evaluation with ``pool_detections=True``: every rank
    gathers all shards' compact match records and scores the union, so the
    report must equal a single-process evaluation of the full dataset
    EXACTLY (same records, rebuilt in rank order). Parameterized only by
    the ambient jax process layout — the parent test runs it with pc=1 for
    the global baseline."""
    from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator
    from tests.test_engine import make_dataset

    ds = make_dataset(n=GLOBAL_BATCH)
    ev = InstanceSegmentationEvaluator(
        ds, ds.class_names, kind="voc", batch_size=2, pool_detections=True
    )
    return ev(StubDetector())


def run_train_flow(out_dir: str) -> dict:
    """The full train() + evaluator + checkpoint flow, parameterized only by
    the ambient jax process layout."""
    import jax

    from tests.test_engine import make_dataset
    from mask_rcnn_tpu.engine.evaluator import InstanceSegmentationEvaluator
    from mask_rcnn_tpu.engine.loop import train

    cfg = flow_cfg()
    loader = make_flow_loader(jax.process_index(), jax.process_count())
    ds = make_dataset(n=GLOBAL_BATCH)
    evaluator = InstanceSegmentationEvaluator(
        ds, ds.class_names, kind="voc", batch_size=2
    )
    return train(
        cfg,
        loader,
        out_dir,
        max_epoch=2.0,
        batch_size_per_device=1,
        evaluator=evaluator,
        log_interval=1,
        checkpoint_interval_steps=2,
    )
