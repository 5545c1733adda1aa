import numpy as np

from mask_rcnn_tpu.data.loader import bucket_shape, pad_batch
from mask_rcnn_tpu.data.transforms import MaskRCNNTransform, compute_scale
from mask_rcnn_tpu.utils.geometry import (
    instance_boxes2label,
    label2instance_boxes,
    mask_to_bbox,
)


def make_example(h=100, w=150, r=3, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    bboxes, masks, labels = [], [], []
    for i in range(r):
        y1, x1 = rng.randint(0, h - 30), rng.randint(0, w - 30)
        y2, x2 = y1 + rng.randint(10, 30), x1 + rng.randint(10, 30)
        m = np.zeros((h, w), np.int32)
        m[y1:y2, x1:x2] = 1
        masks.append(m)
        bboxes.append([y1, x1, y2, x2])
        labels.append(i % 2)
    return (
        img,
        np.asarray(bboxes, np.float32),
        np.asarray(labels, np.int32),
        np.asarray(masks, np.int32),
    )


def test_compute_scale_caps():
    # min side to 600 unless the max side would exceed 1000
    assert compute_scale(300, 400, 600, 1000) == 2.0
    assert compute_scale(300, 900, 600, 1000) == 1000 / 900


def test_transform_resizes_consistently():
    t = MaskRCNNTransform(60, 100, (0, 0, 0), train=True,
                          rng=np.random.RandomState(0))
    img, bboxes, labels, masks, scale = t(make_example())
    assert img.dtype == np.float32
    assert min(img.shape[:2]) in range(58, 63) or max(
        img.shape[:2]
    ) in range(98, 101)
    # boxes track the mask extents after resize/flip
    for b, m in zip(bboxes, masks):
        mb = mask_to_bbox(m > 0)
        np.testing.assert_allclose(b, mb, atol=2.0)


def test_pad_batch_shapes_and_masks():
    t = MaskRCNNTransform(60, 100, (0, 0, 0), train=True,
                          rng=np.random.RandomState(1))
    examples = [t(make_example(seed=s)) for s in range(2)]
    batch = pad_batch(examples, max_boxes=5, min_size=60, max_size=100)
    n, hp, wp, _ = batch["image"].shape
    assert n == 2 and hp % 64 == 0 and wp % 64 == 0
    assert batch["bbox"].shape == (2, 5, 4)
    # masks are bit-packed along W by default
    assert batch["mask"].shape == (2, 5, hp, wp // 8)
    assert batch["bbox_valid"].sum() == 6  # 3 real boxes per example
    # padding slots are zero
    assert batch["mask"][0, 3:].sum() == 0

    raw = pad_batch(examples, max_boxes=5, min_size=60, max_size=100,
                    pack_masks=False)
    assert raw["mask"].shape == (2, 5, hp, wp)
    np.testing.assert_array_equal(
        np.unpackbits(batch["mask"], axis=-1), raw["mask"]
    )


def test_bucket_shape_orientation():
    assert bucket_shape(600, 900, 600, 1000) == (640, 1024)
    assert bucket_shape(900, 600, 600, 1000) == (1024, 640)
    # oversize falls back to rounding up
    assert bucket_shape(1100, 500, 600, 1000) == (1152, 640)


def test_label_instance_roundtrip():
    img, bboxes, labels, masks = make_example(r=2, seed=3)
    # build label images, then decompose back
    lbl_cls, lbl_ins = instance_boxes2label(
        labels + 1, bboxes, masks.astype(bool)
    )
    labels2, bboxes2, masks2 = label2instance_boxes(lbl_ins, lbl_cls)
    assert len(labels2) == len(labels)
    assert set(labels2) <= set(labels + 1)


def test_aspect_ratio_grouping():
    from mask_rcnn_tpu.data.loader import TrainLoader

    class FakeDS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            raise AssertionError("not needed")

        def image_sizes(self):
            # even = landscape, odd = portrait
            return [(50, 100) if i % 2 == 0 else (100, 50)
                    for i in range(20)]

    loader = TrainLoader(FakeDS(), None, batch_size=4, seed=0)
    idx = loader.epoch_indices(0)
    flags = loader.aspect_flags
    assert len(idx) % 4 == 0 and len(idx) > 0
    for b in range(0, len(idx), 4):
        batch_flags = flags[idx[b:b + 4]]
        assert batch_flags.all() or (~batch_flags).all()
    # different epochs shuffle differently but stay grouped
    idx2 = loader.epoch_indices(1)
    assert not np.array_equal(idx, idx2)


class _TinyDS:
    """Minimal dataset yielding (img, bbox, label, mask) tuples."""

    def __init__(self, n=8, sizes=None):
        self.n = n
        self.sizes = sizes

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return make_example(h=40, w=64, r=1, seed=i)

    def image_sizes(self):
        return self.sizes


def _identity_transform(example):
    img, bboxes, labels, masks = example
    return img.astype(np.float32), bboxes, labels, masks, 1.0


def test_loader_worker_exception_propagates():
    """A decode/transform error must fail the epoch loudly, not silently
    truncate it (the worker used to swallow exceptions and enqueue the
    end-of-epoch sentinel)."""
    import pytest

    from mask_rcnn_tpu.data.loader import TrainLoader

    calls = []

    def bad_transform(example):
        calls.append(1)
        if len(calls) == 3:
            raise ValueError("corrupt example")
        return _identity_transform(example)

    loader = TrainLoader(
        _TinyDS(n=8), bad_transform, batch_size=2,
        max_boxes=2, min_size=40, max_size=64,
    )
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader.epoch(0))


def test_loader_logs_remainder_drop(capsys):
    from mask_rcnn_tpu.data.loader import TrainLoader

    # 10 examples, batch 4 -> 2 dropped per epoch (no aspect flags)
    loader = TrainLoader(
        _TinyDS(n=10), _identity_transform, batch_size=4,
        max_boxes=2, min_size=40, max_size=64,
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    out = capsys.readouterr().out
    assert "2 image(s) dropped" in out


def test_index_level_skip_does_not_decode():
    """Resume fast-forward must not run the transform for skipped batches."""
    from mask_rcnn_tpu.data.loader import TrainLoader

    calls = []

    def counting_transform(example):
        calls.append(1)
        return _identity_transform(example)

    loader = TrainLoader(
        _TinyDS(n=8), counting_transform, batch_size=2,
        max_boxes=2, min_size=40, max_size=64,
    )
    full = list(loader.epoch(0))
    assert len(full) == 4 and len(calls) == 8
    calls.clear()
    resumed = list(loader.epoch(0, skip=3))
    assert len(resumed) == 1
    assert len(calls) == 2, "skipped batches must not be decoded"
    np.testing.assert_array_equal(resumed[0]["scale"], full[3]["scale"])
    np.testing.assert_array_equal(resumed[0]["bbox"], full[3]["bbox"])


def test_position_for_step_matches_enumeration():
    """Resume positions must match the uninterrupted (epoch, step) stream.
    Global batch formation makes per-epoch counts constant, but the walk
    stays count-driven so loader subclasses with varying epochs resume
    correctly too (see test_position_for_step_skips_zero_batch_epochs)."""
    from mask_rcnn_tpu.data.loader import TrainLoader

    rng = np.random.RandomState(7)
    sizes = [(50, 100) if rng.rand() < 0.5 else (100, 50) for _ in range(21)]
    loader = TrainLoader(
        _TinyDS(n=21, sizes=sizes), _identity_transform, batch_size=3,
        max_boxes=2, min_size=40, max_size=64,
        process_index=0, process_count=2,
    )
    counts = [loader.batches_in_epoch(e) for e in range(6)]
    assert counts[0] > 0
    expected = []
    for e, n in enumerate(counts):
        expected.extend((e, st) for st in range(n))
    walked = [loader.position_for_step(st) for st in range(sum(counts))]
    assert walked == expected


def test_resumed_batches_match_uninterrupted_with_aspect_grouping():
    """epoch(e, skip) after position_for_step must reproduce the exact batch
    sequence of an uninterrupted run, under varying per-epoch lengths."""
    from mask_rcnn_tpu.data.loader import TrainLoader

    rng = np.random.RandomState(3)
    sizes = [(50, 100) if rng.rand() < 0.5 else (100, 50) for _ in range(13)]
    loader = TrainLoader(
        _TinyDS(n=13, sizes=sizes), _identity_transform, batch_size=2,
        max_boxes=2, min_size=40, max_size=64,
        process_index=1, process_count=2,
    )
    # uninterrupted stream of the first 3 epochs
    stream = []
    for e in range(3):
        stream.extend(loader.epoch(e))
    # resume at an arbitrary global step inside epoch 1 or 2
    step = loader.batches_in_epoch(0) + 1
    e, skip = loader.position_for_step(step)
    resumed = list(loader.epoch(e, skip=skip))
    np.testing.assert_array_equal(
        resumed[0]["bbox"], stream[step]["bbox"]
    )
    np.testing.assert_array_equal(
        resumed[0]["image"], stream[step]["image"]
    )


def test_remat_grads_match():
    import jax
    import jax.numpy as jnp

    from mask_rcnn_tpu.models.resnet import extractor_forward, init_extractor

    params = init_extractor(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    jnp.float32)

    def loss(p, remat):
        return jnp.sum(
            extractor_forward(p, x, train=True, remat=remat) ** 2
        )

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    a = g1["res3"]["a"]["conv1"]["W"]
    b = g2["res3"]["a"]["conv1"]["W"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_position_for_step_skips_zero_batch_epochs():
    """Epochs that form no whole batches contribute no steps;
    position_for_step must skip them exactly like the train loop does.
    (Global batch formation makes real epoch counts constant, so this can
    only arise from a custom loader subclass — exercised directly.)"""
    from mask_rcnn_tpu.data.loader import TrainLoader

    loader = TrainLoader(
        _TinyDS(n=13), _identity_transform, batch_size=4,
        max_boxes=2, min_size=40, max_size=64,
    )
    counts = {0: 2, 1: 0, 2: 1, 3: 0, 4: 0, 5: 3}
    loader.batches_in_epoch = lambda e: counts.get(e, 2)
    expected = []
    for e in range(6):
        expected.extend((e, st) for st in range(counts[e]))
    walked = [loader.position_for_step(st) for st in range(sum(counts.values()))]
    assert walked == expected
    # all-zero schedules terminate with an error instead of looping forever
    loader.batches_in_epoch = lambda e: 0
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        loader.position_for_step(1)
    assert loader.position_for_step(0)[1] == 0


def test_epoch_batch_counts_are_constant_and_global():
    """Global batch formation: every host forms the same number of batches
    per epoch (the drop is the global per-orientation remainder, identical
    on all hosts and across epochs)."""
    from mask_rcnn_tpu.data.loader import TrainLoader

    rng = np.random.RandomState(3)
    sizes = [(50, 100) if rng.rand() < 0.5 else (100, 50) for _ in range(21)]
    loaders = [
        TrainLoader(
            _TinyDS(n=21, sizes=sizes), _identity_transform, batch_size=3,
            max_boxes=2, min_size=40, max_size=64,
            process_index=pi, process_count=2,
        )
        for pi in (0, 1)
    ]
    counts = [[ld.batches_in_epoch(e) for e in range(5)] for ld in loaders]
    assert counts[0] == counts[1]
    assert len(set(counts[0])) == 1  # constant across epochs
    assert counts[0][0] > 0


def test_multihost_batches_share_shape_and_compose_globally():
    """At every step, all hosts' padded batches must have IDENTICAL array
    shapes (jax.make_array_from_process_local_data requires equal local
    shards), and the hosts' index slices must concatenate to exactly the
    single-process loader's batch — per-host independent grouping would
    let host 0 batch landscape while host 1 batches portrait."""
    from mask_rcnn_tpu.data.loader import TrainLoader

    class SizedDS:
        """Images actually matching image_sizes (mixed orientations)."""

        def __init__(self, n):
            rng = np.random.RandomState(11)
            self.sizes = [
                (48, 64) if rng.rand() < 0.5 else (64, 48) for _ in range(n)
            ]

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            h, w = self.sizes[i]
            ex = make_example(h=h, w=w, r=1, seed=i)
            return ex

        def image_sizes(self):
            return self.sizes

    ds = SizedDS(19)
    kw = dict(max_boxes=2, min_size=48, max_size=64)
    hosts = [
        TrainLoader(ds, _identity_transform, batch_size=2,
                    process_index=pi, process_count=2, **kw)
        for pi in (0, 1)
    ]
    single = TrainLoader(ds, _identity_transform, batch_size=4, **kw)

    for e in range(3):
        idx = [ld.epoch_indices(e) for ld in hosts]
        gidx = single.epoch_indices(e)
        assert len(idx[0]) == len(idx[1]) == len(gidx) // 2
        # global composition: host slices interleave into the global batch
        nb = len(idx[0]) // 2
        for b in range(nb):
            combined = np.concatenate(
                [idx[0][b * 2:(b + 1) * 2], idx[1][b * 2:(b + 1) * 2]]
            )
            np.testing.assert_array_equal(combined, gidx[b * 4:(b + 1) * 4])
        # padded shapes identical across hosts at every step
        shapes = [
            [batch["image"].shape for batch in ld.epoch(e)] for ld in hosts
        ]
        assert shapes[0] == shapes[1]
        # orientation-uniform batches pad to the canonical bucket, never a
        # per-host max that could diverge
        for shp in shapes[0]:
            assert shp[1:3] in ((64, 64),)  # 48/64 round to 64-aligned


def test_abandoned_epoch_generator_joins_worker():
    """Breaking out of an epoch early (stop_at_step, final partial epoch)
    must stop and join the prefetch worker — a worker blocked forever on
    the full queue leaks the thread plus `prefetch` decoded batches per
    abandoned epoch."""
    import threading

    from mask_rcnn_tpu.data.loader import TrainLoader

    loader = TrainLoader(
        _TinyDS(n=12), _identity_transform, batch_size=2,
        max_boxes=2, min_size=40, max_size=64, prefetch=1,
    )
    before = set(threading.enumerate())
    gen = loader.epoch(0)
    next(gen)  # worker running, queue full behind us
    gen.close()  # GeneratorExit -> finally: stop + join
    leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
    assert not leaked
