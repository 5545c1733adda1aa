"""ConcatDataset keeps aspect-ratio grouping on the flagship COCO path.

The reference's COCO recipe joins train2014 + valminusminival with
chainer's ConcatenatedDataset (reference examples/coco/train.py:16-31);
round-4 review found the example-local concat dropped the ``image_sizes``
metadata, silently degrading every COCO train batch to the square
worst-case pad. These tests pin the fix: the library ConcatDataset
forwards ``image_sizes``, the loader groups orientations across the
concat, multi-host ``force_shape`` stays non-square, and a concat (or any
dataset) WITHOUT the metadata warns instead of silently burning compute.
"""

import warnings

import numpy as np
import pytest

from mask_rcnn_tpu.data import ConcatDataset
from mask_rcnn_tpu.data.coco import COCOInstanceSegmentationDataset
from mask_rcnn_tpu.data.loader import TrainLoader
from mask_rcnn_tpu.data.synthetic import make_synthetic_coco_root


@pytest.fixture(scope="module")
def coco_pair(tmp_path_factory):
    """Two synthetic COCO roots: one landscape (64x128), one portrait
    (128x64) — mimicking train2014 + valminusminival with mixed
    orientations across the concat."""
    base = tmp_path_factory.mktemp("concat_coco")
    root_l = make_synthetic_coco_root(
        str(base / "L"), n_train=6, n_valminusminival=1, n_minival=1,
        height=64, width=128, seed=0,
    )
    root_p = make_synthetic_coco_root(
        str(base / "P"), n_train=6, n_valminusminival=1, n_minival=1,
        height=128, width=64, seed=1,
    )
    ds_l = COCOInstanceSegmentationDataset("train", root=root_l)
    ds_p = COCOInstanceSegmentationDataset("train", root=root_p)
    return ds_l, ds_p


def test_concat_forwards_image_sizes_and_schema(coco_pair):
    ds_l, ds_p = coco_pair
    cat = ConcatDataset(ds_l, ds_p)
    assert len(cat) == len(ds_l) + len(ds_p)
    sizes = cat.image_sizes()
    assert sizes == ds_l.image_sizes() + ds_p.image_sizes()
    # metadata (class_names) forwards from the first child
    assert cat.class_names == ds_l.class_names
    # indexing crosses the child boundary
    img_last_l = cat[len(ds_l) - 1][0]
    img_first_p = cat[len(ds_l)][0]
    assert img_last_l.shape[:2] == (64, 128)
    assert img_first_p.shape[:2] == (128, 64)


def test_concat_coco_keeps_aspect_grouping(coco_pair):
    ds_l, ds_p = coco_pair
    cat = ConcatDataset(ds_l, ds_p)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # grouping active -> no warning
        loader = TrainLoader(
            cat, None, batch_size=2, min_size=64, max_size=128, seed=0,
        )
    assert loader.aspect_flags is not None
    assert loader.aspect_flags.sum() == len(ds_l)  # landscape flags
    idx = loader.epoch_indices(0)
    assert len(idx) == 12  # nothing dropped: 6+6 split 2-aligned
    for b in range(0, len(idx), 2):
        flags = loader.aspect_flags[idx[b:b + 2]]
        assert flags.all() or (~flags).all(), "mixed-orientation batch"


def test_concat_coco_multihost_force_shape_non_square(coco_pair):
    """The reference-parity config must pad to (short, long)/(long, short),
    never the (long, long) square fallback (VERDICT r4 weak #1)."""
    ds_l, ds_p = coco_pair
    cat = ConcatDataset(ds_l, ds_p)
    loader = TrainLoader(
        cat, None, batch_size=1, min_size=64, max_size=128, seed=0,
        process_index=0, process_count=2,
    )
    idx = loader.epoch_indices(0)
    assert len(idx) > 0
    seen = set()
    for i in idx:
        fs = loader._batch_force_shape(np.asarray([i]))
        assert fs in ((64, 128), (128, 64))
        expect = (64, 128) if loader.aspect_flags[int(i)] else (128, 64)
        assert fs == expect
        seen.add(fs)
    assert seen == {(64, 128), (128, 64)}


def test_bare_concat_without_metadata_warns(coco_pair):
    """A child lacking image_sizes makes the concat's metadata raise
    AttributeError; the loader must fall back to no-grouping WITH a
    warning, not crash and not stay silent."""
    ds_l, _ = coco_pair

    class Bare:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise AssertionError("not needed")

    cat = ConcatDataset(ds_l, Bare())
    with pytest.raises(AttributeError):
        cat.image_sizes()
    with pytest.warns(UserWarning, match="aspect-ratio grouping disabled"):
        loader = TrainLoader(
            cat, None, batch_size=2, min_size=64, max_size=128,
        )
    assert loader.aspect_flags is None


def test_no_metadata_dataset_warns_once():
    class Plain:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            raise AssertionError("not needed")

    with pytest.warns(UserWarning, match="image_sizes is not exposed"):
        TrainLoader(Plain(), None, batch_size=2, min_size=64, max_size=128)
    # square resize target: orientation cannot change the bucket -> silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        TrainLoader(Plain(), None, batch_size=2, min_size=64, max_size=64)


def test_indexing_dataset_forwards_image_sizes(coco_pair):
    from mask_rcnn_tpu.data import IndexingDataset

    ds_l, _ = coco_pair
    sub = IndexingDataset(ds_l, [2, 0])
    sizes = sub.image_sizes()
    all_sizes = ds_l.image_sizes()
    assert sizes == [all_sizes[2], all_sizes[0]]

    class Bare:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise AssertionError("not needed")

    with pytest.raises(AttributeError):
        IndexingDataset(Bare(), [0]).image_sizes()
