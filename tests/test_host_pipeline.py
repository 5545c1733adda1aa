"""Host-side pipeline pieces: prepare() scaling parity, mask pasting edges,
per-host data sharding."""

import numpy as np

from mask_rcnn_tpu.data.loader import TrainLoader
from mask_rcnn_tpu.models.api import MaskRCNNResNet
from mask_rcnn_tpu.utils.masks import expand_boxes, paste_masks


def test_prepare_scale_rules():
    """Reference prepare (models/mask_rcnn.py:152-176): min side -> min_size
    unless the max side would exceed max_size."""
    model = MaskRCNNResNet.__new__(MaskRCNNResNet)
    from mask_rcnn_tpu.models import MaskRCNNConfig

    model.config = MaskRCNNConfig(n_fg_class=1, min_size=600, max_size=1000)
    imgs = [
        np.zeros((3, 300, 400), np.float32),  # scale 2.0
        np.zeros((3, 300, 900), np.float32),  # capped: 1000/900
        np.zeros((3, 1200, 600), np.float32),  # max-side cap: 1000/1200
    ]
    prepared, sizes, scales = model.prepare(imgs)
    np.testing.assert_allclose(
        scales, [2.0, 1000 / 900, 1000 / 1200], rtol=1e-6
    )
    assert sizes == [(300, 400), (300, 900), (1200, 600)]
    assert prepared[0].shape[:2] == (600, 800)
    # mean got subtracted
    assert prepared[0].min() < 0


def test_expand_boxes_scale():
    b = np.asarray([[10.0, 20.0, 30.0, 40.0]])  # x1 y1 x2 y2
    out = expand_boxes(b, 2.0)
    np.testing.assert_allclose(out, [[0.0, 10.0, 40.0, 50.0]])


def test_paste_masks_inside_and_clipped():
    probs = np.ones((2, 14, 14), np.float32)
    bbox = np.asarray(
        [
            [10.0, 12.0, 30.0, 40.0],  # fully inside
            [-5.0, 45.0, 20.0, 80.0],  # clipped top & right
        ],
        np.float32,
    )
    masks = paste_masks(bbox, probs, 50, 60)
    assert masks.shape == (2, 50, 60)
    # interior of box 0 is filled, outside empty
    assert masks[0, 20, 25] and not masks[0, 5, 5]
    # clipped box still paints inside the image
    assert masks[1, 5, 55]
    assert masks[1].sum() > 0
    # nothing outside image bounds (shape enforces), bottom-left empty
    assert not masks[1, 45, 5]


def test_paste_masks_empty():
    out = paste_masks(np.zeros((0, 4), np.float32),
                      np.zeros((0, 14, 14), np.float32), 30, 30)
    assert out.shape == (0, 30, 30)


def test_loader_per_host_shards_disjoint():
    class DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            raise AssertionError

    shards = []
    for pi in range(2):
        loader = TrainLoader(
            DS(), None, batch_size=2, seed=3,
            process_index=pi, process_count=2,
        )
        shards.append(set(loader.epoch_indices(0).tolist()))
    assert shards[0].isdisjoint(shards[1])
    # 23 images -> 5 whole global batches of 4 (global remainder 3 dropped);
    # each host holds its half of every global batch
    assert len(shards[0]) == len(shards[1]) == 10
