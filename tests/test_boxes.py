import numpy as np
import pytest

from mask_rcnn_tpu.ops import bbox2loc, bbox_iou, clip_boxes, loc2bbox
from tests.oracles import bbox2loc_np, bbox_iou_np, loc2bbox_np, random_boxes


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_bbox_iou_matches_oracle(rng):
    a = random_boxes(rng, 13, 60, 80)
    b = random_boxes(rng, 7, 60, 80)
    got = np.asarray(bbox_iou(a, b))
    want = bbox_iou_np(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bbox_iou_identity(rng):
    a = random_boxes(rng, 5, 60, 80)
    got = np.asarray(bbox_iou(a, a))
    np.testing.assert_allclose(np.diag(got), np.ones(5), rtol=1e-5)


def test_loc_roundtrip(rng):
    src = random_boxes(rng, 20, 100, 100)
    dst = random_boxes(rng, 20, 100, 100)
    loc = np.asarray(bbox2loc(src, dst))
    np.testing.assert_allclose(loc, bbox2loc_np(src, dst), rtol=1e-3,
                               atol=1e-4)
    back = np.asarray(loc2bbox(src, loc))
    np.testing.assert_allclose(back, dst, rtol=1e-3, atol=1e-2)


def test_loc2bbox_matches_oracle(rng):
    src = random_boxes(rng, 20, 100, 100)
    loc = rng.randn(20, 4).astype(np.float32) * 0.3
    got = np.asarray(loc2bbox(src, loc))
    np.testing.assert_allclose(got, loc2bbox_np(src, loc), rtol=1e-4,
                               atol=1e-3)


def test_clip_boxes():
    b = np.array([[-5.0, -3.0, 120.0, 90.0], [10.0, 10.0, 20.0, 20.0]],
                 np.float32)
    got = np.asarray(clip_boxes(b, (100, 80)))
    np.testing.assert_allclose(
        got, [[0, 0, 100, 80], [10, 10, 20, 20]], rtol=1e-6
    )


def test_degenerate_boxes_zero_iou():
    a = np.array([[10.0, 10.0, 10.0, 10.0]], np.float32)  # zero area
    b = np.array([[0.0, 0.0, 20.0, 20.0]], np.float32)
    got = np.asarray(bbox_iou(a, b))
    assert got[0, 0] == 0.0
