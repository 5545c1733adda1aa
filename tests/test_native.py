"""Native C++ eval kernels vs their pure-python references."""

import numpy as np
import pytest

from mask_rcnn_tpu.utils import native
from mask_rcnn_tpu.utils.cocoeval import IOU_THRESHS, mask_iou_matrix
from mask_rcnn_tpu.utils.rle import rle_counts_to_mask

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _py_match(ious, gt_ignore, gt_crowd, det_ignore, threshs):
    t_n = len(threshs)
    d_n, g_n = ious.shape
    gtm = -np.ones((t_n, g_n), np.int64)
    dtm = -np.ones((t_n, d_n), np.int64)
    dt_ig = np.zeros((t_n, d_n), bool)
    for ti, t in enumerate(threshs):
        for di in range(d_n):
            best = min(t, 1 - 1e-10)
            m = -1
            for gi in range(g_n):
                if gtm[ti, gi] >= 0 and not gt_crowd[gi]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dtm[ti, di] = m
            dt_ig[ti, di] = gt_ignore[m]
            gtm[ti, m] = di
        dt_ig[ti] |= (dtm[ti] < 0) & det_ignore
    return dtm, dt_ig


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_match_image_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    d, g = 20, 7
    ious = rng.rand(d, g)
    gt_crowd = rng.rand(g) < 0.25
    # ignore = crowd | area-ignored, as the caller computes it
    gt_ignore = gt_crowd | (rng.rand(g) < 0.3)
    # sort ignored-last, as the caller does
    order = np.argsort(gt_ignore, kind="stable")
    ious = ious[:, order]
    gt_ignore = gt_ignore[order]
    gt_crowd = gt_crowd[order]
    det_ignore = rng.rand(d) < 0.2

    got = native.coco_match_image(
        ious, gt_ignore, gt_crowd, det_ignore, IOU_THRESHS
    )
    want = _py_match(ious, gt_ignore, gt_crowd, det_ignore, IOU_THRESHS)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_mask_iou_native_matches_python(monkeypatch):
    rng = np.random.RandomState(0)
    det = rng.rand(6, 40, 56) > 0.6
    gt = rng.rand(4, 40, 56) > 0.6
    crowd = np.array([0, 1, 0, 0], bool)
    got = native.mask_iou_packed(det, gt, crowd)
    # python path: disable native inside mask_iou_matrix
    monkeypatch.setattr(native, "mask_iou_packed", lambda *a: None)
    want = mask_iou_matrix(det, gt, crowd)
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
def test_rle_encode_native_roundtrip(seed):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(33, 47) > 0.5).astype(np.uint8)
    counts = native.rle_encode(mask)
    back = rle_counts_to_mask(counts, mask.shape)
    np.testing.assert_array_equal(back, mask)
    # starts with a zero run
    first_on = mask.flatten(order="F").argmax()
    assert counts[0] == first_on


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_boxlocal_inter_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    im_h, im_w, d, g = 60, 80, 12, 5
    gt = rng.rand(g, im_h, im_w) > 0.6
    g_labels = rng.randint(0, 3, g)
    d_labels = rng.randint(0, 3, d)
    locals_ = []
    for _ in range(d - 1):
        h, w = rng.randint(1, 30, 2)
        y0 = rng.randint(0, im_h - h)
        x0 = rng.randint(0, im_w - w)
        locals_.append(((rng.rand(h, w) > 0.4), y0, x0))
    # fully-outside detection: empty local, as boxlocal_masks emits
    locals_.append((np.zeros((0, 0), bool), 0, 0))

    inter, area, gt_area = native.boxlocal_inter(
        locals_, gt, d_labels, g_labels
    )
    assert inter.shape == (d, g) and area.shape == (d,)
    np.testing.assert_array_equal(gt_area, gt.sum(axis=(1, 2)))
    for i, (local, y0, x0) in enumerate(locals_):
        assert area[i] == int(local.sum())
        h, w = local.shape
        for j in range(g):
            if d_labels[i] != g_labels[j]:
                assert inter[i, j] == 0
                continue
            want = int(
                (gt[j, y0:y0 + h, x0:x0 + w] & local).sum()
            ) if h and w else 0
            assert inter[i, j] == want


def test_boxlocal_inter_rejects_out_of_bounds_placement():
    """The C kernel indexes the gt buffer without bounds checks; a local
    mask whose placement exceeds the gt extent (an im_size that disagrees
    with gt_masks.shape) must raise, not read out of bounds."""
    from mask_rcnn_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    gt = np.zeros((1, 20, 20), bool)
    gt[0, 2:10, 2:10] = True
    ok = native.boxlocal_inter(
        [(np.ones((5, 5), bool), 15, 15)], gt,
        np.zeros(1, np.int64), np.zeros(1, np.int64),
    )
    assert ok is not None
    with pytest.raises(ValueError, match="exceeds the gt mask extent"):
        native.boxlocal_inter(
            [(np.ones((8, 8), bool), 15, 15)], gt,  # 15+8 > 20
            np.zeros(1, np.int64), np.zeros(1, np.int64),
        )
