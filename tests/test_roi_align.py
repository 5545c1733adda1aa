import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_rcnn_tpu.ops import (
    crop_and_resize,
    roi_align,
    roi_align_grouped,
    roi_pool,
)
from tests.oracles import random_boxes, roi_align_np


def make_case(seed=0, n=2, h=12, w=16, c=5, r=9, img_scale=16):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, h, w, c).astype(np.float32)
    rois = random_boxes(rng, r, h * img_scale, w * img_scale, min_size=4)
    idx = rng.randint(0, n, r).astype(np.int32)
    return feats, rois, idx


@pytest.mark.parametrize("sampling_ratio", [0, 1, 2])
def test_roi_align_matches_oracle(sampling_ratio):
    feats, rois, idx = make_case()
    got = np.asarray(
        roi_align(feats, rois, idx, out_size=7, spatial_scale=1 / 16,
                  sampling_ratio=sampling_ratio)
    )
    want = roi_align_np(feats, rois, idx, 7, 1 / 16, sampling_ratio)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_border_rois():
    """Rois poking outside the image exercise the skip/clamp rules."""
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 8, 8, 3).astype(np.float32)
    rois = np.array(
        [
            [-20.0, -20.0, 40.0, 40.0],
            [100.0, 100.0, 130.0, 130.0],  # hangs past the bottom-right
            [0.0, 0.0, 4.0, 4.0],  # sub-pixel roi -> max(extent, 1)
            [120.0, 120.0, 128.0, 128.0],
        ],
        np.float32,
    )
    idx = np.zeros(4, np.int32)
    got = np.asarray(roi_align(feats, rois, idx, 7, 1 / 16, 0))
    want = roi_align_np(feats, rois, idx, 7, 1 / 16, 0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_align_chunking_consistent():
    feats, rois, idx = make_case(seed=2, r=13)
    full = np.asarray(roi_align(feats, rois, idx, 7, 1 / 16, 2,
                                roi_chunk=64))
    chunked = np.asarray(roi_align(feats, rois, idx, 7, 1 / 16, 2,
                                   roi_chunk=4))
    np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-5)


def test_roi_align_grad_matches_numerical():
    feats, rois, idx = make_case(seed=3, n=1, h=6, w=6, c=2, r=3)

    def f(x):
        return jnp.sum(
            roi_align(x, rois, idx, 7, 1 / 16, sampling_ratio=2) ** 2
        )

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    # central differences on a few random entries
    rng = np.random.RandomState(0)
    eps = 1e-3
    for _ in range(10):
        i = tuple(rng.randint(0, s) for s in feats.shape)
        fp = feats.copy()
        fp[i] += eps
        fm = feats.copy()
        fm[i] -= eps
        num = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
        np.testing.assert_allclose(g[i], num, rtol=1e-2, atol=1e-3)


def test_roi_align_no_grad_to_rois():
    feats, rois, idx = make_case(seed=4, r=4)

    def f(r):
        return jnp.sum(roi_align(feats, r, idx, 7, 1 / 16, 2))

    g = np.asarray(jax.grad(f)(jnp.asarray(rois)))
    np.testing.assert_array_equal(g, np.zeros_like(rois))


def test_roi_align_jit_and_batch_index():
    """Rois must pull features from their own batch element."""
    n, h, w, c = 3, 4, 4, 2
    feats = np.zeros((n, h, w, c), np.float32)
    for b in range(n):
        feats[b] = b + 1
    rois = np.tile(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32), (3, 1))
    idx = np.array([0, 1, 2], np.int32)
    got = np.asarray(
        jax.jit(lambda f, r, i: roi_align(f, r, i, 7, 1 / 16, 2))(
            feats, rois, idx
        )
    )
    for b in range(n):
        np.testing.assert_allclose(got[b], np.full((7, 7, c), b + 1.0),
                                   rtol=1e-5)


def test_crop_and_resize_shape_and_constant():
    feats = np.full((1, 10, 10, 3), 2.5, np.float32)
    rois = np.array([[16.0, 16.0, 80.0, 80.0]], np.float32)
    idx = np.zeros(1, np.int32)
    got = np.asarray(crop_and_resize(feats, rois, idx, 7, 1 / 16))
    assert got.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(got, 2.5, rtol=1e-5)


def test_roi_pool_simple_max():
    """One roi covering a known region: output = max over each bin."""
    feats = np.arange(8 * 8, dtype=np.float32).reshape(1, 8, 8, 1)
    rois = np.array([[0.0, 0.0, 127.0, 127.0]], np.float32)
    idx = np.zeros(1, np.int32)
    got = np.asarray(roi_pool(feats, rois, idx, 2, 1 / 16))[0, :, :, 0]
    # roi -> (0,0)-(8,8) int grid, extent 8+1 clipped; bins cover 4-5 rows
    # bin [0]: rows 0..ceil(4.5)=5 -> max at row 4, col 4 = 4*8+4
    assert got[1, 1] == feats[0, 7, 7, 0]
    assert got[0, 0] >= feats[0, 3, 3, 0]


def test_roi_pool_batch_index():
    feats = np.zeros((2, 6, 6, 1), np.float32)
    feats[1] = 9.0
    rois = np.array([[0, 0, 90, 90], [0, 0, 90, 90]], np.float32)
    idx = np.array([0, 1], np.int32)
    got = np.asarray(roi_pool(feats, rois, idx, 3, 1 / 16))
    assert got[0].max() == 0.0
    assert got[1].min() == 9.0


def test_roi_pool_matches_chainer_oracle():
    """Randomized comparison against a scalar-loop re-derivation of chainer
    roi_pooling_2d (rounding, extent = max(end-start+1, 1), floor/ceil bin
    bounds, empty-bin zero) — the semantics the docstring asserts."""
    from tests.oracles import random_boxes, roi_pool_np

    rng = np.random.RandomState(11)
    n, h, w, c = 2, 12, 16, 5
    feats = rng.randn(n, h, w, c).astype(np.float32)
    # mix of normal rois, sub-bin tiny rois (empty bins), and rois that
    # stick out past the feature-map border after scaling
    rois = np.concatenate(
        [
            random_boxes(rng, 12, h * 16, w * 16, min_size=4.0),
            random_boxes(rng, 6, h * 16, w * 16, min_size=0.5)[:, :4] * 0.2,
            random_boxes(rng, 6, h * 24, w * 24, min_size=8.0),
        ]
    ).astype(np.float32)
    idx = rng.randint(0, n, len(rois)).astype(np.int32)

    for p in (2, 7):
        want = roi_pool_np(feats, rois, idx, p, 1 / 16)
        got = np.asarray(roi_pool(feats, rois, idx, p, 1 / 16))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)


def test_roi_align_bin_stride_matches_sliced_full_grid():
    """bin_stride=s must equal computing the full s*P grid and slicing
    [::s, ::s] (to within one-ULP float reassociation in the bin
    coordinates) — the strided-res5 head optimization relies on this."""
    feats, rois, idx = make_case(seed=5, r=6)
    for s, out in [(2, 7), (7, 2)]:
        full = np.asarray(
            roi_align(feats, rois, idx, out * s, 1 / 16, 0)
        )
        sub = np.asarray(
            roi_align(feats, rois, idx, out, 1 / 16, 0, bin_stride=s)
        )
        np.testing.assert_allclose(full[:, ::s, ::s], sub, rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("sampling_ratio,bin_stride",
                         [(0, 1), (0, 2), (2, 2)])
def test_roi_align_grouped_matches_flat(sampling_ratio, bin_stride):
    """The per-image batched formulation (production train/predict path)
    equals the flat formulation up to f32 summation order."""
    rng = np.random.RandomState(3)
    n, h, w, c, r = 3, 10, 14, 6, 8
    feats = rng.randn(n, h, w, c).astype(np.float32)
    rois_g = np.stack(
        [random_boxes(rng, r, h * 16, w * 16, min_size=4) for _ in range(n)]
    )  # (n, r, 4)
    idx = np.repeat(np.arange(n, dtype=np.int32), r)
    flat = np.asarray(
        roi_align(feats, rois_g.reshape(n * r, 4), idx, out_size=7,
                  spatial_scale=1 / 16, sampling_ratio=sampling_ratio,
                  bin_stride=bin_stride)
    )
    got = np.asarray(
        roi_align_grouped(feats, rois_g, out_size=7, spatial_scale=1 / 16,
                          sampling_ratio=sampling_ratio,
                          bin_stride=bin_stride)
    )
    assert got.shape == (n, r, 7, 7, c)
    np.testing.assert_allclose(
        got.reshape(n * r, 7, 7, c), flat, rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("pool_fn", [roi_pool, crop_and_resize])
def test_head_forward_grouped_alt_pooling_matches_flat(pool_fn):
    """Grouped rois with the alternative pooling funcs (reference
    --pooling-func pooling/resize) flatten internally and equal the flat
    call."""
    from mask_rcnn_tpu.models.heads import head_forward, init_head

    rng = np.random.RandomState(5)
    n, h, w, r = 2, 8, 11, 5
    feats = rng.randn(n, h, w, 1024).astype(np.float32)
    rois_g = np.stack(
        [random_boxes(rng, r, h * 16, w * 16, min_size=8) for _ in range(n)]
    )
    idx = np.repeat(np.arange(n, dtype=np.int32), r)
    params = init_head(jax.random.PRNGKey(1), n_class=3)
    flat = head_forward(params, feats, rois_g.reshape(n * r, 4), idx,
                        pooling_func=pool_fn)
    grouped = head_forward(params, feats, jnp.asarray(rois_g), None,
                           pooling_func=pool_fn)
    for k in flat:
        np.testing.assert_allclose(
            np.asarray(grouped[k]), np.asarray(flat[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_head_forward_grouped_matches_flat():
    """head_forward with (N, R, 4) grouped rois equals the flat call."""
    from mask_rcnn_tpu.models.heads import head_forward, init_head

    rng = np.random.RandomState(4)
    n, h, w, r = 2, 8, 11, 6
    feats = rng.randn(n, h, w, 1024).astype(np.float32)
    rois_g = np.stack(
        [random_boxes(rng, r, h * 16, w * 16, min_size=8) for _ in range(n)]
    )
    idx = np.repeat(np.arange(n, dtype=np.int32), r)
    params = init_head(jax.random.PRNGKey(0), n_class=4)
    sub = jnp.asarray([0, 1, r, r + 1], jnp.int32)
    flat = head_forward(params, feats, rois_g.reshape(n * r, 4), idx,
                        mask_subset=sub)
    grouped = head_forward(params, feats, jnp.asarray(rois_g), None,
                           mask_subset=sub)
    for k in flat:
        np.testing.assert_allclose(
            np.asarray(grouped[k]), np.asarray(flat[k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )
