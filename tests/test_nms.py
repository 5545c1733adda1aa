import jax
import numpy as np
import pytest

from mask_rcnn_tpu.ops import nms_padded
from tests.oracles import nms_np, random_boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_greedy_oracle(seed, thresh):
    rng = np.random.RandomState(seed)
    n = 200
    bbox = random_boxes(rng, n, 50, 50, min_size=5)
    # Distinct scores so ordering is unambiguous between implementations.
    score = rng.permutation(n).astype(np.float32) / n

    want = nms_np(bbox, score, thresh)
    idx, mask = jax.jit(
        lambda b, s: nms_padded(b, s, thresh, max_out=n)
    )(bbox, score)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)


def test_nms_respects_validity_mask():
    bbox = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], np.float32
    )
    score = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    idx, mask = nms_padded(bbox, score, 0.5, max_out=3, valid=valid)
    got = np.asarray(idx)[np.asarray(mask)]
    # Box 0 is padding; boxes 1 and 2 don't overlap -> both kept.
    np.testing.assert_array_equal(got, [1, 2])


def test_nms_max_out_truncates():
    rng = np.random.RandomState(3)
    bbox = random_boxes(rng, 50, 100, 100, min_size=2)
    score = rng.permutation(50).astype(np.float32)
    want = nms_np(bbox, score, 0.5)[:5]
    idx, mask = nms_padded(bbox, score, 0.5, max_out=5)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,thresh", [(0, 0.7), (1, 0.5), (2, 0.3)])
def test_nms_blocked_matches_oracle_at_scale(seed, thresh):
    """The blocked-exact path (train-time proposal scale) must be
    bit-identical to the greedy oracle, including truncation order and
    padding rows."""
    rng = np.random.RandomState(seed)
    n = 3000
    bbox = random_boxes(rng, n, 300, 400, min_size=4)
    score = rng.permutation(n).astype(np.float32) / n
    valid = rng.rand(n) > 0.05
    max_out = 400

    order = np.argsort(-np.where(valid, score, -np.inf), kind="stable")
    want_all = nms_np(bbox[order][valid[order]],
                      score[order][valid[order]], thresh)
    want = order[valid[order]][want_all][:max_out]

    idx, mask = jax.jit(
        lambda b, s, v: nms_padded(
            b, s, thresh, max_out=max_out, valid=v, block=512
        )
    )(bbox, score, valid)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)


def test_nms_blocked_fewer_survivors_than_max_out():
    rng = np.random.RandomState(7)
    # heavy overlap -> few survivors
    base = random_boxes(rng, 40, 60, 60, min_size=20)
    bbox = np.concatenate([base + rng.randn(40, 4) for _ in range(40)])
    score = rng.permutation(len(bbox)).astype(np.float32)
    want = nms_np(bbox, score, 0.7)[:256]
    idx, mask = nms_padded(bbox, score, 0.7, max_out=256, block=256)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)
    assert len(got) < 256  # the early-exit/padded tail is exercised


def test_nms_suppression_chain():
    # a suppresses b, so c (overlapping b but not a) must survive: the naive
    # "suppress anything overlapped by a higher-scored box" answer differs
    # from greedy here.
    bbox = np.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # a: top score
            [0.0, 5.0, 10.0, 15.0],  # b: IoU(a,b)=1/3 > .25 -> suppressed
            [0.0, 11.0, 10.0, 21.0],  # c: IoU(a,c)=0, IoU(b,c)>.25
        ],
        np.float32,
    )
    score = np.array([0.9, 0.8, 0.7], np.float32)
    idx, mask = nms_padded(bbox, score, 0.25, max_out=3)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [0, 2])
