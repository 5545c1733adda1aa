import numpy as np

from mask_rcnn_tpu.ops import (
    sigmoid_cross_entropy,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from mask_rcnn_tpu.ops.losses import fast_rcnn_loc_loss


def test_smooth_l1_regions():
    x = np.array([0.0, 0.05, 2.0], np.float32)
    t = np.zeros(3, np.float32)
    w = np.ones(3, np.float32)
    # sigma=1: quadratic below 1 -> 0.5*x^2 ; linear above -> |x|-0.5
    got = float(smooth_l1_loss(x, t, w, 1.0))
    want = 0.5 * 0.05**2 + (2.0 - 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_sigma_scaling():
    x = np.array([0.2], np.float32)
    t = np.zeros(1, np.float32)
    w = np.ones(1, np.float32)
    # sigma=3: threshold 1/9; |x|=0.2 > 1/9 -> linear |x| - 0.5/9
    got = float(smooth_l1_loss(x, t, w, 3.0))
    np.testing.assert_allclose(got, 0.2 - 0.5 / 9, rtol=1e-5)


def test_fast_rcnn_loc_loss_only_positives():
    pred = np.ones((4, 4), np.float32)
    gt = np.zeros((4, 4), np.float32)
    label = np.array([1, 0, -1, 2], np.int32)
    got = float(fast_rcnn_loc_loss(pred, gt, label, 1.0))
    # two positive rows, each contributes 4 * (1 - 0.5); denom = #(label>=0)=3
    np.testing.assert_allclose(got, 2 * 4 * 0.5 / 3, rtol=1e-5)


def test_sigmoid_ce_ignore():
    logits = np.array([0.0, 100.0, -100.0], np.float32)
    labels = np.array([-1, 1, 0], np.int32)
    got = float(sigmoid_cross_entropy(logits, labels))
    # ignored first entry; the two others are confident-correct -> ~0
    np.testing.assert_allclose(got, 0.0, atol=1e-4)


def test_sigmoid_ce_value():
    logits = np.array([0.0], np.float32)
    labels = np.array([1], np.int32)
    np.testing.assert_allclose(
        float(sigmoid_cross_entropy(logits, labels)), np.log(2), rtol=1e-5
    )


def test_softmax_ce_ignore_and_mean():
    logits = np.array(
        [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [5.0, 5.0, 5.0]], np.float32
    )
    labels = np.array([0, 1, -1], np.int32)
    got = float(softmax_cross_entropy(logits, labels))
    np.testing.assert_allclose(got, 0.0, atol=1e-3)

    labels2 = np.array([1, 1, -1], np.int32)
    got2 = float(softmax_cross_entropy(logits, labels2))
    # first row wrong by ~10 nats, averaged over 2 valid rows
    np.testing.assert_allclose(got2, 10.0 / 2, rtol=1e-2)


def test_affine_channel_and_bn_fold():
    import jax.numpy as jnp

    from mask_rcnn_tpu.ops import affine_channel, fold_batch_norm

    x = np.random.RandomState(0).randn(2, 4, 4, 3).astype(np.float32)
    scale = np.asarray([2.0, 0.5, 1.0], np.float32)
    bias = np.asarray([1.0, -1.0, 0.0], np.float32)
    y = np.asarray(affine_channel(jnp.asarray(x), scale, bias))
    np.testing.assert_allclose(y, x * scale + bias, rtol=1e-6)

    gamma = np.asarray([1.0, 2.0], np.float32)
    beta = np.asarray([0.5, -0.5], np.float32)
    mean = np.asarray([0.1, 0.2], np.float32)
    var = np.asarray([4.0, 1.0], np.float32)
    p = fold_batch_norm(gamma, beta, mean, var, eps=1e-5)
    # y = gamma*(x-mean)/sqrt(var+eps) + beta == scale*x + bias
    xs = np.linspace(-2, 2, 7, dtype=np.float32)[:, None]
    want = gamma * (xs - mean) / np.sqrt(var + 1e-5) + beta
    got = xs * np.asarray(p["scale"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-5)
