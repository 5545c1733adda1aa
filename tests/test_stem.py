"""The space-to-depth stem must match the direct conv1+affine+relu+maxpool
composition (same terms per output, f32 accumulation order aside)."""

import jax
import jax.numpy as jnp
import numpy as np

from mask_rcnn_tpu.models import resnet
from mask_rcnn_tpu.models.resnet import (
    _stem_s2d_weight,
    affine,
    conv2d,
    max_pool_3x3_s2_p1,
    stem_forward,
)


def _stem_direct(params, x):
    h = conv2d(x, params["conv1"]["W"], stride=2, padding=[(3, 3), (3, 3)])
    h = jax.nn.relu(affine(h, params["bn1"]))
    return max_pool_3x3_s2_p1(h)


def _params():
    return resnet.init_extractor(jax.random.PRNGKey(0), 50)


def test_s2d_matches_direct():
    p = _params()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32) * 60)
    ref = np.asarray(jax.jit(lambda x: _stem_direct(p, x))(x))
    got = np.asarray(jax.jit(lambda x: stem_forward(p, x))(x))
    assert got.shape == ref.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_non_multiple_of_4_falls_back():
    p = _params()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 66, 94, 3).astype(np.float32))
    ref = np.asarray(_stem_direct(p, x))
    got = np.asarray(stem_forward(p, x))
    np.testing.assert_array_equal(got, ref)


def test_weight_transform_oracle():
    rng = np.random.RandomState(2)
    w7 = rng.randn(7, 7, 3, 64).astype(np.float32)
    got = np.asarray(_stem_s2d_weight(jnp.asarray(w7)))
    ref = np.zeros((3, 3, 4, 4, 3, 2, 2, 64), np.float32)
    for by in range(3):
        for bx in range(3):
            for qy in range(4):
                for qx in range(4):
                    for py in range(2):
                        for px in range(2):
                            dy = 4 * (by - 1) + qy + 3 - 2 * py
                            dx = 4 * (bx - 1) + qx + 3 - 2 * px
                            if 0 <= dy < 7 and 0 <= dx < 7:
                                ref[by, bx, qy, qx, :, py, px] = w7[dy, dx]
    np.testing.assert_array_equal(got, ref.reshape(3, 3, 48, 256))


def test_s2d_gradients_match_direct():
    p = _params()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))

    def loss(fn, w7):
        q = {"conv1": {"W": w7}, "bn1": p["bn1"]}
        return jnp.sum(fn(q, x) ** 2)

    g_ref = jax.grad(lambda w: loss(_stem_direct, w))(p["conv1"]["W"])
    g_got = jax.grad(lambda w: loss(stem_forward, w))(p["conv1"]["W"])
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-3
    )
