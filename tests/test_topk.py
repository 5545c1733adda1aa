"""top_k_select must be bit-identical to lax.top_k — values AND indices,
including the smaller-index tie-break — on every input class."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_rcnn_tpu.ops.topk import top_k_select


def _check(score, k):
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(score), k)
    got_v, got_i = jax.jit(top_k_select, static_argnums=1)(
        jnp.asarray(score), k
    )
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


@pytest.mark.parametrize("n,k", [(65520, 6000), (65520, 12000), (1000, 100)])
def test_random(n, k):
    rng = np.random.RandomState(0)
    _check(rng.randn(n).astype(np.float32), k)


def test_heavy_ties():
    rng = np.random.RandomState(1)
    # few distinct values -> ties everywhere, including at the threshold
    score = rng.randint(0, 7, size=20000).astype(np.float32)
    _check(score, 5000)


def test_constant_scores():
    _check(np.full(10000, 3.5, np.float32), 2000)


def test_neg_inf_padding():
    rng = np.random.RandomState(2)
    score = rng.randn(8192).astype(np.float32)
    score[4000:] = -np.inf  # fewer finite entries than k
    _check(score, 6000)


def test_negative_and_mixed_signs():
    rng = np.random.RandomState(3)
    score = (rng.randn(30000) * 100).astype(np.float32)
    score[::7] = -score[::7]
    _check(score, 11000)


def test_k_equals_n():
    rng = np.random.RandomState(4)
    _check(rng.randn(512).astype(np.float32), 512)


def test_bf16_ties():
    rng = np.random.RandomState(5)
    score = jnp.asarray(rng.randn(16384), jnp.bfloat16)
    ref_v, ref_i = jax.lax.top_k(score, 4000)
    got_v, got_i = jax.jit(top_k_select, static_argnums=1)(score, 4000)
    np.testing.assert_array_equal(
        np.asarray(ref_v, np.float32), np.asarray(got_v, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_under_vmap():
    rng = np.random.RandomState(6)
    scores = jnp.asarray(rng.randn(3, 9000), jnp.float32)
    ref_v, ref_i = jax.vmap(lambda s: jax.lax.top_k(s, 2500))(scores)
    got_v, got_i = jax.vmap(lambda s: top_k_select(s, 2500))(scores)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_pallas_descent_matches_xla():
    from mask_rcnn_tpu.ops.topk import (
        _float_to_ordered_uint32,
        kth_largest_key,
        kth_largest_key_pallas,
    )

    rng = np.random.RandomState(7)
    for score, k in [
        (rng.randn(65520).astype(np.float32), 6000),
        (rng.randint(0, 5, 20000).astype(np.float32), 5000),
        (np.full(4096, -2.5, np.float32), 1024),
    ]:
        key = _float_to_ordered_uint32(jnp.asarray(score))
        ref = kth_largest_key(key, k)
        got = kth_largest_key_pallas(key, k)
        assert int(ref) == int(got)


def test_signed_zeros_tie_break():
    """-0.0 and +0.0 compare equal in lax.top_k (smaller index wins); the
    uint32 total-order encoding must not rank +0.0 above -0.0."""
    _check(np.asarray([-0.0, 0.0, -1.0, 0.0, -0.0], np.float32), 3)
    score = np.zeros(4096, np.float32)
    score[1::2] = -0.0
    score[7] = 1.0
    _check(score, 100)
