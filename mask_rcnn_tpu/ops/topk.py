"""Exact top-k via radix threshold select.

``jax.lax.top_k`` with a large k (the 65520-anchor -> 6000/12000 pre-NMS
selection, reference chainercv ProposalCreator order) lowers to a full
O(N log N) sort of all N scores on TPU. This module computes the *same*
result (values, indices — including lax.top_k's smaller-index tie-break)
with:

1. a 32-iteration bit-descent binary search on the monotone uint32
   encoding of the float scores, yielding the exact k-th largest value
   ``t`` (each iteration is one vectorized compare + sum over N — pure
   VPU work);
2. an order-preserving compaction of the elements ``score > t`` followed
   by the first ``k - count(>t)`` ties ``score == t`` in index order —
   exactly the set lax.top_k selects, because its tie-break among equal
   values is "smaller index wins";
3. a full sort (``lax.top_k``) of only the k compacted candidates.

The sort shrinks from N to k elements; for the RPN proposal stage that is
65520 -> 6000 (test) / 12000 (train). Selection is exact for every input
(ties, +-inf blocks, constant scores) — there is no fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _float_to_ordered_uint32(x):
    """Monotone bijection from float32 to uint32 (IEEE total order).

    Positive floats map to bits | 0x80000000; negative floats map to
    ~bits. Result compares like the floats (NaN-free inputs assumed).
    Signed zeros follow the same IEEE total order as lax.top_k's
    comparator (+0.0 ranks above -0.0 on both CPU and TPU lowerings —
    verified by tests/test_topk.py::test_signed_zeros_tie_break), so the
    bit-identical-indices guarantee holds for them too.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (bits >> 31).astype(jnp.bool_)
    return jnp.where(sign, ~bits, bits | jnp.uint32(0x80000000))


def kth_largest_key(key, k):
    """Exact k-th largest value of a uint32 array via 32-step bit descent.

    Invariant: ``t`` is the largest value built so far with
    ``count(key >= t) >= k``; descending from the MSB makes the final
    ``t`` the largest such value overall, i.e. exactly the k-th largest
    element of ``key``.
    """

    t = jnp.uint32(0)
    # Unrolled (static 32 rounds): a fori_loop would run as an on-device
    # while loop whose per-iteration overhead dominates the tiny
    # compare+sum body; unrolled, XLA fuses each round into one pass.
    for b in range(31, -1, -1):
        cand = t | (jnp.uint32(1) << jnp.uint32(b))
        count = jnp.sum((key >= cand).astype(jnp.int32))
        t = jnp.where(count >= k, cand, t)
    return t


def kth_largest_key_pallas(key, k, interpret=None):
    """Single-Pallas-kernel variant of :func:`kth_largest_key`.

    The whole 32-round descent runs inside one kernel with the key array
    resident in VMEM (65520 uint32 = 262 KB), so the sequential rounds pay
    no per-kernel launch overhead. Measured in-graph on v5e at (65520,
    k=6000): ~0.07 ms vs ~0.09 ms for the fused-XLA unrolled descent —
    both below `lax.top_k`'s 0.11 ms full sort, which is why
    :func:`top_k_select` still does not use either by default (the
    compaction, not the descent, is what loses; see DESIGN.md).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the CPU
    test suite exercises identical semantics.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _kernel(key_ref, t_ref):
        u = key_ref[:]

        def body(i, carry):
            t, bit = carry
            cand = t | bit
            count = jnp.sum((u >= cand).astype(jnp.int32))
            return (jnp.where(count >= k, cand, t), bit >> 1)

        t, _ = jax.lax.fori_loop(
            0, 32, body, (jnp.uint32(0), jnp.uint32(0x80000000))
        )
        t_ref[0, 0] = t

    n = key.shape[0]
    cols = 128
    rows = ((-(-n // cols) + 7) // 8) * 8
    pad = rows * cols - n
    if pad:
        # Zero never affects counts: every candidate has a bit set, and a
        # real float32 key encoding is never 0 (0 corresponds to NaN).
        key = jnp.concatenate([key, jnp.zeros((pad,), jnp.uint32)])
    t = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(key.reshape(rows, cols))
    return t[0, 0]


def kth_largest_key_hist(key, k, bits_per_round: int = 8):
    """Same result as :func:`kth_largest_key` in 32/bits_per_round rounds.

    Each round counts, for every candidate increment ``j`` of the current
    byte, how many keys are >= ``t + (j << shift)`` — one fused
    (N, 2^bits) compare + column-sum on the VPU — and keeps the largest
    ``j`` whose count is still >= k. Fewer sequential dependencies than
    the bitwise descent at the cost of 2^bits more compares per round.
    """
    assert 32 % bits_per_round == 0
    n_bins = 1 << bits_per_round
    t = jnp.uint32(0)
    js = jnp.arange(1, n_bins, dtype=jnp.uint32)  # j=0 never changes t
    for r in range(32 // bits_per_round):
        shift = jnp.uint32(32 - (r + 1) * bits_per_round)
        cands = t + (js << shift)  # (n_bins-1,) ascending thresholds
        counts = jnp.sum(
            (key[:, None] >= cands[None, :]).astype(jnp.int32), axis=0
        )
        # largest j with count >= k (counts are non-increasing in j)
        ok = counts >= k
        best = jnp.sum(ok.astype(jnp.uint32))  # = best j (0 if none)
        t = t + (best << shift)
    return t


def top_k_select(score, k: int):
    """Drop-in replacement for ``jax.lax.top_k(score, k)`` (1-D input).

    Returns (values, indices) identical to lax.top_k — same descending
    order, same smaller-index tie-break — but sorts only k elements.
    Worth it when k << N; for k close to N, plain lax.top_k is cheaper.
    """
    n = score.shape[0]
    if k >= n:
        return jax.lax.top_k(score, k)
    key = _float_to_ordered_uint32(score)
    t = kth_largest_key(key, k)

    gt = key > t
    eq = key == t
    n_gt = jnp.sum(gt.astype(jnp.int32))
    # Slot assignment: strictly-greater elements first (index order),
    # then ties in index order; ties ranked >= k fall into the dummy
    # slot k and are dropped — precisely lax.top_k's tie-break.
    rank_gt = jnp.cumsum(gt.astype(jnp.int32)) - 1
    rank_eq = n_gt + jnp.cumsum(eq.astype(jnp.int32)) - 1
    slot = jnp.where(gt, rank_gt, jnp.where(eq, rank_eq, k))
    slot = jnp.minimum(slot, k)

    buf_idx = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=False
    )[:k]
    # Every slot < k is written exactly once: rank_gt fills 0..n_gt-1 and
    # rank_eq fills n_gt..k-1 (count(>=t) >= k guarantees enough ties).
    buf_scores = jnp.take(score, buf_idx, axis=0)

    vals, order = jax.lax.top_k(buf_scores, k)
    return vals, jnp.take(buf_idx, order, axis=0)
