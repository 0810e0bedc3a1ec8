"""Blocked (scatter-free) segment ops vs the XLA segment references.

Covers values AND gradients: the whole point of the blocked formulation is a
custom VJP with no scatter, so the backward must match XLA's autodiff of
``jax.ops.segment_*`` exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sslrec_tpu.ops import segment as seg
from sslrec_tpu.ops.pallas_segment import (
    build_blocked_segments, segment_max_blocked, segment_softmax_blocked,
    segment_sum_blocked, take_blocked)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    n, S = 1000, 37          # several empty segments, skewed sizes
    ids = np.sort(rng.integers(0, S, n))        # sorted (KG edges are)
    ids[ids == 5] = 6                            # force an empty segment
    bs = build_blocked_segments(ids, S, r=16, m=32)
    data = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    logits = jnp.asarray((rng.normal(size=n) * 5).astype(np.float32))
    return bs, jnp.asarray(ids.astype(np.int32)), data, logits, S


def test_segment_sum_values_and_grad(case):
    bs, ids, data, _, S = case
    ref = seg.segment_sum(data, ids, S)
    got = segment_sum_blocked(bs, data, True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # 1-D variant
    np.testing.assert_allclose(
        segment_sum_blocked(bs, data[:, 0], True),
        seg.segment_sum(data[:, 0], ids, S), rtol=1e-5, atol=1e-5)

    def f(d):
        return jnp.sum(jnp.sin(segment_sum_blocked(bs, d, True)))

    def f_ref(d):
        return jnp.sum(jnp.sin(seg.segment_sum(d, ids, S)))

    np.testing.assert_allclose(jax.grad(f)(data), jax.grad(f_ref)(data),
                               rtol=1e-5, atol=1e-5)


def test_take_blocked_values_and_grad(case):
    bs, ids, data, _, S = case
    x = jnp.asarray(np.random.default_rng(1).normal(size=(S, 8)), jnp.float32)
    np.testing.assert_allclose(take_blocked(bs, x, True), x[ids])

    def f(x):
        return jnp.sum(jnp.cos(take_blocked(bs, x, True)) * data)

    def f_ref(x):
        return jnp.sum(jnp.cos(x[ids]) * data)

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x),
                               rtol=1e-5, atol=1e-5)


def test_segment_max(case):
    bs, ids, _, logits, S = case
    got = segment_max_blocked(bs, logits, True)
    ref = seg.segment_max(logits, ids, S)
    live = np.isfinite(np.asarray(ref))
    np.testing.assert_allclose(np.asarray(got)[live], np.asarray(ref)[live],
                               rtol=1e-6)
    assert not np.isfinite(np.asarray(got)[~live]).any()  # empty segments -inf


def test_segment_softmax_values_and_grad(case):
    bs, ids, data, logits, S = case
    got = segment_softmax_blocked(bs, logits, True)
    ref = seg.segment_softmax(logits, ids, S)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    w = data[:, 0]

    def f(l):
        return jnp.sum(segment_softmax_blocked(bs, l, True) * w
                       + 0.1 * jnp.sin(segment_softmax_blocked(bs, l, True)))

    def f_ref(l):
        return jnp.sum(seg.segment_softmax(l, ids, S) * w
                       + 0.1 * jnp.sin(seg.segment_softmax(l, ids, S)))

    np.testing.assert_allclose(jax.grad(f)(logits), jax.grad(f_ref)(logits),
                               rtol=1e-4, atol=1e-6)


def test_rgat_style_hop_grad(case):
    """Full message-passing hop: gather endpoints → attention softmax →
    weighted segment sum; gradients wrt node embeddings match XLA end-to-end."""
    bs, ids, data, logits, S = case
    rng = np.random.default_rng(2)
    n = ids.shape[0]
    tails = rng.integers(0, S, n)
    bs_t = build_blocked_segments(tails, S, r=16, m=32)
    t_ids = jnp.asarray(tails.astype(np.int32))
    x = jnp.asarray(rng.normal(size=(S, 8)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(8,)), jnp.float32)

    def hop_blocked(x):
        h_e = take_blocked(bs, x, True)
        t_e = take_blocked(bs_t, x, True)
        lg = jnp.sum(h_e * t_e * a, axis=-1)
        e = segment_softmax_blocked(bs, lg, True)
        return jnp.sum(jnp.sin(segment_sum_blocked(bs, t_e * e[:, None], True)))

    def hop_ref(x):
        h_e = x[ids]
        t_e = x[t_ids]
        lg = jnp.sum(h_e * t_e * a, axis=-1)
        e = seg.segment_softmax(lg, ids, S)
        return jnp.sum(jnp.sin(seg.segment_sum(t_e * e[:, None], ids, S)))

    np.testing.assert_allclose(hop_blocked(x), hop_ref(x), rtol=1e-5)
    np.testing.assert_allclose(jax.grad(hop_blocked)(x), jax.grad(hop_ref)(x),
                               rtol=1e-4, atol=1e-5)


def test_attn_aggregate_matches_softmax_sum(case):
    from sslrec_tpu.ops.pallas_segment import attn_aggregate

    bs, ids, data, logits, S = case
    mask = (np.random.default_rng(3).random(ids.shape[0]) > 0.4).astype(np.float32)
    mask = jnp.asarray(mask)
    masked_logits = jnp.where(mask > 0, logits, -1e9)

    def ref(l):
        e = seg.segment_softmax(jnp.where(mask > 0, l, -1e9), ids, S) * mask
        return seg.segment_sum(data * e[:, None], ids, S)

    def fused(l):
        out, _ = attn_aggregate(bs, jnp.where(mask > 0, l, -1e9), data, mask, True)
        return out

    np.testing.assert_allclose(fused(logits), ref(logits), rtol=1e-4, atol=1e-6)
    g1 = jax.grad(lambda l: jnp.sum(jnp.sin(fused(l))))(logits)
    g2 = jax.grad(lambda l: jnp.sum(jnp.sin(ref(l))))(logits)
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-6)
