"""Unit tests: segment reductions vs numpy on random dst-sorted edge arrays."""

import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.ops.segment import segment_max, segment_softmax, segment_sum


def _random_segments(rng, e, n):
    ids = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    return ids


def test_segment_sum_matches_numpy():
    rng = np.random.default_rng(0)
    e, n = 300, 50
    ids = _random_segments(rng, e, n)
    data = rng.standard_normal((e, 4)).astype(np.float32)
    got = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), n))
    want = np.zeros((n, 4), np.float32)
    np.add.at(want, ids, data)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_sum_drops_out_of_range_padding():
    ids = np.array([0, 0, 1, 3, 3], np.int32)  # 3 == num_segments -> dropped
    data = np.ones((5, 2), np.float32)
    got = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(ids), 3))
    want = np.array([[2, 2], [1, 1], [0, 0]], np.float32)
    np.testing.assert_array_equal(got, want)


def test_segment_max():
    rng = np.random.default_rng(1)
    ids = _random_segments(rng, 200, 30)
    data = rng.standard_normal((200,)).astype(np.float32)
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), 30))
    for s in range(30):
        mask = ids == s
        if mask.any():
            assert got[s] == pytest.approx(data[mask].max())


def test_segment_softmax_sums_to_one_with_eps():
    rng = np.random.default_rng(2)
    e, n = 400, 60
    ids = _random_segments(rng, e, n)
    scores = (5 * rng.standard_normal((e, 3))).astype(np.float32)
    alpha = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), n))
    for s in range(n):
        mask = ids == s
        if mask.any():
            # denominator carries +1e-8 so sums are <= 1 but very close
            np.testing.assert_allclose(alpha[mask].sum(axis=0), 1.0, rtol=1e-5)
    assert np.isfinite(alpha).all()


def test_segment_softmax_matches_numpy_reference():
    rng = np.random.default_rng(3)
    ids = np.array([0, 0, 0, 2, 2], np.int32)
    scores = rng.standard_normal((5,)).astype(np.float32)
    alpha = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 3))
    for seg in (slice(0, 3), slice(3, 5)):
        s = scores[seg]
        e = np.exp(s - s.max())
        np.testing.assert_allclose(alpha[seg], e / (e.sum() + 1e-8), rtol=1e-5)
