"""Scalar TLS estimator tests.

Golden cases transcribed from the reference test expectations
(test/teaser/tls-test.cc:21-88: estimates 0.8383 / 0.6425 with known inlier
masks), plus padding-invariance properties unique to our fixed-shape design.
"""

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.ops import scalar_tls


def _golden_case_no_outlier():
    x = np.array([0.5, 1, 0.6, 0.7, 1.2])
    r = np.array([0.9, 0.9, 0.4, 0.5, 0.4])
    return x, r, 0.8383, np.array([True] * 5)


def _golden_case_one_outlier():
    x = np.array([0.5, 1, 0.6, 0.7, 1.2, 10])
    r = np.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
    return x, r, 0.8383, np.array([True] * 5 + [False])


def _golden_case_three_outliers():
    x = np.array([0.5, 1, 0.6, 20, 16, 10])
    r = np.array([0.9, 0.9, 0.4, 0.5, 0.4, 0.5])
    return x, r, 0.6425, np.array([True, True, True, False, False, False])


def test_tls_golden_no_outlier():
    x, r, est_ref, inl_ref = _golden_case_no_outlier()
    res = scalar_tls(jnp.asarray(x), jnp.asarray(r))
    assert abs(float(res.estimate) - est_ref) < 1e-3
    assert np.array_equal(np.asarray(res.inliers), inl_ref)


def test_tls_golden_one_outlier():
    x, r, est_ref, inl_ref = _golden_case_one_outlier()
    res = scalar_tls(jnp.asarray(x), jnp.asarray(r))
    assert abs(float(res.estimate) - est_ref) < 1e-3
    assert np.array_equal(np.asarray(res.inliers), inl_ref)


def test_tls_golden_three_outliers():
    x, r, est_ref, inl_ref = _golden_case_three_outliers()
    res = scalar_tls(jnp.asarray(x), jnp.asarray(r))
    assert abs(float(res.estimate) - est_ref) < 1e-3
    assert np.array_equal(np.asarray(res.inliers), inl_ref)


def test_tls_padding_invariance():
    """Appending invalid (masked) measurements must not change the result."""
    x, r, est_ref, inl_ref = _golden_case_three_outliers()
    pad = 7
    xp = np.concatenate([x, np.full(pad, 123.0)])
    rp = np.concatenate([r, np.full(pad, 0.1)])
    valid = np.concatenate([np.ones(len(x), bool), np.zeros(pad, bool)])
    res = scalar_tls(jnp.asarray(xp), jnp.asarray(rp), valid=jnp.asarray(valid))
    assert abs(float(res.estimate) - est_ref) < 1e-3
    assert np.array_equal(np.asarray(res.inliers)[: len(x)], inl_ref)
    assert not np.asarray(res.inliers)[len(x):].any()


def test_tls_batched_vmap(rng):
    """vmap over a batch of problems matches per-problem solves."""
    batch = 8
    n = 32
    xs = rng.normal(size=(batch, n)) * 2
    rs = rng.uniform(0.2, 1.0, size=(batch, n))
    batched = jax.vmap(lambda x, r: scalar_tls(x, r))(
        jnp.asarray(xs), jnp.asarray(rs)
    )
    for b in range(batch):
        single = scalar_tls(jnp.asarray(xs[b]), jnp.asarray(rs[b]))
        assert np.isclose(float(batched.estimate[b]), float(single.estimate))
        assert np.array_equal(
            np.asarray(batched.inliers[b]), np.asarray(single.inliers)
        )


def test_tls_exactness_dense_consensus(rng):
    """With a dominant consensus around a value, the estimate lands on it."""
    true_val = 3.2
    n = 200
    x = np.full(n, true_val) + rng.normal(scale=0.01, size=n)
    x[:50] = rng.uniform(-50, 50, size=50)  # outliers
    r = np.full(n, 0.05)
    res = scalar_tls(jnp.asarray(x), jnp.asarray(r))
    assert abs(float(res.estimate) - true_val) < 0.01
    assert np.asarray(res.inliers)[50:].all()


def test_tls_fixed_range_matches_general(rng):
    """The constant-range fast path agrees with the general estimator."""
    from teaserpp_tpu.ops.tls import scalar_tls_fixed_range

    for trial in range(8):
        n = 64
        x = rng.normal(size=n) * 3
        beta = float(rng.uniform(0.05, 1.0))
        r = np.full(n, beta)
        gen = scalar_tls(jnp.asarray(x), jnp.asarray(r))
        fast = scalar_tls_fixed_range(jnp.asarray(x), beta)
        assert np.isclose(float(fast.estimate), float(gen.estimate), atol=1e-9)
        assert np.isclose(float(fast.cost), float(gen.cost), atol=1e-7)
        assert np.array_equal(np.asarray(fast.inliers), np.asarray(gen.inliers))


def test_tls_fixed_range_padding_and_vmap(rng):
    """Fixed-range path: masked padding is inert and vmap matches loops."""
    from teaserpp_tpu.ops.tls import scalar_tls_fixed_range

    n, pad, batch = 48, 9, 6
    beta = 0.2
    xs = rng.normal(size=(batch, n)) * 2
    xp = np.concatenate([xs, np.full((batch, pad), 77.0)], axis=1)
    valid = np.concatenate(
        [np.ones((batch, n), bool), np.zeros((batch, pad), bool)], axis=1
    )
    batched = jax.vmap(lambda x, v: scalar_tls_fixed_range(x, beta, valid=v))(
        jnp.asarray(xp), jnp.asarray(valid)
    )
    for b in range(batch):
        single = scalar_tls_fixed_range(jnp.asarray(xs[b]), beta)
        assert np.isclose(float(batched.estimate[b]), float(single.estimate))
        assert np.array_equal(
            np.asarray(batched.inliers[b])[:n], np.asarray(single.inliers)
        )
        assert not np.asarray(batched.inliers[b])[n:].any()


def test_tls_estimate_tiled_golden_cases():
    """Golden cases of the reference's tiled estimator (tls-test.cc:88-150).

    ``estimate_tiled`` (registration.cc:90-204) evaluates consensus at the
    midpoints between consecutive sorted interval endpoints; the consensus
    set at the center between events k and k+1 equals the open set after
    event k in our sweep formulation, so :func:`scalar_tls` reproduces the
    tiled variant's outputs exactly (the tile size ``s=64`` only changes the
    reference's loop schedule, not its math).
    """
    cases = [
        # (measurements, ranges, expected_estimate, expected_inliers)
        (
            [0.5, 1, 0.6, 0.7, 1.2],
            [0.9, 0.9, 0.4, 0.5, 0.4],
            0.8383,
            [True, True, True, True, True],
        ),
        (
            [0.5, 1, 0.6, 0.7, 1.2, 10],
            [0.9, 0.9, 0.4, 0.5, 0.4, 0.5],
            0.8383,
            [True, True, True, True, True, False],
        ),
        (
            [0.5, 1, 0.6, 20, 16, 10],
            [0.9, 0.9, 0.4, 0.5, 0.4, 0.5],
            0.6425,
            [True, True, True, False, False, False],
        ),
    ]
    for x, r, est_ref, inl_ref in cases:
        res = scalar_tls(jnp.asarray(x, jnp.float64), jnp.asarray(r, jnp.float64))
        assert abs(float(res.estimate) - est_ref) < 1e-3
        assert np.array_equal(np.asarray(res.inliers), np.asarray(inl_ref))
