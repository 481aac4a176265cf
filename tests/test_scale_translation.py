"""Scale and translation solver tests (scale-solver-test.cc / translation-solver-test.cc analog)."""

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu.ops import compute_tim_norms
from teaserpp_tpu.solvers import (
    solve_scale_tls,
    select_scale_inliers,
    solve_translation_tls,
)
from conftest import random_rotation


def test_scale_tls_clean(rng):
    n = 50
    src = rng.uniform(-1, 1, size=(3, n))
    s = 1.7
    r = random_rotation(rng)
    dst = s * (r @ src)
    sn = compute_tim_norms(jnp.asarray(src))
    dn = compute_tim_norms(jnp.asarray(dst))
    res = solve_scale_tls(sn, dn, noise_bound=0.01)
    assert abs(float(res.scale) - s) < 1e-6
    assert np.asarray(res.inliers).all()


def test_scale_tls_with_outliers(rng):
    n = 60
    src = rng.uniform(-1, 1, size=(3, n))
    s = 0.8
    r = random_rotation(rng)
    dst = s * (r @ src)
    out = rng.choice(n, size=n // 3, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, len(out)))
    sn = compute_tim_norms(jnp.asarray(src))
    dn = compute_tim_norms(jnp.asarray(dst))
    res = solve_scale_tls(sn, dn, noise_bound=0.01)
    assert abs(float(res.scale) - s) < 1e-3


def test_select_scale_inliers_trim(rng):
    n = 40
    src = rng.uniform(-1, 1, size=(3, n))
    r = random_rotation(rng)
    dst = r @ src
    out = rng.choice(n, size=10, replace=False)
    dst[:, out] = rng.uniform(-4, 4, size=(3, 10))
    sn = compute_tim_norms(jnp.asarray(src))
    dn = compute_tim_norms(jnp.asarray(dst))
    res = select_scale_inliers(sn, dn, noise_bound=0.01)
    assert float(res.scale) == 1.0
    # every pair between two clean points must be an inlier
    from teaserpp_tpu.ops import upper_tri_indices

    i_idx, j_idx = upper_tri_indices(n)
    clean = np.ones(n, bool)
    clean[out] = False
    both_clean = clean[i_idx] & clean[j_idx]
    inl = np.asarray(res.inliers)
    assert inl[both_clean].all()
    # and pairs with exactly one outlier should mostly fail the test
    one_out = clean[i_idx] ^ clean[j_idx]
    assert inl[one_out].mean() < 0.2


def test_translation_tls(rng):
    n = 80
    src = rng.uniform(-1, 1, size=(3, n))
    t = np.array([0.3, -1.2, 2.0])
    dst = src + t[:, None]
    out = rng.choice(n, size=n // 4, replace=False)
    dst[:, out] += rng.uniform(1, 3, size=(3, len(out)))
    res = solve_translation_tls(jnp.asarray(src), jnp.asarray(dst), noise_bound=0.01)
    assert np.allclose(np.asarray(res.translation), t, atol=1e-3)
    inl = np.asarray(res.inliers)
    expected = np.ones(n, bool)
    expected[out] = False
    assert np.array_equal(inl, expected)


def test_translation_padding_invariance(rng):
    n = 30
    src = rng.uniform(-1, 1, size=(3, n))
    t = np.array([1.0, 2.0, 3.0])
    dst = src + t[:, None]
    base = solve_translation_tls(jnp.asarray(src), jnp.asarray(dst), 0.01)
    pad = 10
    srcp = np.concatenate([src, rng.normal(size=(3, pad))], axis=1)
    dstp = np.concatenate([dst, rng.normal(size=(3, pad))], axis=1)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = solve_translation_tls(
        jnp.asarray(srcp), jnp.asarray(dstp), 0.01, valid=jnp.asarray(valid)
    )
    assert np.allclose(
        np.asarray(padded.translation), np.asarray(base.translation), atol=1e-12
    )
    assert not np.asarray(padded.inliers)[n:].any()


def test_chain_tims_matches_numpy_reference(rng):
    """chain_tims: cyclic next-selected successor semantics (registration.cc:657-680)."""
    from teaserpp_tpu.ops.tims import chain_tims
    import jax.numpy as jnp

    n = 37
    for trial in range(6):
        v = rng.normal(size=(3, n))
        mask = rng.uniform(size=n) < 0.4
        if trial == 0:
            mask[:] = False
        if trial == 1:
            mask[:] = False
            mask[11] = True  # single selected vertex: successor is itself
        tims, valid = chain_tims(jnp.asarray(v), jnp.asarray(mask))
        tims = np.asarray(tims)
        valid = np.asarray(valid)
        sel = np.flatnonzero(mask)
        exp_valid = np.zeros(n, bool)
        exp = np.zeros((3, n))
        for k, i in enumerate(sel):
            j = sel[(k + 1) % len(sel)]
            exp[:, i] = v[:, j] - v[:, i]
            exp_valid[i] = True
        assert np.array_equal(valid, exp_valid)
        np.testing.assert_allclose(tims, exp, atol=1e-12)
