"""Rotation solver tests (reference rotation-solver-test.cc tier-3 analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from teaserpp_tpu.solvers import (
    solve_rotation_gnc_tls,
    solve_rotation_fgr,
    solve_rotation_quatro,
)
from teaserpp_tpu.utils.metrics import angular_error
from conftest import random_rotation


def _axis_rotation(axis: int, theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_gnc_tls_axis_rotations(rng, axis):
    r = _axis_rotation(axis, 0.8)
    src = rng.uniform(-1, 1, size=(3, 80))
    dst = r @ src
    res = solve_rotation_gnc_tls(jnp.asarray(src), jnp.asarray(dst), 0.01)
    assert angular_error(np.asarray(res.rotation), r) < 1e-5


def test_gnc_tls_with_outliers(rng):
    r = random_rotation(rng)
    n = 120
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src
    out = rng.choice(n, size=n // 3, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, len(out)))
    res = solve_rotation_gnc_tls(jnp.asarray(src), jnp.asarray(dst), 0.01)
    assert angular_error(np.asarray(res.rotation), r) < 1e-3
    inl = np.asarray(res.inliers)
    expected = np.ones(n, bool)
    expected[out] = False
    assert np.array_equal(inl, expected)


def test_gnc_tls_with_noise_and_outliers(rng):
    r = random_rotation(rng)
    n = 200
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src + rng.normal(scale=0.005, size=(3, n))
    out = rng.choice(n, size=n // 2, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, len(out)))
    res = solve_rotation_gnc_tls(jnp.asarray(src), jnp.asarray(dst), 0.02)
    assert angular_error(np.asarray(res.rotation), r) < 0.02


def test_fgr_clean(rng):
    r = random_rotation(rng)
    src = rng.uniform(-1, 1, size=(3, 100))
    dst = r @ src
    res = solve_rotation_fgr(jnp.asarray(src), jnp.asarray(dst), 0.01)
    assert angular_error(np.asarray(res.rotation), r) < 1e-4


def test_fgr_with_outliers(rng):
    r = random_rotation(rng)
    n = 150
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src
    out = rng.choice(n, size=n // 4, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, len(out)))
    res = solve_rotation_fgr(jnp.asarray(src), jnp.asarray(dst), 0.01)
    assert angular_error(np.asarray(res.rotation), r) < 1e-2


def test_quatro_yaw_only(rng):
    r = _axis_rotation(2, 1.2)  # yaw rotation
    n = 100
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src
    res = solve_rotation_quatro(jnp.asarray(src), jnp.asarray(dst), 0.01)
    r_est = np.asarray(res.rotation)
    assert angular_error(r_est, r) < 1e-4
    # bottom-right block must remain the SO(2)-embedded identity
    assert np.allclose(r_est[2], [0, 0, 1])
    assert np.allclose(r_est[:, 2], [0, 0, 1])


def test_quatro_with_outliers(rng):
    r = _axis_rotation(2, -0.5)
    n = 150
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src
    out = rng.choice(n, size=n // 3, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, len(out)))
    res = solve_rotation_quatro(jnp.asarray(src), jnp.asarray(dst), 0.01)
    assert angular_error(np.asarray(res.rotation), r) < 1e-2


def test_gnc_tls_padding_invariance(rng):
    """Masked padding columns must not change the rotation estimate."""
    r = random_rotation(rng)
    n = 60
    src = rng.uniform(-1, 1, size=(3, n))
    dst = r @ src
    out = rng.choice(n, size=10, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, 10))
    base = solve_rotation_gnc_tls(jnp.asarray(src), jnp.asarray(dst), 0.01)

    pad = 20
    srcp = np.concatenate([src, np.zeros((3, pad))], axis=1)
    dstp = np.concatenate([dst, np.zeros((3, pad))], axis=1)
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = solve_rotation_gnc_tls(
        jnp.asarray(srcp), jnp.asarray(dstp), 0.01, valid=jnp.asarray(valid)
    )
    # padding changes summation order inside the einsum/SVD, so allow
    # floating-point-level wiggle
    assert angular_error(np.asarray(padded.rotation), np.asarray(base.rotation)) < 1e-6
    assert np.array_equal(np.asarray(padded.inliers)[:n], np.asarray(base.inliers))
    assert not np.asarray(padded.inliers)[n:].any()
