"""Unit tests for weighted Procrustes and geometry helpers (utils-test.cc analog)."""

import numpy as np

from teaserpp_tpu.ops import svd_rot, svd_rot_2d, calculate_diameter
from conftest import random_rotation


def test_svd_rot_recovers_rotation(rng):
    r = random_rotation(rng)
    x = rng.normal(size=(3, 50))
    y = r @ x
    w = np.ones(50)
    r_est = np.asarray(svd_rot(x, y, w))
    assert np.allclose(r_est, r, atol=1e-8)
    assert np.isclose(np.linalg.det(r_est), 1.0)


def test_svd_rot_weights_ignore_outliers(rng):
    r = random_rotation(rng)
    x = rng.normal(size=(3, 60))
    y = r @ x
    y[:, :10] = rng.normal(size=(3, 10)) * 10  # corrupted columns
    w = np.ones(60)
    w[:10] = 0.0
    r_est = np.asarray(svd_rot(x, y, w))
    assert np.allclose(r_est, r, atol=1e-8)


def test_svd_rot_det_flip_on_degenerate_planar_data(rng):
    # Planar points can produce a reflection without the det fix.
    theta = 0.7
    r = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    x = rng.normal(size=(3, 30))
    x[2] = 0.0
    y = r @ x
    r_est = np.asarray(svd_rot(x, y, np.ones(30)))
    assert np.isclose(np.linalg.det(r_est), 1.0)
    assert np.allclose(r_est @ x, y, atol=1e-8)


def test_svd_rot_2d(rng):
    theta = -1.1
    r2 = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    x = rng.normal(size=(2, 40))
    y = r2 @ x
    r_est = np.asarray(svd_rot_2d(x, y, np.ones(40)))
    assert np.allclose(r_est, r2, atol=1e-8)


def test_calculate_diameter_matches_reference_definition(rng):
    x = rng.normal(size=(3, 100))
    cog = x.mean(axis=1, keepdims=True)
    expected = 2 * np.sqrt(((x - cog) ** 2).sum(axis=0).max())
    assert np.isclose(float(calculate_diameter(x)), expected)
