"""Degenerate-input robustness: tiny N, collinear/planar clouds, no outliers."""

import numpy as np
import pytest

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
)
from teaserpp_tpu.utils.metrics import angular_error, translation_error
from conftest import random_rotation


def _params(**kw):
    base = dict(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    base.update(kw)
    return RobustRegistrationSolverParams(**base)


def test_minimal_three_points(rng):
    src = rng.uniform(-1, 1, size=(3, 3))
    r = random_rotation(rng)
    t = np.array([0.1, 0.2, 0.3])
    dst = r @ src + t[:, None]
    sol = RobustRegistrationSolver(_params()).solve(src, dst)
    assert sol.valid
    assert angular_error(sol.rotation, r) < 1e-5
    assert translation_error(sol.translation, t) < 1e-5


def test_two_points(rng):
    """N=2: a single TIM; rotation is underdetermined but must not crash."""
    src = rng.uniform(-1, 1, size=(3, 2))
    r = random_rotation(rng)
    dst = r @ src
    sol = RobustRegistrationSolver(_params()).solve(src, dst)
    assert sol.valid
    assert np.isfinite(sol.rotation).all()
    assert np.isfinite(sol.translation).all()


def test_collinear_points(rng):
    """Collinear cloud: rotation about the line is unobservable; the solve
    must stay finite and map src onto dst."""
    direction = rng.normal(size=3)
    direction /= np.linalg.norm(direction)
    ts = np.linspace(-1, 1, 20)
    src = direction[:, None] * ts[None, :]
    r = random_rotation(rng)
    t = np.array([0.3, -0.1, 0.2])
    dst = r @ src + t[:, None]
    sol = RobustRegistrationSolver(_params()).solve(src, dst)
    assert sol.valid
    assert np.isfinite(sol.rotation).all()
    residual = np.linalg.norm(
        dst - (sol.scale * sol.rotation @ src + sol.translation[:, None])
    )
    assert residual < 1e-4


def test_identity_transform(rng):
    src = rng.uniform(-1, 1, size=(3, 40))
    sol = RobustRegistrationSolver(_params()).solve(src, src.copy())
    assert sol.valid
    assert angular_error(sol.rotation, np.eye(3)) < 1e-6
    assert np.linalg.norm(sol.translation) < 1e-6
    assert sol.scale == 1.0


def test_clean_unknown_scale_tiny(rng):
    src = rng.uniform(-1, 1, size=(3, 5))
    r = random_rotation(rng)
    s = 2.5
    dst = s * (r @ src)
    sol = RobustRegistrationSolver(
        _params(estimate_scaling=True)
    ).solve(src, dst)
    assert sol.valid
    assert abs(sol.scale - s) < 1e-6
    assert angular_error(sol.rotation, r) < 1e-6


def test_duplicate_points_do_not_crash(rng):
    src = rng.uniform(-1, 1, size=(3, 30))
    src[:, 10] = src[:, 11]  # exact duplicate -> zero-norm TIM
    r = random_rotation(rng)
    dst = r @ src
    sol = RobustRegistrationSolver(
        _params(estimate_scaling=True)
    ).solve(src, dst)
    assert sol.valid
    assert np.isfinite(sol.rotation).all()
    assert angular_error(sol.rotation, r) < 1e-4


def test_huge_scale_difference(rng):
    src = rng.uniform(-1, 1, size=(3, 30))
    r = random_rotation(rng)
    s = 1e3
    dst = s * (r @ src)
    sol = RobustRegistrationSolver(
        _params(estimate_scaling=True, noise_bound=1e-3)
    ).solve(src, dst)
    assert sol.valid
    assert abs(sol.scale - s) / s < 1e-5
