"""Pluggable stage estimators (reference setScale/Rotation/TranslationEstimator,
registration.h:623-644): user callables replace individual pipeline stages."""

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu import (
    InlierSelectionMode,
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
)
from tests.conftest import make_registration_problem


def _problem(rng):
    return make_registration_problem(
        rng, n=80, outlier_ratio=0.5, noise=0.005, translation_scale=0.5
    )


def test_custom_scale_estimator(rng):
    src, dst, s_true, r_true, t_true, _ = _problem(rng)
    calls = {}

    def fixed_scale(src_tims, dst_tims):
        calls["shapes"] = (src_tims.shape, dst_tims.shape)
        k = src_tims.shape[1]
        return s_true, np.ones(k, bool)  # oracle scale, no pruning

    solver = RobustRegistrationSolver(
        RobustRegistrationSolverParams(
            noise_bound=0.01, estimate_scaling=True,
            inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
        )
    )
    solver.setScaleEstimator(fixed_scale)
    sol = solver.solve(src, dst)
    n = src.shape[1]
    assert calls["shapes"] == ((3, n * (n - 1) // 2),) * 2
    assert sol.valid
    assert sol.scale == s_true
    cos = (np.trace(r_true.T @ sol.rotation) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    assert np.linalg.norm(sol.translation - t_true) < 0.05


def test_custom_rotation_estimator(rng):
    src, dst, s_true, r_true, t_true, _ = _problem(rng)

    def oracle_rotation(src_tims, dst_tims):
        res_sq = np.sum((dst_tims - r_true @ src_tims) ** 2, axis=0)
        return r_true, res_sq < (0.02 / s_true) ** 2, 0.0

    solver = RobustRegistrationSolver(
        RobustRegistrationSolverParams(noise_bound=0.01, estimate_scaling=True)
    )
    solver.setRotationEstimator(oracle_rotation)
    sol = solver.solve(src, dst)
    assert sol.valid
    np.testing.assert_allclose(sol.rotation, r_true, atol=1e-12)
    assert np.linalg.norm(sol.translation - t_true) < 0.05
    assert abs(sol.scale - s_true) < 0.05
    assert solver.getGNCRotationCostAtTermination() == 0.0
    # masks reflect the custom stage's output
    assert solver.getRotationInliersMask().sum() > 0


def test_custom_translation_estimator(rng):
    src, dst, s_true, r_true, t_true, _ = _problem(rng)

    def median_translation(aligned_src, dst_pts):
        raw = dst_pts - aligned_src
        t = np.median(raw, axis=1)
        inl = np.linalg.norm(raw - t[:, None], axis=0) < 0.05
        return t, inl

    solver = RobustRegistrationSolver(
        RobustRegistrationSolverParams(noise_bound=0.01, estimate_scaling=True)
    )
    solver.setTranslationEstimator(median_translation)
    sol = solver.solve(src, dst)
    assert sol.valid
    assert np.linalg.norm(sol.translation - t_true) < 0.05
    assert solver.getTranslationInliersMask().any()


def test_custom_estimators_survive_solve_and_clear(rng):
    """Estimators persist across solves (reference member-object semantics)
    and None restores the default stage."""
    src, dst, s_true, r_true, t_true, _ = _problem(rng)
    count = {"n": 0}

    def counting_rotation(src_tims, dst_tims):
        count["n"] += 1
        return r_true, np.ones(src_tims.shape[1], bool), 0.0

    solver = RobustRegistrationSolver(
        RobustRegistrationSolverParams(noise_bound=0.01, estimate_scaling=True)
    )
    solver.setRotationEstimator(counting_rotation)
    solver.solve(src, dst)
    solver.solve(src, dst)
    assert count["n"] == 2
    solver.setRotationEstimator(None)
    sol = solver.solve(src, dst)
    assert count["n"] == 2  # default stage ran instead
    cos = (np.trace(r_true.T @ sol.rotation) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
