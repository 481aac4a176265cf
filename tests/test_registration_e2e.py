"""End-to-end registration tests (reference registration-test.cc tier-3 analog).

Synthetic known-transform problems with injected outliers, across inlier
selection modes, rotation algorithms, and graph formulations.
"""

import numpy as np
import pytest

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    RotationEstimationAlgorithm,
    InlierSelectionMode,
    InlierGraphFormulation,
)
from teaserpp_tpu.utils.metrics import angular_error, translation_error
from conftest import make_registration_problem


def _check(solution, s, r, t, s_tol=1e-3, r_tol=0.01, t_tol=0.02):
    assert solution.valid
    assert abs(solution.scale - s) < s_tol
    assert angular_error(solution.rotation, r) < r_tol
    assert translation_error(solution.translation, t) < t_tol


def test_known_scale_no_clique(rng):
    src, dst, s, r, t, _ = make_registration_problem(rng, n=100, outlier_ratio=0.3)
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.NONE,
    )
    solver = RobustRegistrationSolver(params)
    sol = solver.solve(src, dst)
    _check(sol, s, r, t)


@pytest.mark.parametrize(
    "mode",
    [
        InlierSelectionMode.PMC_EXACT,
        InlierSelectionMode.PMC_HEU,
        InlierSelectionMode.KCORE_HEU,
    ],
)
def test_outlier_detection_modes(rng, mode):
    """90% outliers, known scale: recover transform and the inlier set
    (reference registration-test.cc:394-467 / 535-651)."""
    src, dst, s, r, t, inlier_mask = make_registration_problem(
        rng, n=100, outlier_ratio=0.9
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        cbar2=1.0,
        estimate_scaling=False,
        inlier_selection_mode=mode,
    )
    solver = RobustRegistrationSolver(params)
    sol = solver.solve(src, dst)
    _check(sol, s, r, t)
    clique = set(solver.getInlierMaxClique())
    true_inliers = set(np.nonzero(inlier_mask)[0].tolist())
    # max clique must recover the true inlier set (exactly, for exact mode)
    if mode == InlierSelectionMode.PMC_EXACT:
        assert clique == true_inliers
    else:
        assert clique >= true_inliers or len(clique & true_inliers) >= 0.9 * len(
            true_inliers
        )


def test_unknown_scale_full_decoupled_solve(rng):
    """Unknown scale path (reference registration-test.cc:256-392 analog)."""
    src, dst, s, r, t, _ = make_registration_problem(
        rng, n=60, outlier_ratio=0.5, scale=1.4
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=True,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    _check(sol, s, r, t, s_tol=1e-3)


@pytest.mark.parametrize(
    "alg",
    [
        RotationEstimationAlgorithm.GNC_TLS,
        RotationEstimationAlgorithm.FGR,
    ],
)
def test_rotation_algorithms_e2e(rng, alg):
    src, dst, s, r, t, _ = make_registration_problem(rng, n=80, outlier_ratio=0.6)
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        rotation_estimation_algorithm=alg,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    _check(sol, s, r, t)


def test_complete_graph_formulation(rng):
    src, dst, s, r, t, _ = make_registration_problem(rng, n=60, outlier_ratio=0.5)
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        rotation_tim_graph=InlierGraphFormulation.COMPLETE,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    _check(sol, s, r, t)


def test_noisy_problem(rng):
    src, dst, s, r, t, _ = make_registration_problem(
        rng, n=100, outlier_ratio=0.9, noise=0.01
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.0337,  # reference benchmark_6 noise bound
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    _check(sol, s, r, t, r_tol=0.05, t_tol=0.05)


def test_introspection_getters(rng):
    src, dst, s, r, t, inlier_mask = make_registration_problem(
        rng, n=50, outlier_ratio=0.4
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    solver = RobustRegistrationSolver(params)
    solver.solve(src, dst)
    n = 50
    k = n * (n - 1) // 2
    assert solver.getScaleInliersMask().shape == (k,)
    assert solver.getScaleInliersMap().shape == (2, k)
    assert len(solver.getScaleInliers()) == solver.getScaleInliersMask().sum()
    clique = solver.getInlierMaxClique()
    m = len(clique)
    assert m > 1
    assert solver.getRotationInliersMask().shape == (m,)
    assert solver.getTranslationInliersMask().shape == (m,)
    assert solver.getMaxCliqueSrcTIMs().shape == (3, m)
    assert solver.getMaxCliqueDstTIMs().shape == (3, m)
    assert solver.getSrcTIMsMapForRotation().shape == (2, m)
    assert solver.getSrcTIMs().shape == (3, k)
    assert solver.getDstTIMs().shape == (3, k)
    graph = solver.getInlierGraph()
    assert len(graph) == n
    ordered = solver.getInputOrderedTranslationInliers()
    assert set(ordered) <= set(clique)
    assert solver.getGNCRotationCostAtTermination() >= 0


def test_deprecated_param_fields(rng):
    src, dst, s, r, t, _ = make_registration_problem(rng, n=40, outlier_ratio=0.2)
    # use_max_clique=False -> NONE mode (reference registration.cc:574-578)
    params = RobustRegistrationSolverParams(
        noise_bound=0.01, estimate_scaling=False, use_max_clique=False
    )
    solver = RobustRegistrationSolver(params)
    sol = solver.solve(src, dst)
    assert sol.valid
    assert len(solver.getInlierMaxClique()) == 40  # everything "in the clique"


def test_cloud_correspondence_overload(rng):
    from teaserpp_tpu.utils.geometry import PointCloud

    src, dst, s, r, t, _ = make_registration_problem(rng, n=50, outlier_ratio=0.3)
    src_cloud = PointCloud(src.T)
    dst_cloud = PointCloud(dst.T)
    correspondences = [(i, i) for i in range(50)]
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src_cloud, dst_cloud, correspondences)
    _check(sol, s, r, t)


def test_degenerate_all_outliers(rng):
    """With essentially no consistent pairs the solve reports invalid."""
    n = 30
    src = rng.uniform(-1, 1, size=(3, n))
    dst = rng.uniform(-100, 100, size=(3, n))  # pure garbage
    params = RobustRegistrationSolverParams(
        noise_bound=1e-6,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    assert not sol.valid


def test_final_polish_improves_small_inlier_accuracy(rng):
    """final_polish re-fits (R, t) on the inlier points: at tiny inlier
    counts it must be at least as accurate as the chain-TIM estimate
    and must not disturb clean large-inlier solves."""
    import jax.numpy as jnp
    from teaserpp_tpu.solvers.pipeline import register_pair
    from teaserpp_tpu.utils.metrics import rotation_error_deg
    from tests.conftest import make_registration_problem

    errs = {True: [], False: []}
    for seed in range(6):
        r2 = np.random.default_rng(500 + seed)
        src, dst, s, r_true, t_true, _ = make_registration_problem(
            r2, n=400, outlier_ratio=0.95, noise=0.002, translation_scale=0.3
        )
        for polish in (False, True):
            params = RobustRegistrationSolverParams(
                noise_bound=0.004,
                estimate_scaling=False,
                inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
                kcore_heuristic_threshold=0.0,
                final_polish=polish,
            )
            sol = register_pair(
                jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), params
            )
            errs[polish].append(
                rotation_error_deg(np.asarray(sol.rotation, np.float64), r_true)
            )
            if polish:
                assert np.linalg.norm(
                    np.asarray(sol.translation, np.float64) - t_true
                ) < 0.01
    assert np.mean(errs[True]) <= np.mean(errs[False]) * 1.05
