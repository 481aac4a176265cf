"""Quatro end-to-end mode and the iterative (Spectra-analog) gap solver."""

import numpy as np
import pytest

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    RotationEstimationAlgorithm,
    InlierSelectionMode,
    DRSCertifier,
    DRSCertifierParams,
    EigSolverType,
)
from teaserpp_tpu.utils.metrics import angular_error, translation_error


def test_quatro_end_to_end(rng):
    """Yaw-only transform with outliers: Quatro recovers SO(2) rotation
    (reference Quatro use case, registration.cc:280-408)."""
    n = 80
    src = rng.uniform(-1, 1, size=(3, n))
    theta = 0.9
    r = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ]
    )
    t = np.array([0.5, -0.2, 0.8])
    dst = r @ src + t[:, None]
    out = rng.choice(n, size=n // 2, replace=False)
    dst[:, out] = rng.uniform(-4, 4, size=(3, len(out)))

    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        rotation_estimation_algorithm=RotationEstimationAlgorithm.QUATRO,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    assert sol.valid
    assert angular_error(sol.rotation, r) < 0.01
    assert translation_error(sol.translation, t) < 0.02
    # Quatro output must be an SO(2) embedding
    assert np.allclose(sol.rotation[2], [0, 0, 1])


def test_iterative_gap_solver_matches_dense(rng):
    """ITERATIVE (LOBPCG) min-eig gap equals the dense eigh gap."""
    import jax.numpy as jnp
    from teaserpp_tpu.certification.drs import suboptimality_gap

    n = 12
    npm = 4 * n + 4
    a = rng.normal(size=(npm, npm))
    sym = (a + a.T) / 2 - 2.0 * np.eye(npm)  # make lambda_min negative
    mu = 3.7
    dense = float(suboptimality_gap(jnp.asarray(sym), jnp.asarray(mu), n))
    iterative = float(
        suboptimality_gap(
            jnp.asarray(sym), jnp.asarray(mu), n, EigSolverType.ITERATIVE
        )
    )
    assert dense > 0
    assert abs(dense - iterative) / dense < 1e-5


def test_certify_with_iterative_solver(rng):
    """Full certification with the ITERATIVE gap backend stays optimal."""
    from teaserpp_tpu.ops import compute_tims
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls
    import jax.numpy as jnp

    from conftest import make_registration_problem

    src, dst, s, r, t, _ = make_registration_problem(
        rng, n=15, outlier_ratio=0.2, noise=0.01, translation_scale=0.0
    )
    src_tims = np.asarray(compute_tims(jnp.asarray(src)))
    dst_tims = np.asarray(compute_tims(jnp.asarray(dst)))
    nb = 0.06
    rot = solve_rotation_gnc_tls(jnp.asarray(src_tims), jnp.asarray(dst_tims), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    certifier = DRSCertifier(
        DRSCertifierParams(
            noise_bound=nb, eig_decomposition_solver=EigSolverType.ITERATIVE
        )
    )
    result = certifier.certify(np.asarray(rot.rotation), src_tims, dst_tims, theta)
    assert result.is_optimal
