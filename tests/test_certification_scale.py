"""At-scale certification tests (VERDICT r2 #1 done-gates).

Instance generation mirrors the reference's own random certification tests
(certification-test.cc:530-644 RandomInstances/RandomLargeInstsances): exact
rotation, exact theta, trailing 10% outliers at Random*5+5 — and, notably,
NO noise on the inliers (the reference computes a `noise` matrix and never
adds it, certification-test.cc:551-553/612-614; v2 = R * v1 exactly). In
that regime the KKT dual guess is feasible at once and the certificate
lands with gap <= 1e-5 (the reference's own expectation) within an
iteration or two — which is what makes N up to 499 (npm = 2000) affordable
on the CPU test host. Noisy GNC-estimated instances are covered at smaller
N by test_certification.py and on-chip by scripts/bench_certification_tpu.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.certification.drs import DRSCertifier, _certify_dispatch
from teaserpp_tpu.params import DRSCertifierParams, EigSolverType


def reference_style_instance(rng, n, outlier_ratio=0.1):
    """certification-test.cc:544-562 generation -> (R, v1, v2, theta)."""
    v1 = rng.uniform(-1, 1, (3, n))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    v2 = q @ v1
    k = int(n * (1 - outlier_ratio))
    theta = np.ones(n)
    theta[k:] = -1
    v2[:, k:] = rng.uniform(-1, 1, (3, n - k)) * 5 + 5
    return q, v1, v2, theta


def test_dense_iterative_cross_check_n200(rng):
    """Dense and shift-invert paths agree at N=200 (npm=804) — the
    intermediate-N cross-check between the golden N~100 instances and the
    npm>=2000 pin below. Expectation matches the reference's own
    RandomLargeInstsances gate: is_optimal with gap <= 1e-5."""
    r, v1, v2, theta = reference_style_instance(rng, 200)
    dense = DRSCertifier(DRSCertifierParams(noise_bound=0.01)).certify(
        r, v1, v2, theta
    )
    it = DRSCertifier(
        DRSCertifierParams(
            noise_bound=0.01,
            eig_decomposition_solver=EigSolverType.ITERATIVE,
        )
    ).certify(r, v1, v2, theta)
    assert dense.is_optimal and it.is_optimal
    assert dense.best_suboptimality <= 1e-5
    assert it.best_suboptimality <= 1e-5
    assert not it.rank_saturated


def test_sustained_iterative_noisy_gnc_n150(rng):
    """Sustained production-regime DRS through the chunked dispatcher.

    Unlike the reference-style instances above (noise-free, KKT-feasible at
    once — they certify in ~1 iteration and only measure setup), a NOISY
    GNC-solved instance needs hundreds of DRS iterations (CPU calibration:
    N=200 certifies in ~302 dense / ~399 iterative iterations,
    PERFORMANCE.md "Certification at scale"). This is the only suite test
    that runs the ITERATIVE loop long enough to exercise the at-scale
    machinery end-to-end — warm-started shift-invert across segment
    boundaries, the Cholesky proof cadence, saturation/adaptive-rank — via
    iterations_per_dispatch=50 exactly as the axon backend dispatches it.
    """
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls

    n, nb = 150, 0.03
    v1 = rng.standard_normal((3, n))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    v2 = q @ v1 + rng.standard_normal((3, n)) * (nb / 4)  # noisy inliers
    out_idx = rng.choice(n, n // 4, replace=False)
    v2[:, out_idx] = rng.standard_normal((3, len(out_idx))) * 2
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)

    params = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        max_iterations=800,  # the noisy regime blows the default 200 budget
        iterations_per_dispatch=50,
    )
    res = DRSCertifier(params).certify(np.asarray(rot.rotation), v1, v2, theta)
    # the certificate must be Cholesky-PROVEN optimal (is_optimal only sets
    # after the in-loop proof gate) and must have taken a sustained run —
    # far beyond the noise-free instances' 1-iteration convergence AND
    # beyond the reference's own default 200-iteration budget
    # (certification.h:79), which is the parameter guidance this pins.
    assert res.is_optimal
    assert not res.rank_saturated
    iters = len(res.suboptimality_traj)
    assert iters > 100, f"expected a sustained DRS run, got {iters} iters"


def test_iterative_certifies_npm_2000(rng):
    """ITERATIVE certification at N=499 -> npm = 4*499+4 = 2000, the scale
    the shift-invert path exists for (reference Spectra threshold territory,
    certification.h:58-64). The certificate must be Cholesky-proven optimal
    with no saturation at a fixed modest subspace rank."""
    n = 499
    r, v1, v2, theta = reference_style_instance(rng, n)
    params = DRSCertifierParams(
        noise_bound=0.01,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=96,
    )
    fn = jax.jit(_certify_dispatch, static_argnames=("params",))
    best, traj, iters, sat = fn(
        jnp.asarray(r), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(theta), params,
    )
    assert 4 * n + 4 == 2000
    assert float(best) <= 1e-5
    assert not bool(sat)
    # the noise-free optimum certifies from the KKT dual guess immediately
    assert int(iters) <= 5
