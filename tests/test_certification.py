"""DRS certifier tests against the reference's MATLAB golden data.

Mirrors reference certification-test.cc: every internal quantity (omega,
block-diag omega, Q_cost, lambda guess, A_inv action, first-iteration dual
projection, suboptimality trajectory) is compared against the CSVs in
test/teaser/data/certification_small_instances at 1e-7.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from teaserpp_tpu.certification.drs import (
    DRSCertifier,
    apply_inverse_map,
    get_block_diag_omega,
    get_lambda_guess,
    get_omega_1,
    get_q_cost,
    optimal_dual_projection,
    quat_from_rotation,
    suboptimality_gap,
    _certify_core,
)
from teaserpp_tpu.params import DRSCertifierParams

from conftest import REFERENCE_DATA, make_registration_problem

CASES_DIR = os.path.join(REFERENCE_DATA, "certification_small_instances")
TOL = 1e-7  # reference certification-test.cc:29


def _load_case(case: str):
    d = os.path.join(CASES_DIR, case)

    def csv(name):
        return np.loadtxt(os.path.join(d, name), delimiter=",", ndmin=2)

    params = {}
    with open(os.path.join(d, "parameters.txt")) as f:
        for line in f:
            k, v = line.strip().split(":")
            params[k.strip()] = float(v)
    return {
        "v1": csv("v1.csv"),
        "v2": csv("v2.csv"),
        "R_est": csv("R_est.csv"),
        "q_est": csv("q_est.csv").reshape(-1),
        "theta_est": csv("theta_est.csv").reshape(-1),
        "omega": csv("omega.csv"),
        "block_diag_omega": csv("block_diag_omega.csv"),
        "Q_cost": csv("Q_cost.csv"),
        "lambda_bar_init": csv("lambda_bar_init.csv"),
        "A_inv": csv("A_inv.csv"),
        "W_1st_iter": csv("W_1st_iter.csv"),
        "W_dual_1st_iter": csv("W_dual_1st_iter.csv"),
        "suboptimality_traj": csv("suboptimality_traj.csv").reshape(-1),
        "suboptimality_1st_iter": float(csv("suboptimality_1st_iter.csv")[0, 0]),
        "noise_bound": params["noise_bound"],
        "cbar2": params["cbar2"],
    }


requires_ref_data = pytest.mark.skipif(
    not os.path.isdir(CASES_DIR), reason="reference golden data not mounted"
)
CASES = sorted(os.listdir(CASES_DIR)) if os.path.isdir(CASES_DIR) else []


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_quaternion_and_omega(case):
    data = _load_case(case)
    q = np.asarray(quat_from_rotation(jnp.asarray(data["R_est"])))
    q_ref = data["q_est"]
    if np.dot(q, q_ref) < 0:
        q = -q  # sign-invariant
    assert np.abs(q - q_ref).max() < 1e-6
    om = np.asarray(get_omega_1(jnp.asarray(q_ref)))
    assert np.abs(om - data["omega"]).max() < TOL
    bdo = np.asarray(
        get_block_diag_omega(data["block_diag_omega"].shape[0], jnp.asarray(q_ref))
    )
    assert np.abs(bdo - data["block_diag_omega"]).max() < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_q_cost_golden(case):
    data = _load_case(case)
    q = np.asarray(
        get_q_cost(
            jnp.asarray(data["v1"]),
            jnp.asarray(data["v2"]),
            data["noise_bound"],
            data["cbar2"],
        )
    )
    assert np.abs(q - data["Q_cost"]).max() < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_lambda_guess_golden(case):
    data = _load_case(case)
    lam = np.asarray(
        get_lambda_guess(
            jnp.asarray(data["R_est"]),
            jnp.asarray(data["theta_est"]),
            jnp.asarray(data["v1"]),
            jnp.asarray(data["v2"]),
            data["noise_bound"],
            data["cbar2"],
        )
    )
    assert np.abs(lam - data["lambda_bar_init"]).max() < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_inverse_map_action_matches_golden_a_inv(case):
    """Our closed-form operator must equal multiplication by the golden A_inv."""
    data = _load_case(case)
    theta_prepended = np.concatenate([[1.0], data["theta_est"]])
    n1 = theta_prepended.shape[0]
    i_idx, j_idx = np.triu_indices(n1, k=1)
    k = len(i_idx)
    rng = np.random.default_rng(0)
    b = rng.normal(size=(k, 3))
    expected = data["A_inv"] @ b
    out = np.asarray(
        apply_inverse_map(
            jnp.asarray(theta_prepended),
            jnp.asarray(b),
            jnp.asarray(i_idx),
            jnp.asarray(j_idx),
        )
    )
    assert np.abs(out - expected).max() < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_dual_projection_golden(case):
    data = _load_case(case)
    theta_prepended = np.concatenate([[1.0], data["theta_est"]])
    n1 = theta_prepended.shape[0]
    i_idx, j_idx = np.triu_indices(n1, k=1)
    wd = np.asarray(
        optimal_dual_projection(
            jnp.asarray(data["W_1st_iter"]),
            jnp.asarray(theta_prepended),
            jnp.asarray(i_idx),
            jnp.asarray(j_idx),
        )
    )
    assert np.abs(wd - data["W_dual_1st_iter"]).max() < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_full_certification_trajectory(case):
    """End-to-end DRS: per-iteration suboptimality must match at 1e-7
    (reference certification-test.cc:109-129)."""
    data = _load_case(case)
    params = DRSCertifierParams(
        noise_bound=data["noise_bound"], cbar2=data["cbar2"]
    )
    certifier = DRSCertifier(params)
    result = certifier.certify(
        data["R_est"], data["v1"], data["v2"], data["theta_est"]
    )
    ref_traj = data["suboptimality_traj"]
    assert len(result.suboptimality_traj) == len(ref_traj)
    assert np.abs(np.asarray(result.suboptimality_traj) - ref_traj).max() < TOL
    assert result.is_optimal
    assert abs(result.best_suboptimality - ref_traj.min()) < TOL


def test_iterative_gap_proven_zero_on_psd(rng):
    """ADVICE r4: the public ITERATIVE gap must return EXACTLY 0 for a PSD
    matrix (proved by a Cholesky of the matrix itself), matching DENSE and
    the reference's min_eig > 0 -> 0 branch (certification.cc:221-225) —
    previously the proven lower bound carried a strictly negative floor
    (-1e-10*Gershgorin), which in the small-mu near-clean regime could
    exceed the certificate threshold and flip an optimal verdict."""
    import jax.numpy as jnp

    from teaserpp_tpu.params import EigSolverType

    npm = 60
    a = rng.standard_normal((npm, npm))
    psd = a @ a.T + np.eye(npm)  # comfortably PD
    mu = jnp.asarray(1e-3)  # tiny mu: the old floor would give gap ~ 0.1
    for solver in (EigSolverType.DENSE, EigSolverType.ITERATIVE):
        gap = float(
            suboptimality_gap(jnp.asarray(psd), mu, (npm - 4) // 4, solver)
        )
        assert gap == 0.0, f"{solver}: gap {gap} != 0 on a PSD matrix"
    # and an indefinite matrix still reports a positive gap both ways
    indef = psd - 3.0 * np.eye(npm)
    g_dense = float(
        suboptimality_gap(jnp.asarray(indef), mu, (npm - 4) // 4,
                          EigSolverType.DENSE)
    )
    g_iter = float(
        suboptimality_gap(jnp.asarray(indef), mu, (npm - 4) // 4,
                          EigSolverType.ITERATIVE)
    )
    assert g_dense > 0 and g_iter > 0
    # ITERATIVE is a proven bound: conservative (>= dense), but tight
    assert g_iter >= g_dense * (1 - 1e-9)
    assert g_iter <= g_dense * 1.01


def test_random_certification_optimal(rng):
    """Random clean problems must certify as optimal
    (reference certification-test.cc:530-644 analog, smaller N)."""
    from teaserpp_tpu.ops import compute_tims
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls

    src, dst, s, r, t, inlier_mask = make_registration_problem(
        rng, n=20, outlier_ratio=0.25, noise=0.01, translation_scale=0.0
    )
    src_tims = np.asarray(compute_tims(jnp.asarray(src)))
    dst_tims = np.asarray(compute_tims(jnp.asarray(dst)))
    nb = 0.06
    rot = solve_rotation_gnc_tls(
        jnp.asarray(src_tims), jnp.asarray(dst_tims), nb
    )
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    certifier = DRSCertifier(DRSCertifierParams(noise_bound=nb))
    result = certifier.certify(np.asarray(rot.rotation), src_tims, dst_tims, theta)
    assert result.is_optimal


def test_certify_batch_matches_single(rng):
    """Batched certification equals per-problem certification."""
    from teaserpp_tpu.certification.drs import certify_batch
    from teaserpp_tpu.ops import compute_tims
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls
    import jax.numpy as jnp

    batch = 3
    n = 12
    rotations, srcs, dsts, thetas = [], [], [], []
    nb = 0.06
    for _ in range(batch):
        src, dst, s, r, t, _ = make_registration_problem(
            rng, n=n, outlier_ratio=0.2, noise=0.01, translation_scale=0.0
        )
        st = np.asarray(compute_tims(jnp.asarray(src)))
        dt = np.asarray(compute_tims(jnp.asarray(dst)))
        rot = solve_rotation_gnc_tls(jnp.asarray(st), jnp.asarray(dt), nb)
        rotations.append(np.asarray(rot.rotation))
        srcs.append(st)
        dsts.append(dt)
        thetas.append(np.where(np.asarray(rot.inliers), 1.0, -1.0))

    params = DRSCertifierParams(noise_bound=nb)
    batched = certify_batch(
        np.stack(rotations), np.stack(srcs), np.stack(dsts), np.stack(thetas),
        params,
    )
    certifier = DRSCertifier(params)
    for b in range(batch):
        single = certifier.certify(rotations[b], srcs[b], dsts[b], thetas[b])
        assert batched[b].is_optimal == single.is_optimal
        assert abs(
            batched[b].best_suboptimality - single.best_suboptimality
        ) < 1e-9

    # chunked device dispatch (max_device_batch, with a padded last chunk)
    # must return identical results in the original order
    chunked = certify_batch(
        np.stack(rotations), np.stack(srcs), np.stack(dsts), np.stack(thetas),
        params, max_device_batch=2,
    )
    assert len(chunked) == batch
    for b in range(batch):
        assert chunked[b].is_optimal == batched[b].is_optimal
        assert (
            chunked[b].best_suboptimality == batched[b].best_suboptimality
        )


LARGE_CASES_DIR = os.path.join(REFERENCE_DATA, "certification_large_instances")
LARGE_CASES = (
    sorted(os.listdir(LARGE_CASES_DIR)) if os.path.isdir(LARGE_CASES_DIR) else []
)


@pytest.mark.skipif(
    not os.path.isdir(LARGE_CASES_DIR), reason="reference golden data not mounted"
)
@pytest.mark.parametrize("case", LARGE_CASES)
def test_full_certification_trajectory_large(case):
    """N=100 instances (reference certification-test.cc LargeInstance suite,
    exercised there with the SPECTRA eigensolver): full golden trajectory at
    1e-7. Our gap solver is the same code path at every N (XLA eigh /
    LOBPCG), so this doubles as the Spectra-parity check."""
    d = os.path.join(LARGE_CASES_DIR, case)

    def csv(name):
        return np.loadtxt(os.path.join(d, name), delimiter=",", ndmin=2)

    pars = {}
    with open(os.path.join(d, "parameters.txt")) as f:
        for line in f:
            k, v = line.strip().split(":")
            pars[k.strip()] = float(v)
    params = DRSCertifierParams(
        noise_bound=pars["noise_bound"],
        cbar2=pars["cbar2"],
        max_iterations=int(pars.get("max_iterations", 200)),
    )
    certifier = DRSCertifier(params)
    result = certifier.certify(
        csv("R_est.csv"), csv("v1.csv"), csv("v2.csv"),
        csv("theta_est.csv").reshape(-1),
    )
    ref_traj = csv("suboptimality_traj.csv").reshape(-1)
    assert len(result.suboptimality_traj) == len(ref_traj)
    assert np.abs(np.asarray(result.suboptimality_traj) - ref_traj).max() < TOL
    # case_1 certifies; case_2's golden trajectory plateaus at ~7.6e-3, above
    # the optimality threshold — the reference compares trajectories, not an
    # is_optimal flag, for these instances (certification-test.cc:513-524)
    assert abs(result.best_suboptimality - ref_traj.min()) < TOL


@requires_ref_data
@pytest.mark.parametrize("case", CASES)
def test_iterative_mode_matches_dense_on_golden(case):
    """ITERATIVE (shift-invert PSD projection + shift-invert gap) must reach
    the same certificate as the DENSE path on the reference golden instances.

    Unlike the dense path, individual early iterates may differ (the warm
    start needs a few iterations to lock onto the negative subspace), so the
    pin is on the final certificate, not the per-iteration trajectory.
    """
    data = _load_case(case)
    base = DRSCertifierParams(noise_bound=data["noise_bound"], cbar2=data["cbar2"])
    dense = DRSCertifier(base).certify(
        data["R_est"], data["v1"], data["v2"], data["theta_est"]
    )
    it_params = base.replace(
        eig_decomposition_solver=DRSCertifier.EIG_SOLVER_TYPE.ITERATIVE
    )
    iterative = DRSCertifier(it_params).certify(
        data["R_est"], data["v1"], data["v2"], data["theta_est"]
    )
    assert iterative.is_optimal == dense.is_optimal
    assert not iterative.rank_saturated
    # both runs stop as soon as gap < sub_optimality; stopping iterations can
    # differ, so pin both to the certificate threshold, not to each other
    assert iterative.best_suboptimality < base.sub_optimality
    assert abs(iterative.best_suboptimality - dense.best_suboptimality) < 1e-3


def test_iterative_mode_matches_dense_synthetic(rng):
    """Shift-invert certification agrees with dense on a synthetic N=60
    instance solved by GNC-TLS (cross-check required by the large-N path)."""
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls
    from teaserpp_tpu.params import EigSolverType

    n = 60
    v1 = rng.standard_normal((3, n))
    a = rng.standard_normal((3, 3))
    r0, _ = np.linalg.qr(a)
    if np.linalg.det(r0) < 0:
        r0[:, 0] *= -1
    nb = 0.03
    v2 = r0 @ v1 + rng.standard_normal((3, n)) * (nb / 4)
    out_idx = rng.choice(n, 15, replace=False)
    v2[:, out_idx] = rng.standard_normal((3, 15)) * 2
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)

    results = {}
    for solver in (EigSolverType.DENSE, EigSolverType.ITERATIVE):
        params = DRSCertifierParams(
            noise_bound=nb, eig_decomposition_solver=solver
        )
        results[solver] = DRSCertifier(params).certify(
            np.asarray(rot.rotation), v1, v2, theta
        )
    dense, it = results[EigSolverType.DENSE], results[EigSolverType.ITERATIVE]
    assert dense.is_optimal and it.is_optimal
    assert not it.rank_saturated
    assert it.best_suboptimality < params.sub_optimality
    assert abs(it.best_suboptimality - dense.best_suboptimality) < 1e-3


def _make_gnc_problem(rng, n, nb=0.03, n_out=None):
    """Synthetic rotation problem solved by GNC-TLS -> (R, v1, v2, theta)."""
    from teaserpp_tpu.solvers import solve_rotation_gnc_tls

    v1 = rng.standard_normal((3, n))
    a = rng.standard_normal((3, 3))
    r0, _ = np.linalg.qr(a)
    if np.linalg.det(r0) < 0:
        r0[:, 0] *= -1
    v2 = r0 @ v1 + rng.standard_normal((3, n)) * (nb / 4)
    n_out = n // 4 if n_out is None else n_out
    out_idx = rng.choice(n, n_out, replace=False)
    v2[:, out_idx] = rng.standard_normal((3, n_out)) * 2
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    return np.asarray(rot.rotation), v1, v2, theta


def test_iterative_rank_saturation_recovers(rng):
    """A deliberately undersized shift-invert subspace must not ship a
    partial projection: the adaptive re-entry (2x rank per round) has to
    land the same certificate as the dense path, with rank_saturated=False
    on the final result (VERDICT r2 #10)."""
    import jax

    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import _certify_dispatch

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 48, nb, n_out=12)

    starved = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=4,  # far below the negative count (~npm/8 = 24)
    )
    # the raw core at rank 4 must actually saturate, else this test is vacuous
    _, _, _, sat_raw = jax.jit(_certify_dispatch, static_argnames=("params",))(
        jnp.asarray(r), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(theta), starved,
    )
    assert bool(sat_raw)

    dense = DRSCertifier(DRSCertifierParams(noise_bound=nb)).certify(
        r, v1, v2, theta
    )
    adaptive = DRSCertifier(starved).certify(r, v1, v2, theta)
    assert adaptive.is_optimal == dense.is_optimal
    assert abs(adaptive.best_suboptimality - dense.best_suboptimality) < 1e-3
    # no silent partial projection: either the certificate was proven
    # (Cholesky gate) or the escalation ran until the projection completed
    assert adaptive.is_optimal or not adaptive.rank_saturated


def test_chunked_dispatch_matches_single(rng):
    """iterations_per_dispatch segments the ITERATIVE DRS loop into short
    device programs (the axon relay kills long-running ones); the chunked
    run must be bit-identical to the single-dispatch run — same trajectory,
    same stopping iteration, same certificate."""
    from teaserpp_tpu.params import EigSolverType

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 40, nb, n_out=10)
    base = DRSCertifierParams(
        noise_bound=nb, eig_decomposition_solver=EigSolverType.ITERATIVE
    )
    single = DRSCertifier(base).certify(r, v1, v2, theta)
    chunked = DRSCertifier(base.replace(iterations_per_dispatch=7)).certify(
        r, v1, v2, theta
    )
    assert chunked.is_optimal == single.is_optimal
    assert chunked.best_suboptimality == single.best_suboptimality
    assert len(chunked.suboptimality_traj) == len(single.suboptimality_traj)
    assert np.array_equal(
        np.asarray(chunked.suboptimality_traj),
        np.asarray(single.suboptimality_traj),
    )

    # batched form too
    from teaserpp_tpu.certification.drs import certify_batch

    rots = np.stack([r, r])
    v1s = np.stack([v1, v1])
    v2s = np.stack([v2, v2])
    thetas = np.stack([theta, theta])
    b_single = certify_batch(rots, v1s, v2s, thetas, base)
    b_chunked = certify_batch(
        rots, v1s, v2s, thetas, base.replace(iterations_per_dispatch=7)
    )
    for a, b in zip(b_single, b_chunked):
        assert a.is_optimal == b.is_optimal
        assert a.best_suboptimality == b.best_suboptimality


def test_checkpointed_certification_resumes_bit_identical(rng, tmp_path):
    """Disk checkpoint/resume (restart-based elastic recovery): a run killed
    mid-way and re-invoked from its checkpoint must reproduce the
    uninterrupted run exactly — same trajectory, stopping iteration, and
    certificate (chunking is bit-identical and f64 npz round-trips exactly).
    """
    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import certify_checkpointed

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 40, nb, n_out=10)
    params = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        iterations_per_dispatch=7,
    )
    baseline = DRSCertifier(params).certify(r, v1, v2, theta)
    assert len(baseline.suboptimality_traj) > 14  # multiple segments needed

    ck = str(tmp_path / "drs_ckpt.npz")
    # simulated crash after 1 segment (checkpoint_every=1 -> state saved)
    interrupted = certify_checkpointed(
        r, v1, v2, theta, params, checkpoint_path=ck,
        checkpoint_every=1, _stop_after_segments=1,
    )
    assert interrupted is None and os.path.exists(ck)
    resumed = certify_checkpointed(
        r, v1, v2, theta, params, checkpoint_path=ck, checkpoint_every=1
    )
    assert resumed.is_optimal == baseline.is_optimal
    assert resumed.best_suboptimality == baseline.best_suboptimality
    assert np.array_equal(
        np.asarray(resumed.suboptimality_traj),
        np.asarray(baseline.suboptimality_traj),
    )

    # a mismatched problem must NOT resume from the stale file: running it
    # against the stale checkpoint must equal a from-scratch checkpointed
    # run bit-exactly (DRSCertifier.certify is not the comparator here — on
    # an uncertified saturated run it re-enters with a doubled subspace
    # rank, a deliberately different semantic than one fixed-rank pass)
    r2_, v1_2, v2_2, theta_2 = _make_gnc_problem(rng, 40, nb, n_out=10)
    other = certify_checkpointed(
        r2_, v1_2, v2_2, theta_2, params, checkpoint_path=ck, checkpoint_every=1
    )
    fresh = certify_checkpointed(
        r2_, v1_2, v2_2, theta_2, params,
        checkpoint_path=str(tmp_path / "fresh.npz"), checkpoint_every=1,
    )
    assert other.best_suboptimality == fresh.best_suboptimality
    assert np.array_equal(
        np.asarray(other.suboptimality_traj),
        np.asarray(fresh.suboptimality_traj),
    )


def test_round_extension_matches_single_long_run(rng):
    """rounds=k at budget m must equal one run at budget k*m bit-exactly.

    The DRS body never reads the iteration counter except to index the
    trajectory buffer, so the round rollover (reset counter+buffer, carry
    the dual state and warm bases) continues the identical fixed-point
    sequence — this is what lets remote backends extend iteration budgets
    using only already-compiled ``max_iterations``-budget graphs.
    """
    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import certify_checkpointed

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 40, nb, n_out=10)
    base = dict(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        iterations_per_dispatch=25,
    )
    long_run = certify_checkpointed(
        r, v1, v2, theta, DRSCertifierParams(max_iterations=75, **base)
    )
    multi = certify_checkpointed(
        r, v1, v2, theta, DRSCertifierParams(max_iterations=25, **base),
        rounds=3,
    )
    assert len(long_run.suboptimality_traj) > 25  # crosses a round boundary
    assert multi.is_optimal == long_run.is_optimal
    assert multi.best_suboptimality == long_run.best_suboptimality
    assert np.array_equal(
        np.asarray(multi.suboptimality_traj),
        np.asarray(long_run.suboptimality_traj),
    )


def test_checkpointed_rank_escalation_self_recovers(rng, tmp_path):
    """VERDICT r4 #4: the at-scale driver must codify the N=1000 recovery.

    A deliberately rank-starved `certify_checkpointed` run (rank 4, the
    saturating configuration pinned by test_iterative_rank_saturation_
    recovers) must, after exhausting its round budget uncertified and
    saturated, self-escalate the subspace rank (2x per escalation, dual
    state M and warm basis carried over) until it lands a Cholesky-proven
    certificate — what the r4 N=1000 campaign did by hand (stall at rank
    128 -> relaunch at 256, PERFORMANCE.md "Certification at scale")."""
    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import certify_checkpointed

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 48, nb, n_out=12)
    starved = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=4,  # far below the negative count (~npm/8 = 24)
        iterations_per_dispatch=50,
    )
    ck = str(tmp_path / "starved.npz")
    res = certify_checkpointed(
        r, v1, v2, theta, starved, checkpoint_path=ck, checkpoint_every=1
    )
    assert res.is_optimal
    assert not res.rank_saturated
    # the escalation must actually have fired: the terminal checkpoint's
    # PSD basis block is wider than the starved rank
    with np.load(ck, allow_pickle=False) as z:
        assert z["s5"].shape[-1] > 4
    # and without adaptive escalation the same run must FAIL saturated —
    # pinning that the recovery is what earned the certificate
    inert = certify_checkpointed(
        r, v1, v2, theta, starved, adaptive_rank=False
    )
    assert not inert.is_optimal
    assert inert.rank_saturated


def test_checkpointed_escalated_resume_bit_identical(rng, tmp_path):
    """A crash AFTER the rank escalation fired must resume at the
    escalated rank (the checkpoint stores the widened basis; the current
    rank is implicit in its shape) and reproduce the uninterrupted
    escalating run exactly — the docstring's claim, pinned."""
    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import certify_checkpointed

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 48, nb, n_out=12)
    starved = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=4,  # saturates (test_iterative_rank_saturation_*)
        max_iterations=60,
        iterations_per_dispatch=20,
    )
    baseline = certify_checkpointed(r, v1, v2, theta, starved)
    ck = str(tmp_path / "esc.npz")
    # 3 segments exhaust the rank-4 budget; escalation fires (saving the
    # widened state); segment 4 is the first escalated dispatch; crash.
    interrupted = certify_checkpointed(
        r, v1, v2, theta, starved, checkpoint_path=ck, checkpoint_every=1,
        _stop_after_segments=4,
    )
    assert interrupted is None
    with np.load(ck, allow_pickle=False) as z:
        assert z["s5"].shape[-1] > 4  # crashed mid-ESCALATED run
    resumed = certify_checkpointed(
        r, v1, v2, theta, starved, checkpoint_path=ck, checkpoint_every=1
    )
    assert resumed.is_optimal == baseline.is_optimal
    assert resumed.best_suboptimality == baseline.best_suboptimality
    assert np.array_equal(
        np.asarray(resumed.suboptimality_traj),
        np.asarray(baseline.suboptimality_traj),
    )


def test_iterative_gap_gate_blocks_false_certificate(rng):
    """Regression for the unsound gap estimate: Rayleigh-Ritz OVER-estimates
    lambda_min, so before the Cholesky proof gate a full-rank ITERATIVE run
    on this instance reported gap 0 at iteration 13 (true gap ~2) — a false
    certificate. With the gate, the full-rank run must track the dense path
    (identical m trajectory, certificate only when proven)."""
    import jax

    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import _certify_dispatch

    nb = 0.03
    r, v1, v2, theta = _make_gnc_problem(rng, 48, nb, n_out=12)
    npm = 4 * 48 + 4

    fn = jax.jit(_certify_dispatch, static_argnames=("params",))
    args = (jnp.asarray(r), jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(theta))
    dense_p = DRSCertifierParams(noise_bound=nb)
    bd, _, itd, _ = fn(*args, dense_p)
    full_p = dense_p.replace(
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=npm,  # full space: exact projection
    )
    bi, _, iti, _ = fn(*args, full_p)
    assert int(iti) == int(itd)  # same trajectory, same stopping point
    assert abs(float(bi) - float(bd)) < 1e-6


def test_certify_batch_rank_saturation_recovers(rng):
    """certify_batch re-enters only the saturated problems with grown rank."""
    from teaserpp_tpu.params import EigSolverType
    from teaserpp_tpu.certification.drs import certify_batch

    nb = 0.03
    probs = [_make_gnc_problem(rng, 48, nb, n_out=12) for _ in range(3)]
    rots = np.stack([p[0] for p in probs])
    v1s = np.stack([p[1] for p in probs])
    v2s = np.stack([p[2] for p in probs])
    thetas = np.stack([p[3] for p in probs])

    starved = DRSCertifierParams(
        noise_bound=nb,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=4,
    )
    results = certify_batch(rots, v1s, v2s, thetas, starved)
    dense = [
        DRSCertifier(DRSCertifierParams(noise_bound=nb)).certify(
            rots[i], v1s[i], v2s[i], thetas[i]
        )
        for i in range(3)
    ]
    for got, ref in zip(results, dense):
        assert got.is_optimal == ref.is_optimal
        assert abs(got.best_suboptimality - ref.best_suboptimality) < 1e-3
        assert got.is_optimal or not got.rank_saturated
