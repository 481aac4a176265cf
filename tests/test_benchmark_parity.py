"""Accuracy parity against the reference benchmark suite.

Reproduces test/benchmark/registration-benchmark.cc: each benchmark_* case
ships src/dst clouds plus ground truth (``*_ref``) and MATLAB-TEASER
estimates (``*_est``); the solve (unknown scale, GNC-TLS, exact clique) must
match both within the reference's acceptance gates
(registration-benchmark.cc:280-369). Our solver is deterministic, so one run
replaces the reference's 100.
"""

import os

import numpy as np
import pytest

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
    RotationEstimationAlgorithm,
)
from teaserpp_tpu.io.ply import read_ply
from teaserpp_tpu.utils.metrics import angular_error

DATA = "/root/reference/test/benchmark/data"

# (name, gate vs ground truth (s, R rad, t m), gate vs MATLAB TEASER)
CASES = [
    ("benchmark_1", (1e-5, 1e-5, 1e-5), (1e-5, 1e-5, 1e-5)),
    ("benchmark_2", (1e-5, 1e-5, 1e-5), (1e-5, 1e-5, 1e-5)),
    ("benchmark_3", (1e-5, 1e-5, 1e-5), (1e-5, 1e-5, 1e-5)),
    ("benchmark_4", (1e-5, 1e-5, 1e-5), (1e-5, 1e-5, 1e-5)),
    ("benchmark_5", (1e-5, 1e-5, 1e-5), (1e-5, 1e-5, 1e-5)),
    ("benchmark_6", (1e-2, 1e-2, 2e-2), (1e-5, 1e-3, 1e-3)),
]

requires_data = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference benchmark data not mounted"
)


def _load(name):
    d = os.path.join(DATA, name)
    src = read_ply(os.path.join(d, "src.ply")).as_matrix()
    dst = read_ply(os.path.join(d, "dst.ply")).as_matrix()
    params = {}
    for line in open(os.path.join(d, "parameters.txt")):
        k, _, v = line.partition(":")
        params[k.strip()] = float(v)
    refs = {}
    for f in ["R_est", "R_ref"]:
        refs[f] = np.loadtxt(os.path.join(d, f + ".csv"), delimiter=",")
    for f in ["t_est", "t_ref", "s_est", "s_ref"]:
        refs[f] = np.loadtxt(os.path.join(d, f + ".csv"), delimiter=",")
    return src, dst, params["Noise Bound"], refs


@requires_data
@pytest.mark.parametrize("name,gt_gate,est_gate", CASES)
def test_benchmark_case(name, gt_gate, est_gate):
    src, dst, noise_bound, refs = _load(name)
    params = RobustRegistrationSolverParams(
        noise_bound=noise_bound,
        cbar2=1.0,
        estimate_scaling=True,
        rotation_max_iterations=100,
        rotation_gnc_factor=1.4,
        rotation_cost_threshold=1e-12,
        rotation_estimation_algorithm=RotationEstimationAlgorithm.GNC_TLS,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    sol = RobustRegistrationSolver(params).solve(src, dst)
    assert sol.valid

    s_err_ref = abs(sol.scale - float(refs["s_ref"]))
    r_err_ref = angular_error(sol.rotation, refs["R_ref"])
    t_err_ref = float(np.linalg.norm(sol.translation - refs["t_ref"]))
    assert s_err_ref <= gt_gate[0], f"{name} scale vs ground truth: {s_err_ref}"
    assert r_err_ref <= gt_gate[1], f"{name} rotation vs ground truth: {r_err_ref}"
    assert t_err_ref <= gt_gate[2], f"{name} translation vs ground truth: {t_err_ref}"

    s_err_est = abs(sol.scale - float(refs["s_est"]))
    r_err_est = angular_error(sol.rotation, refs["R_est"])
    t_err_est = float(np.linalg.norm(sol.translation - refs["t_est"]))
    assert s_err_est <= est_gate[0], f"{name} scale vs MATLAB: {s_err_est}"
    assert r_err_est <= est_gate[1], f"{name} rotation vs MATLAB: {r_err_est}"
    assert t_err_est <= est_gate[2], f"{name} translation vs MATLAB: {t_err_est}"
