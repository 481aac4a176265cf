"""Quatro-on-FPFH example (reference quatro_cpp_fpfh.cc analog).

Quatro (reference registration.cc:280-408) is the degeneracy-robust SO(2)
variant of TEASER++: it forgoes roll/pitch estimation and solves yaw only,
which is the right tool when the motion is yaw-dominant (ground vehicles).
This example mirrors examples/teaser_cpp_fpfh/quatro_cpp_fpfh.cc: the
Stanford bunny under a 179-degree yaw + translation (the regime where a
full SO(3) GNC start can fall into the antipodal basin), FPFH descriptors
-> matcher -> the robust solver once with QUATRO and once with GNC_TLS,
reporting both (the reference prints the same comparison and notes Quatro
is specialized, not universally better).
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, "examples")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import time

import numpy as np

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
    RotationEstimationAlgorithm,
)
from teaserpp_tpu.features import FPFHEstimation, Matcher
from teaserpp_tpu.io import read_ply
from teaserpp_tpu.utils.geometry import PointCloud
from teaserpp_tpu.utils.metrics import angular_error, translation_error

from bunny_registration import BUNNY_PLY

# quatro_cpp_fpfh.cc:13 NOISE_BOUND and :102-107 fixed transform:
# yaw 179 deg, zero roll/pitch, the example's translation
NOISE_BOUND = 0.05
YAW_DEG = 179.0
T_TRANSLATION = np.array([-1.15576939e-01, -3.87705398e-02, 1.14874890e-01])


def yaw_rotation(yaw_deg: float) -> np.ndarray:
    c, s = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _params(algo) -> RobustRegistrationSolverParams:
    """quatro_cpp_fpfh.cc:26-45 getParams: Quatro pairs with PMC_HEU."""
    return RobustRegistrationSolverParams(
        noise_bound=NOISE_BOUND / 2,
        cbar2=1.0,
        estimate_scaling=False,
        rotation_max_iterations=100,
        rotation_gnc_factor=1.4,
        rotation_cost_threshold=0.0002,
        rotation_estimation_algorithm=algo,
        inlier_selection_mode=(
            InlierSelectionMode.PMC_HEU
            if algo == RotationEstimationAlgorithm.QUATRO
            else InlierSelectionMode.PMC_EXACT
        ),
    )


def main(stride=1):
    # ``stride`` subsamples the cloud (smoke-test mode; 1 = full example)
    src = read_ply(BUNNY_PLY).as_matrix()[:, ::stride]
    r_true = yaw_rotation(YAW_DEG)
    dst = r_true @ src + T_TRANSLATION[:, None]

    src_cloud = PointCloud(src.T)
    dst_cloud = PointCloud(dst.T)

    fp = FPFHEstimation()
    src_desc = fp.computeFPFHFeatures(src_cloud, 0.02, 0.04)
    dst_desc = fp.computeFPFHFeatures(dst_cloud, 0.02, 0.04)
    corr = Matcher().calculateCorrespondences(
        src_cloud, dst_cloud, src_desc, dst_desc,
        use_absolute_scale=False, use_crosscheck=True,
        use_tuple_test=False, tuple_scale=0.95,
    )

    out = {"n_corr": len(corr)}
    for name, algo in (
        ("Quatro", RotationEstimationAlgorithm.QUATRO),
        ("GNC-TLS", RotationEstimationAlgorithm.GNC_TLS),
    ):
        solver = RobustRegistrationSolver(_params(algo))
        t0 = time.perf_counter()
        sol = solver.solve(src_cloud, dst_cloud, corr)
        dt = time.perf_counter() - t0
        rot_err = np.degrees(angular_error(sol.rotation, r_true))
        trn_err = translation_error(sol.translation, T_TRANSLATION)
        print("=====================================")
        print(f"          {name} results")
        print("=====================================")
        print(f"rotation error (deg): {rot_err:.6f}")
        print(f"translation error (m): {trn_err:.6f}")
        print(f"time (s): {dt:.3f}  valid: {sol.valid}")
        key = name.lower().replace("-", "_")
        out[f"rot_err_{key}"] = float(rot_err)
        out[f"trans_err_{key}"] = float(trn_err)
        out[f"valid_{key}"] = bool(sol.valid)
    return out


if __name__ == "__main__":
    main()
