"""FPFH end-to-end registration example (teaser_cpp_fpfh analog).

Loads the Stanford bunny, applies the example SE(3) transform, computes FPFH
descriptors on both clouds, generates correspondences with the matcher, and
runs the robust solver on them (reference
examples/teaser_cpp_fpfh/teaser_cpp_fpfh.cc flow).
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
)
from teaserpp_tpu.features import FPFHEstimation, Matcher
from teaserpp_tpu.io import read_ply
from teaserpp_tpu.utils.geometry import PointCloud
from teaserpp_tpu.utils.metrics import angular_error, translation_error

from bunny_registration import BUNNY_PLY, T, NOISE_BOUND


def main(stride=1):
    # ``stride`` subsamples the cloud (smoke-test mode; 1 = full example)
    src = read_ply(BUNNY_PLY).as_matrix()[:, ::stride]
    rng = np.random.default_rng(0)
    dst = T[:3, :3] @ src + T[:3, 3:4]
    dst += rng.uniform(-NOISE_BOUND / 2, NOISE_BOUND / 2, size=dst.shape)

    src_cloud = PointCloud(src.T)
    dst_cloud = PointCloud(dst.T)

    t0 = time.perf_counter()
    fp = FPFHEstimation()
    src_desc = fp.computeFPFHFeatures(src_cloud, 0.02, 0.04)
    dst_desc = fp.computeFPFHFeatures(dst_cloud, 0.02, 0.04)
    corr = Matcher().calculateCorrespondences(
        src_cloud, dst_cloud, src_desc, dst_desc,
        use_absolute_scale=False, use_crosscheck=True,
        use_tuple_test=False, tuple_scale=0.95,
    )
    t_feat = time.perf_counter() - t0

    params = RobustRegistrationSolverParams(
        noise_bound=NOISE_BOUND * 2,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    solver = RobustRegistrationSolver(params)
    t0 = time.perf_counter()
    sol = solver.solve(src_cloud, dst_cloud, corr)
    t_solve = time.perf_counter() - t0

    print("=====================================")
    print("   teaserpp_tpu FPFH pipeline        ")
    print("=====================================")
    print(f"correspondences from matcher: {len(corr)}")
    print(f"max clique size: {len(solver.getInlierMaxClique())}")
    print(f"rotation error (deg): {np.degrees(angular_error(sol.rotation, T[:3, :3])):.6f}")
    print(f"translation error (m): {translation_error(sol.translation, T[:3, 3]):.6f}")
    print(f"feature+match time (s): {t_feat:.3f}  solve time (s): {t_solve:.3f}")
    return {
        "valid": bool(sol.valid),
        "rot_err_deg": float(np.degrees(angular_error(sol.rotation, T[:3, :3]))),
        "trans_err_m": float(translation_error(sol.translation, T[:3, 3])),
        "n_corr": len(corr),
    }


if __name__ == "__main__":
    main()
