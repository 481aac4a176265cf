"""FPFH + TEASER + ICP-refinement example.

The reference's teaser_python_fpfh_icp workflow (examples/
teaser_python_fpfh_icp/example.py: FPFH correspondences -> TEASER global
solve -> open3d point-to-point ICP local refinement) with every stage
running on our TPU-native components: FPFH/matcher front-end, the robust
solver, and the jittable :func:`icp_point_to_point`.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, "examples")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import time

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
)
from teaserpp_tpu.features import FPFHEstimation, Matcher
from teaserpp_tpu.io import read_ply
from teaserpp_tpu.solvers.icp import icp_point_to_point
from teaserpp_tpu.utils.geometry import PointCloud
from teaserpp_tpu.utils.metrics import rotation_error_deg, translation_error

from bunny_registration import BUNNY_PLY, T, NOISE_BOUND


def main(stride=1):
    # ``stride`` subsamples the cloud (smoke-test mode; 1 = full example)
    src = read_ply(BUNNY_PLY).as_matrix()[:, ::stride]
    rng = np.random.default_rng(0)
    r_true, t_true = T[:3, :3], T[:3, 3]
    dst = r_true @ src + t_true[:, None]
    dst += rng.uniform(-NOISE_BOUND / 2, NOISE_BOUND / 2, size=dst.shape)

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
    print(f"FPFH generates {len(corr)} putative correspondences")

    params = RobustRegistrationSolverParams(
        noise_bound=NOISE_BOUND * 2,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    solver = RobustRegistrationSolver(params)
    t0 = time.perf_counter()
    sol = solver.solve(src_cloud, dst_cloud, correspondences=corr)
    t_teaser = time.perf_counter() - t0
    print(f"TEASER global solve:  rot err {rotation_error_deg(sol.rotation, r_true):.4f} deg, "
          f"trans err {translation_error(sol.translation, t_true):.6f} m  ({t_teaser:.2f}s)")

    # local refinement on the full clouds from the global estimate
    t0 = time.perf_counter()
    icp = icp_point_to_point(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        max_correspondence_distance=NOISE_BOUND * 4,
        r_init=jnp.asarray(sol.rotation, jnp.float32),
        t_init=jnp.asarray(sol.translation, jnp.float32),
        max_iterations=100,
    )
    t_icp = time.perf_counter() - t0
    r_icp = np.asarray(icp.rotation, np.float64)
    t_icp_vec = np.asarray(icp.translation, np.float64)
    print(f"After ICP refinement: rot err {rotation_error_deg(r_icp, r_true):.4f} deg, "
          f"trans err {translation_error(t_icp_vec, t_true):.6f} m  "
          f"(rmse {float(icp.rmse):.2e}, fitness {float(icp.fitness):.3f}, "
          f"{int(icp.iterations)} iters, {t_icp:.2f}s)")


    return {
        "teaser_rot_err_deg": float(rotation_error_deg(sol.rotation, r_true)),
        "icp_rot_err_deg": float(rotation_error_deg(r_icp, r_true)),
        "icp_trans_err_m": float(translation_error(t_icp_vec, t_true)),
        "fitness": float(icp.fitness),
    }


if __name__ == "__main__":
    main()
