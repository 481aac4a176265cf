"""Learned-descriptor (3DSmoothNet-style) registration example.

The reference's teaser_python_3dsmooth workflow (examples/
teaser_python_3dsmooth/teaser_python_3dsmooth.py:250-330): load precomputed
learned descriptors from .npz, gather keypoints from the fragment cloud,
mutually-nearest-neighbor match in descriptor space, and run the robust
solver on the matched keypoints.

The reference sample data ships descriptors + keypoints for fragments 2 and
36 of a 3DMatch scene but only fragment 2's point cloud, so this example
registers the real fragment-2 keypoints (with their real 32-D 3DSmoothNet
descriptors) against a rigidly transformed, noise-perturbed copy — the full
descriptor pipeline on real data with an exactly known ground truth.
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
from teaserpp_tpu.features import Matcher
from teaserpp_tpu.io import read_ply
from teaserpp_tpu.solvers.icp import icp_point_to_point
from teaserpp_tpu.utils.metrics import rotation_error_deg, translation_error

SAMPLE = "/root/reference/examples/example_data/3dmatch_sample"
NOISE = 0.01


def main(n_keypoints=None):
    # ``n_keypoints`` subsamples the keypoint set (smoke-test mode)
    cloud = read_ply(f"{SAMPLE}/cloud_bin_2.ply").as_matrix()  # (3, N)
    kp_idx = np.genfromtxt(
        f"{SAMPLE}/01_Keypoints/cloud_bin_2Keypoints.txt"
    ).astype(int)
    desc = np.load(
        f"{SAMPLE}/cloud_bin_2.ply_0.150000_16_1.750000_3DSmoothNet.npz"
    )["data"]  # (5000, 32)
    if n_keypoints is not None:
        kp_idx = kp_idx[:n_keypoints]
        desc = desc[:n_keypoints]
    keypts = cloud[:, kp_idx]  # (3, 5000)
    print(f"fragment 2: {cloud.shape[1]} points, {keypts.shape[1]} keypoints, "
          f"{desc.shape[1]}-D descriptors")

    rng = np.random.default_rng(0)
    theta = 0.6
    r_true = np.array(
        [[np.cos(theta), -np.sin(theta), 0.0],
         [np.sin(theta), np.cos(theta), 0.0],
         [0.0, 0.0, 1.0]]
    )
    t_true = np.array([0.8, -0.4, 0.3])
    dst_keypts = r_true @ keypts + t_true[:, None]
    dst_keypts += rng.normal(scale=NOISE / 3, size=dst_keypts.shape)
    # descriptors of the transformed copy: the same learned features with
    # noise, as a rotation-invariant descriptor network would produce
    dst_desc = desc + rng.normal(scale=0.05 * desc.std(), size=desc.shape)
    # shuffle the target so matching is nontrivial
    perm = rng.permutation(keypts.shape[1])
    dst_keypts = dst_keypts[:, perm]
    dst_desc = dst_desc[perm]

    t0 = time.perf_counter()
    corr = Matcher().calculateCorrespondences(
        keypts.T, dst_keypts.T, desc, dst_desc,
        use_absolute_scale=False, use_crosscheck=True,
    )
    t_match = time.perf_counter() - t0
    good = sum(1 for i, j in corr if perm[j] == i)
    print(f"mutual-NN matching: {len(corr)} correspondences "
          f"({good} true, {1 - good / max(len(corr), 1):.1%} outliers, {t_match:.2f}s)")

    params = RobustRegistrationSolverParams(
        noise_bound=NOISE,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
    )
    solver = RobustRegistrationSolver(params)
    t0 = time.perf_counter()
    sol = solver.solve(keypts, dst_keypts, correspondences=corr)
    t_solve = time.perf_counter() - t0
    print(f"TEASER solve: rot err {rotation_error_deg(sol.rotation, r_true):.4f} deg, "
          f"trans err {translation_error(sol.translation, t_true):.6f} m ({t_solve:.2f}s)")

    icp = icp_point_to_point(
        jnp.asarray(keypts, jnp.float32), jnp.asarray(dst_keypts, jnp.float32),
        max_correspondence_distance=NOISE * 4,
        r_init=jnp.asarray(sol.rotation, jnp.float32),
        t_init=jnp.asarray(sol.translation, jnp.float32),
        max_iterations=100,
    )
    r_icp = np.asarray(icp.rotation, np.float64)
    print(f"after ICP:    rot err {rotation_error_deg(r_icp, r_true):.4f} deg, "
          f"trans err {translation_error(np.asarray(icp.translation, np.float64), t_true):.6f} m "
          f"(fitness {float(icp.fitness):.3f})")
    return {
        "valid": bool(sol.valid),
        "teaser_rot_err_deg": float(rotation_error_deg(sol.rotation, r_true)),
        "icp_rot_err_deg": float(rotation_error_deg(r_icp, r_true)),
        "n_corr": len(corr),
    }


if __name__ == "__main__":
    main()
