"""Bunny registration example — the reference's headline demo.

Replicates examples/teaser_cpp_ply/teaser_cpp_ply.cc: load the Stanford bunny
(1889 points), apply a fixed SE(3) transform, add uniform noise (bound 0.001)
and 1700 random outliers (~90%), then solve with known scale + exact max
clique + GNC-TLS and report rotation/translation errors and wall time.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, "examples")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)


import argparse
import time

import numpy as np

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
)
from teaserpp_tpu.io import read_ply
from teaserpp_tpu.utils.metrics import angular_error, translation_error

BUNNY_PLY = "/root/reference/examples/example_data/bun_zipper_res3.ply"
NOISE_BOUND = 0.001
N_OUTLIERS = 1700

# The example's fixed SE(3) transform (teaser_cpp_ply.cc:63-68). The
# reference's hard-coded rotation block is ~0.004 rad away from SO(3)
# (rounded digits), which puts a 0.236 deg floor under the angular-error
# metric; we project it to its orthogonal polar factor so the ground truth
# is an actual rotation.
T = np.array(
    [
        [9.96926560e-01, 6.68735757e-02, -4.06664421e-02, -1.15576939e-01],
        [-6.61289946e-02, 9.97617877e-01, 1.94008687e-02, -3.87705398e-02],
        [4.18675510e-02, -1.66517807e-02, 9.98977765e-01, 1.14874890e-01],
        [0, 0, 0, 1],
    ]
)
_u, _s, _vt = np.linalg.svd(T[:3, :3])
T[:3, :3] = _u @ _vt


def make_bunny_problem(seed=0, n_outliers=N_OUTLIERS, noise_bound=NOISE_BOUND):
    rng = np.random.default_rng(seed)
    src = read_ply(BUNNY_PLY).as_matrix()  # (3, 1889)
    tgt = T[:3, :3] @ src + T[:3, 3:4]
    # uniform noise in [-nb/2, nb/2] (teaser_cpp_ply.cc:22-25)
    tgt = tgt + rng.uniform(-noise_bound / 2, noise_bound / 2, size=tgt.shape)
    # outliers: random per-point scalar shift in [5, 10] (teaser_cpp_ply.cc:27-40)
    outlier_idx = rng.integers(0, src.shape[1], size=n_outliers)
    mask = np.zeros(src.shape[1], bool)
    mask[outlier_idx] = True
    tgt[:, mask] += rng.integers(5, 11, size=mask.sum())
    return src, tgt, mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="PMC_EXACT",
                    choices=["PMC_EXACT", "PMC_HEU", "KCORE_HEU", "NONE"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    src, tgt, outlier_mask = make_bunny_problem(seed=args.seed)
    params = RobustRegistrationSolverParams(
        noise_bound=NOISE_BOUND,
        cbar2=1.0,
        estimate_scaling=False,
        rotation_max_iterations=100,
        rotation_gnc_factor=1.4,
        rotation_cost_threshold=0.005,
        inlier_selection_mode=InlierSelectionMode[args.mode],
    )
    solver = RobustRegistrationSolver(params)
    t0 = time.perf_counter()
    solution = solver.solve(src, tgt)
    dt = time.perf_counter() - t0

    r_err = angular_error(solution.rotation, T[:3, :3])
    t_err = translation_error(solution.translation, T[:3, 3])
    print("=====================================")
    print("        teaserpp_tpu results          ")
    print("=====================================")
    print(f"valid: {solution.valid}")
    print(f"rotation error (deg): {np.degrees(r_err):.6f}")
    print(f"translation error (m): {t_err:.6f}")
    print(f"correspondences: {src.shape[1]}, injected outliers: {outlier_mask.sum()}")
    print(f"max clique size: {len(solver.getInlierMaxClique())}")
    print(f"time taken (s): {dt:.4f}")
    return {
        "valid": bool(solution.valid),
        "rot_err_deg": float(np.degrees(r_err)),
        "trans_err_m": float(t_err),
    }


if __name__ == "__main__":
    main()
