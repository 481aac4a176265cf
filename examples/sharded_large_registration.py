"""Sharded single-problem example: 10K+ correspondences, pair grid sharded.

The O(N^2) TRIM/k-core consistency structure is row-sharded over the device
mesh (`pairs` axis); on a single chip the mesh is 1x1 and the same code runs
unsharded. Synthetic stress configuration from BASELINE.md: 10K
correspondences at 95-99% outliers.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, "examples")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)


import time

import numpy as np
import jax
from jax.sharding import Mesh

from teaserpp_tpu import RobustRegistrationSolverParams, InlierSelectionMode
from teaserpp_tpu.parallel import solve_large_sharded
from teaserpp_tpu.utils.metrics import angular_error, translation_error


def main(n=10000, outlier_ratio=0.97):
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(3, n))
    q, r_ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r_))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    t = rng.uniform(-1, 1, size=3)
    dst = q @ src + t[:, None] + rng.normal(scale=0.003, size=(3, n))
    n_out = int(outlier_ratio * n)
    idx = rng.choice(n, size=n_out, replace=False)
    dst[:, idx] = rng.uniform(-3, 3, size=(3, n_out))

    devices = np.array(jax.devices())
    mesh = Mesh(devices.reshape(1, -1), ("batch", "pairs"))
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )

    res = solve_large_sharded(
        src.astype(np.float32), dst.astype(np.float32), params, mesh,
        subgraph_size=2048,
    )
    jax.block_until_ready(res)  # compile + first run
    t0 = time.perf_counter()
    res = solve_large_sharded(
        src.astype(np.float32), dst.astype(np.float32), params, mesh,
        subgraph_size=2048,
    )
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    sol = res.solution
    print(f"N={n} @ {outlier_ratio:.0%} outliers on {len(devices)} device(s)")
    print(f"valid: {bool(sol.valid)}  clique size: {int(res.clique_size)} "
          f"(true inliers: {n - n_out})")
    print(f"rotation error (deg): {np.degrees(angular_error(np.asarray(sol.rotation), q)):.4f}")
    print(f"translation error (m): {translation_error(np.asarray(sol.translation), t):.5f}")
    print(f"solve wall time (s): {dt:.3f}")
    return {
        "valid": bool(sol.valid),
        "rot_err_deg": float(np.degrees(angular_error(np.asarray(sol.rotation), q))),
        "trans_err_m": float(translation_error(np.asarray(sol.translation), t)),
        "clique_size": int(res.clique_size),
    }


if __name__ == "__main__":
    main()
