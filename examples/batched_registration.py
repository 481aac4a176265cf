"""Batched registration example: a SLAM-frontend style workload.

Thousands of independent scan-to-map registrations solved as one device
program (the TPU-native organizing principle — no reference analog, which is
single-problem-per-process).
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

from teaserpp_tpu import RobustRegistrationSolverParams, InlierSelectionMode
from teaserpp_tpu.parallel import solve_batch, pad_problems
from teaserpp_tpu.parallel.results_io import save_batch_results
from teaserpp_tpu.utils.metrics import angular_error


def random_rotation(rng):
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def main(batch=256, n=256, outlier_ratio=0.9):
    rng = np.random.default_rng(0)
    srcs, dsts, rs = [], [], []
    for _ in range(batch):
        src = rng.uniform(-1, 1, size=(3, n))
        r = random_rotation(rng)
        t = rng.uniform(-1, 1, size=3)
        dst = r @ src + t[:, None]
        n_out = int(outlier_ratio * n)
        idx = rng.choice(n, size=n_out, replace=False)
        dst[:, idx] = rng.uniform(-3, 3, size=(3, n_out))
        srcs.append(src)
        dsts.append(dst)
        rs.append(r)

    src_b, dst_b, valid = pad_problems(srcs, dsts)
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )

    sol = solve_batch(
        jnp.asarray(src_b, jnp.float32),
        jnp.asarray(dst_b, jnp.float32),
        params,
        jnp.asarray(valid),
    )  # includes compile
    t0 = time.perf_counter()
    sol = solve_batch(
        jnp.asarray(src_b, jnp.float32),
        jnp.asarray(dst_b, jnp.float32),
        params,
        jnp.asarray(valid),
    )
    errs = [angular_error(np.asarray(sol.rotation[i]), rs[i]) for i in range(batch)]
    dt = time.perf_counter() - t0

    print(f"batch {batch} x {n}-corr @ {outlier_ratio:.0%} outliers")
    print(f"wall: {dt:.3f}s -> {batch / dt:.1f} registrations/s")
    print(f"rotation error: median {np.degrees(np.median(errs)):.4f} deg, "
          f"max {np.degrees(np.max(errs)):.4f} deg")
    save_batch_results("/tmp/batch_results.npz", sol)
    print("results saved to /tmp/batch_results.npz")
    return {
        "median_rot_err_deg": float(np.degrees(np.median(errs))),
        "max_rot_err_deg": float(np.degrees(np.max(errs))),
        "regs_per_sec": batch / dt,
    }


if __name__ == "__main__":
    main()
