"""Batched UNKNOWN-scale registration throughput on the TPU chip.

Exercises the scale-TLS stage (sort + prefix-scan over all K = N(N-1)/2 TIM
norm ratios) that the known-scale bunny bench skips.

    python scripts/bench_scale_est.py [batch] [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from teaserpp_tpu.params import (
        InlierSelectionMode,
        RobustRegistrationSolverParams,
    )
    from teaserpp_tpu.parallel import solve_batch

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    nb = 0.01

    rng = np.random.default_rng(0)
    srcs, dsts, rs, ss, ts = [], [], [], [], []
    for i in range(batch):
        src = rng.uniform(-1, 1, size=(3, n))
        q, r_ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(r_))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        s = rng.uniform(0.5, 2.0)
        t = rng.normal(size=3) * 0.5
        dst = s * q @ src + t[:, None]
        dst += rng.uniform(-nb / 2, nb / 2, size=dst.shape)
        n_out = int(0.7 * n)
        out = rng.choice(n, size=n_out, replace=False)
        dst[:, out] = rng.uniform(-4, 4, size=(3, n_out))
        srcs.append(src)
        dsts.append(dst)
        rs.append(q)
        ss.append(s)
        ts.append(t)
    src_b = jnp.asarray(np.stack(srcs), jnp.float32)
    dst_b = jnp.asarray(np.stack(dsts), jnp.float32)

    params = RobustRegistrationSolverParams(
        noise_bound=nb,
        estimate_scaling=True,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )

    sol = jax.block_until_ready(solve_batch(src_b, dst_b, params))
    s_err = np.abs(np.asarray(sol.scale) - np.asarray(ss))
    rot_errs = []
    for i in range(batch):
        cos = (np.trace(rs[i].T @ np.asarray(sol.rotation[i], np.float64)) - 1) / 2
        rot_errs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    t_err = np.linalg.norm(np.asarray(sol.translation) - np.stack(ts), axis=1)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = solve_batch(src_b, dst_b, params)
        float(np.asarray(jnp.sum(out.rotation)))
        times.append(time.perf_counter() - t0)
    best = min(times)

    print(f"batch={batch} N={n} (K={n*(n-1)//2} pairs/problem), 70% outliers")
    print(f"warm batch {best*1e3:.1f} ms = {batch/best:.1f} unknown-scale regs/s")
    print(f"max |s err| {s_err.max():.2e}, max rot err {max(rot_errs):.4f} deg, "
          f"max t err {t_err.max():.2e} m")


if __name__ == "__main__":
    main()
