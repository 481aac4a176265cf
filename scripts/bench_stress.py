"""BASELINE.json stress configs on the real chip.

  1. bunny at 95% / 99% outlier rates (accuracy must hold inside the
     reference gates: <0.1 deg, <0.01 m)
  2. 4096 independent registrations per device program (scan-to-map
     frontend shape: N=256 per problem, 90% outliers)

    python scripts/bench_stress.py [config]   # config in {bunny95, bunny99, b4096}
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_bunny(pct: float):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from bunny_registration import make_bunny_problem, T

    from teaserpp_tpu.params import (
        InlierSelectionMode,
        RobustRegistrationSolverParams,
    )
    from teaserpp_tpu.parallel import solve_batch
    from teaserpp_tpu.utils.metrics import rotation_error_deg, translation_error

    batch = 128
    # NOTE: the teaser_cpp_ply outlier model (integer shift along (1,1,1))
    # is ill-posed above ~60% unique outliers: outliers sharing a shift value
    # keep their mutual distances, so each shift group IS a TRIM clique
    # (~pct*1889/6 members) that outgrows the true inlier set — no solver,
    # the reference included, can disambiguate that. For the >=95% stress
    # configs we scatter outliers uniformly (the reference's own
    # OutlierDetection test model, registration-test.cc:394-467).
    n = 1889
    n_out = int(pct * n)
    srcs, dsts, rates, oracle = [], [], [], []
    r_true_, t_true_ = T[:3, :3], T[:3, 3]
    for seed in range(batch):
        src, tgt, _ = make_bunny_problem(seed=seed, n_outliers=0)
        rng = np.random.default_rng(10_000 + seed)
        idx = rng.choice(n, size=n_out, replace=False)
        lo, hi = tgt.min(), tgt.max()
        tgt[:, idx] = rng.uniform(lo - 1, hi + 1, size=(3, n_out))
        srcs.append(src)
        dsts.append(tgt)
        rates.append(n_out / n)
        # oracle: Procrustes on the TRUE inlier set — the statistical floor
        # for this draw; no estimator can beat it on average
        inl = np.setdiff1d(np.arange(n), idx)
        a, b = src[:, inl], tgt[:, inl]
        ac, bc = a - a.mean(1, keepdims=True), b - b.mean(1, keepdims=True)
        u, _, vt = np.linalg.svd(bc @ ac.T)
        d = np.sign(np.linalg.det(u @ vt))
        r_o = u @ np.diag([1, 1, d]) @ vt
        cos = (np.trace(r_true_.T @ r_o) - 1) / 2
        oracle.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    src_b = jnp.asarray(np.stack(srcs), jnp.float32)
    dst_b = jnp.asarray(np.stack(dsts), jnp.float32)

    params = RobustRegistrationSolverParams(
        noise_bound=0.001, cbar2=1.0, estimate_scaling=False,
        rotation_cost_threshold=0.005,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
        final_polish=True,  # small inlier counts: re-fit (R, t) on inliers
    )
    sol = jax.block_until_ready(solve_batch(src_b, dst_b, params))
    r_true, t_true = T[:3, :3], T[:3, 3]
    rot = [rotation_error_deg(np.asarray(sol.rotation[i]), r_true) for i in range(batch)]
    tr = [translation_error(np.asarray(sol.translation[i]), t_true) for i in range(batch)]
    t0 = time.perf_counter()
    out = solve_batch(src_b, dst_b, params)
    float(np.asarray(jnp.sum(out.rotation)))
    dt = time.perf_counter() - t0
    rot = np.asarray(rot)
    oracle = np.asarray(oracle)
    print(f"bunny @ {np.mean(rates):.1%} outliers, batch {batch}: {batch/dt:.0f} regs/s")
    print(f"  rot err deg   mean {rot.mean():.4f}  median {np.median(rot):.4f}  "
          f"max {rot.max():.4f}   (t err max {max(tr):.2e} m)")
    print(f"  oracle (true-inlier Procrustes, statistical floor): "
          f"mean {oracle.mean():.4f}  max {oracle.max():.4f}")
    print(f"  vs floor: mean ratio {rot.mean()/oracle.mean():.2f}x, "
          f"max ratio {rot.max()/oracle.max():.2f}x")


def run_b4096():
    import jax
    import jax.numpy as jnp

    from teaserpp_tpu.params import (
        InlierSelectionMode,
        RobustRegistrationSolverParams,
    )
    from teaserpp_tpu.parallel import solve_batch

    batch, n, nb = 4096, 256, 0.01
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(batch, 3, n)).astype(np.float32)
    qs, ts = [], []
    dst = np.empty_like(src)
    for i in range(batch):
        q, r_ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(r_))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        t = rng.normal(size=3) * 0.5
        dst[i] = q @ src[i] + t[:, None]
        qs.append(q)
        ts.append(t)
    dst += rng.uniform(-nb / 2, nb / 2, size=dst.shape).astype(np.float32)
    n_out = int(0.9 * n)
    for i in range(batch):
        out = rng.choice(n, size=n_out, replace=False)
        dst[i][:, out] = rng.uniform(-4, 4, size=(3, n_out))

    params = RobustRegistrationSolverParams(
        noise_bound=nb, estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )
    src_b, dst_b = jnp.asarray(src), jnp.asarray(dst)
    sol = jax.block_until_ready(solve_batch(src_b, dst_b, params))
    rot = []
    for i in range(0, batch, 8):  # sample accuracy check
        cos = (np.trace(qs[i].T @ np.asarray(sol.rotation[i], np.float64)) - 1) / 2
        rot.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    t0 = time.perf_counter()
    out = solve_batch(src_b, dst_b, params)
    float(np.asarray(jnp.sum(out.rotation)))
    dt = time.perf_counter() - t0
    print(f"4096 x N={n} @ 90% outliers: {batch/dt:.0f} regs/s "
          f"({dt*1e3:.0f} ms/batch), max sampled rot err {max(rot):.4f} deg")


if __name__ == "__main__":
    cfg = sys.argv[1] if len(sys.argv) > 1 else "bunny95"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if cfg == "bunny95":
        run_bunny(0.95)
    elif cfg == "bunny99":
        run_bunny(0.99)
    else:
        run_b4096()
