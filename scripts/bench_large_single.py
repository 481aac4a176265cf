"""Single huge-N registration on one chip via the sharded-path program.

The reference caps practical N around a few thousand (PMC's dense-adjacency
limit is 20000 and the O(N^2) TIM build is single-node RAM-bound); here the
known-scale pipeline (fused TRIM adjacency -> k-core -> top-core subgraph ->
greedy clique -> GNC + TLS) runs at N=10K-50K on one chip, and row-shards
over a mesh for larger N / more chips.

    python scripts/bench_large_single.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from teaserpp_tpu.params import (
        InlierSelectionMode,
        RobustRegistrationSolverParams,
    )
    from teaserpp_tpu.parallel.sharded import solve_large_sharded

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    nb = 0.01
    outlier_ratio = 0.9

    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(3, n))
    theta = 0.5
    r_true = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1.0]]
    )
    t_true = np.array([0.3, -0.2, 0.4])
    dst = r_true @ src + t_true[:, None]
    dst += rng.uniform(-nb / 2, nb / 2, size=dst.shape)
    n_out = int(outlier_ratio * n)
    out = rng.choice(n, size=n_out, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, n_out))

    params = RobustRegistrationSolverParams(
        noise_bound=nb,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )
    mesh = Mesh(np.array(jax.devices()), ("pairs",))

    src_j = jnp.asarray(src, jnp.float32)
    dst_j = jnp.asarray(dst, jnp.float32)

    t0 = time.perf_counter()
    res = solve_large_sharded(src_j, dst_j, params, mesh)
    jax.block_until_ready(res)
    float(np.asarray(jnp.sum(res.solution.rotation)))
    t_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = solve_large_sharded(src_j, dst_j, params, mesh)
    float(np.asarray(jnp.sum(res.solution.rotation)))
    t_warm = time.perf_counter() - t0

    r_est = np.asarray(res.solution.rotation, np.float64)
    t_est = np.asarray(res.solution.translation, np.float64)
    cos = (np.trace(r_true.T @ r_est) - 1) / 2
    rot_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    print(f"N={n} outliers={outlier_ratio:.0%} devices={len(mesh.devices)}")
    print(f"cold {t_cold:.2f}s, warm {t_warm:.3f}s")
    print(f"rot err {rot_err:.4f} deg, trans err {np.linalg.norm(t_est - t_true):.2e} m, "
          f"max_core {int(res.max_core)}, clique {int(res.clique_size)} "
          f"(true inliers {n - n_out})")


if __name__ == "__main__":
    main()
