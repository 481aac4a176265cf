"""Stage-level TPU timing of the bench pipeline (batch bunny, KCORE mode).

Splits the fused register_pair program into its three stages and times each
as its own jitted program, so we can see where the batch wall time goes:
  1. adj    — TRIM adjacency build (Gram matmuls + compare)
  2. clique — bitset k-core peel + top-core mask
  3. rt     — chain-TIM GNC rotation + TLS translation

Each stage is timed with a host-fetched scalar (the tunnel's
block_until_ready can be optimistic). Run on the real chip:
    python scripts/profile_bench_stages.py [batch]
"""

import sys
import time

import numpy as np


def timeit(fn, *args, repeats=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, "examples")
    from bunny_registration import make_bunny_problem

    from teaserpp_tpu.params import (
        InlierSelectionMode,
        RobustRegistrationSolverParams,
    )
    from teaserpp_tpu.ops.tims import trim_adjacency_dense
    from teaserpp_tpu.clique.kcore import core_numbers
    from teaserpp_tpu.solvers.pipeline import rotation_translation_stage
    from teaserpp_tpu.parallel import solve_batch

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    params = RobustRegistrationSolverParams(
        noise_bound=0.001,
        cbar2=1.0,
        estimate_scaling=False,
        rotation_cost_threshold=0.005,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )

    srcs, dsts = [], []
    for seed in range(batch):
        s, d, _ = make_bunny_problem(seed=seed)
        srcs.append(s)
        dsts.append(d)
    src_b = jnp.asarray(np.stack(srcs), jnp.float32)
    dst_b = jnp.asarray(np.stack(dsts), jnp.float32)

    @jax.jit
    def stage_adj(s, d):
        return jax.vmap(
            lambda a, b: trim_adjacency_dense(a, b, params.noise_bound, params.cbar2)
        )(s, d)

    @jax.jit
    def stage_clique(adj):
        def one(a):
            core = core_numbers(a)
            return core >= jnp.max(core)

        return jax.vmap(one)(adj)

    @jax.jit
    def stage_rt(s, d, mask):
        scale = jnp.ones((), s.dtype)
        return jax.vmap(
            lambda a, b, m: rotation_translation_stage(a, b, scale, m, params)
        )(s, d, mask)

    t_adj, adj = timeit(stage_adj, src_b, dst_b)
    t_clq, mask = timeit(stage_clique, adj)
    t_rt, sol = timeit(stage_rt, src_b, dst_b, mask)
    t_full, _ = timeit(lambda s, d: solve_batch(s, d, params), src_b, dst_b)

    print(f"batch={batch} N={src_b.shape[-1]}")
    print(f"adj:    {t_adj*1e3:8.1f} ms")
    print(f"clique: {t_clq*1e3:8.1f} ms")
    print(f"rt:     {t_rt*1e3:8.1f} ms")
    print(f"sum:    {(t_adj+t_clq+t_rt)*1e3:8.1f} ms")
    print(f"fused full pipeline: {t_full*1e3:8.1f} ms")
    print(f"rotation iterations: {np.asarray(sol.rotation_iterations)[:8]}")


if __name__ == "__main__":
    main()
