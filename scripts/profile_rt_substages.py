"""Finer-grained timing of the rotation+translation stage of the bench.

Sub-stages, each its own jitted program on bench-shaped inputs:
  tims  — chain-TIM construction from the clique mask
  gnc   — GNC-TLS rotation loop on the chain TIMs
  tls   — component-wise TLS translation given the rotation
  rtt   — trivial program (x+1 on a scalar), measures tunnel round-trip
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
        leaf = jax.tree_util.tree_leaves(out)[0]
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
    from teaserpp_tpu.ops.tims import trim_adjacency_dense, chain_tims
    from teaserpp_tpu.clique.kcore import core_numbers
    from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls
    from teaserpp_tpu.solvers.translation import solve_translation_tls

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
    def stage_mask(s, d):
        def one(a, b):
            adj = trim_adjacency_dense(a, b, params.noise_bound, params.cbar2)
            core = core_numbers(adj)
            return core >= jnp.max(core)

        return jax.vmap(one)(s, d)

    @jax.jit
    def stage_tims(s, d, mask):
        def one(a, b, m):
            st, tv = chain_tims(a, m)
            dt, _ = chain_tims(b, m)
            return st, dt, tv

        return jax.vmap(one)(s, d, mask)

    @jax.jit
    def stage_gnc(st, dt, tv):
        nb = params.noise_bound * 2.0

        def one(a, b, v):
            r = solve_rotation_gnc_tls(
                a, b, nb,
                gnc_factor=params.rotation_gnc_factor,
                max_iterations=params.rotation_max_iterations,
                cost_threshold=params.rotation_cost_threshold,
                valid=v,
            )
            return r.rotation, r.iterations

        return jax.vmap(one)(st, dt, tv)

    @jax.jit
    def stage_tls(s, d, rot, mask):
        def one(a, b, r, m):
            aligned = r @ a
            t = solve_translation_tls(aligned, b, params.noise_bound, params.cbar2, valid=m)
            return t.translation

        return jax.vmap(one)(s, d, rot, mask)

    @jax.jit
    def rtt(x):
        return x + 1.0

    t_rtt, _ = timeit(rtt, jnp.zeros((), jnp.float32))
    _, mask = timeit(stage_mask, src_b, dst_b)
    t_tims, (st, dt, tv) = timeit(stage_tims, src_b, dst_b, mask)
    t_gnc, (rot, iters) = timeit(stage_gnc, st, dt, tv)
    t_tls, _ = timeit(stage_tls, src_b, dst_b, rot, mask)

    print(f"batch={batch} N={src_b.shape[-1]}")
    print(f"rtt (null program): {t_rtt*1e3:8.1f} ms")
    print(f"tims:  {t_tims*1e3:8.1f} ms")
    print(f"gnc:   {t_gnc*1e3:8.1f} ms   iters={np.asarray(iters)[:8]}")
    print(f"tls:   {t_tls*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
