"""Compare XLA vs Pallas TRIM-adjacency in the *batched* bench shape.

Validates bit-equality of the masks and times both on the chip.
"""

import sys
import time

import numpy as np


def timeit(fn, *args, repeats=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jnp.sum(out.astype(jnp.int32))))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out.astype(jnp.int32))))
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
    from teaserpp_tpu.ops.tims import trim_adjacency_dense
    from teaserpp_tpu.ops.pallas_kernels import trim_adjacency_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nb, cbar2 = 0.001, 1.0
    beta = 2.0 * nb

    srcs, dsts = [], []
    for seed in range(batch):
        s, d, _ = make_bunny_problem(seed=seed)
        srcs.append(s)
        dsts.append(d)
    src_b = jnp.asarray(np.stack(srcs), jnp.float32)
    dst_b = jnp.asarray(np.stack(dsts), jnp.float32)

    @jax.jit
    def adj_xla(s, d):
        return jax.vmap(
            lambda a, b: trim_adjacency_dense(a, b, nb, cbar2, use_matmul=True)
        )(s, d)

    @jax.jit
    def adj_bcast(s, d):
        return jax.vmap(lambda a, b: trim_adjacency_dense(a, b, nb, cbar2))(s, d)

    @jax.jit
    def adj_pl(s, d):
        return jax.vmap(lambda a, b: trim_adjacency_pallas(a, b, beta).astype(bool))(
            s, d
        )

    t_x, ax = timeit(adj_xla, src_b, dst_b)
    t_b, ab = timeit(adj_bcast, src_b, dst_b)
    t_p, ap = timeit(adj_pl, src_b, dst_b)
    eq = bool(jnp.all(ax == ap))
    eqb = bool(jnp.all(ax == ab))
    mism = int(jnp.sum(ax != ab))
    print(f"batch={batch} N={src_b.shape[-1]}")
    print(f"xla matmul: {t_x*1e3:8.1f} ms")
    print(f"xla bcast:  {t_b*1e3:8.1f} ms   equal_to_matmul={eqb} mismatches={mism}")
    print(f"pallas:     {t_p*1e3:8.1f} ms   equal={eq}")


if __name__ == "__main__":
    main()
