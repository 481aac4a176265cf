"""Stage timing of the huge-N pipeline (where do N=100K's 5 s go?).

    python scripts/profile_large_stages.py [N]
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

    from teaserpp_tpu.ops.tims import trim_adjacency_bits
    from teaserpp_tpu.clique.kcore import core_numbers_from_bits

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    nb = 0.01
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(3, n))
    theta = 0.5
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    dst = r @ src + np.array([[0.3], [-0.2], [0.4]])
    n_out = int(0.9 * n)
    out = rng.choice(n, size=n_out, replace=False)
    dst[:, out] = rng.uniform(-3, 3, size=(3, n_out))
    src_j = jnp.asarray(src, jnp.float32)
    dst_j = jnp.asarray(dst, jnp.float32)

    bits_fn = jax.jit(lambda s, d: trim_adjacency_bits(s, d, nb))
    core_fn = jax.jit(lambda b: core_numbers_from_bits(b, n))

    bits = jax.block_until_ready(bits_fn(src_j, dst_j))
    t0 = time.perf_counter()
    bits = bits_fn(src_j, dst_j)
    float(np.asarray(jnp.sum(bits[0].astype(jnp.float32))))
    t_bits = time.perf_counter() - t0

    core = jax.block_until_ready(core_fn(bits))
    t0 = time.perf_counter()
    core = core_fn(bits)
    float(np.asarray(jnp.max(core).astype(jnp.float32)))
    t_core = time.perf_counter() - t0

    # round count: distinct peel levels (host estimate from core histogram)
    levels = len(np.unique(np.asarray(core)))
    print(f"N={n}: adjacency+pack {t_bits:.2f}s, k-core peel {t_core:.2f}s, "
          f"distinct core levels ~{levels}, max_core {int(np.asarray(core).max())}")


if __name__ == "__main__":
    main()
