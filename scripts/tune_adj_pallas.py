"""Tile-size sweep for trim_adjacency_bits_pallas vs the XLA stripe path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_adj_pallas.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from teaserpp_tpu.ops.tims import trim_adjacency_bits
from teaserpp_tpu.ops.pallas_kernels import trim_adjacency_bits_pallas

print("backend:", jax.devices(), flush=True)

NB = 0.01
BETA = 2.0 * NB


def make_problem(rng, n):
    src = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    dst = (src + rng.standard_normal((3, n)).astype(np.float32) * (NB / 4))
    n_out = int(0.9 * n)
    idx = rng.choice(n, n_out, replace=False)
    dst[:, idx] = rng.uniform(-3, 3, (3, n_out)).astype(np.float32)
    return jnp.asarray(src), jnp.asarray(dst)


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jnp.sum(out[:1, :8].astype(jnp.int32))))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out[:1, :8].astype(jnp.int32))))
        times.append(time.perf_counter() - t0)
    return min(times)


rng = np.random.default_rng(3)

for n in (50_000, 100_000):
    src, dst = make_problem(rng, n)
    t_x = timeit(jax.jit(lambda s, d: trim_adjacency_bits(s, d, NB)), src, dst)
    print(f"N={n}: lax.map XLA {t_x*1e3:8.1f} ms", flush=True)
    for rows, cols in ((256, 2048), (512, 2048), (256, 4096),
                       (512, 4096), (1024, 2048), (128, 8192)):
        try:
            fn = jax.jit(lambda s, d, r=rows, c=cols:
                         trim_adjacency_bits_pallas(s, d, BETA, rows=r, cols=c))
            t_p = timeit(fn, src, dst)
            print(f"  pallas rows={rows:5d} cols={cols:5d}: {t_p*1e3:8.1f} ms"
                  f"  ({t_x/t_p:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas rows={rows:5d} cols={cols:5d}: FAILED {type(e).__name__}",
                  flush=True)
