"""Huge-N TRIM-adjacency-to-bits: Pallas stripe kernel vs lax.map XLA path.

VERDICT r1 #7 done-gate: measured speedup (or documented negative result)
of ``trim_adjacency_bits_pallas`` vs ``trim_adjacency_bits`` at N=50K/100K
on the chip. Also validates word-level equality of the packed outputs at a
size where both are cheap to fetch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_adj_bits_pallas.py
"""
import sys
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
    # honest timing through the relay: fetch a scalar to host
    float(np.asarray(jnp.sum(out[:1, :8].astype(jnp.uint64))))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.sum(out[:1, :8].astype(jnp.uint64))))
        times.append(time.perf_counter() - t0)
    return min(times), out


rng = np.random.default_rng(3)

xla_fn = jax.jit(lambda s, d: trim_adjacency_bits(s, d, NB))
pl_fn = jax.jit(lambda s, d: trim_adjacency_bits_pallas(s, d, BETA))

# equality check at moderate N
src, dst = make_problem(rng, 8192)
bx = np.asarray(xla_fn(src, dst))
bp = np.asarray(pl_fn(src, dst))
mism = int(np.sum(bx != bp))
total = bx.size
print(f"N=8192 packed-word mismatches: {mism}/{total}", flush=True)

for n in (50_000, 100_000):
    src, dst = make_problem(rng, n)
    t_x, _ = timeit(xla_fn, src, dst)
    t_p, _ = timeit(pl_fn, src, dst)
    print(
        f"N={n}: lax.map bits {t_x*1e3:8.1f} ms | pallas bits {t_p*1e3:8.1f} ms"
        f"  ({t_x/t_p:.2f}x)", flush=True,
    )
