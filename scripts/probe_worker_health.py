"""Quick tunneled-TPU worker health probe.

The worker/relay intermittently degrades (~10x inflation of identical
cached stages; PERFORMANCE.md "Front-end e2e" caught 35 s / 60 s / 5 s on
the same cached program, and post-crash degradation was documented in r3
via probe_long_execution.py). Benchmarks published from a degraded window
are garbage — run this first: it times a small cached matmul program and
a medium HBM-streaming program three times each with honest scalar
fetches and prints a verdict against healthy-worker reference times.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_worker_health.py
Exit code 0 = healthy, 2 = degraded.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

print("backend:", jax.devices(), flush=True)


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def small_prog(a, b):  # ~0.3 GFLOP matmul: latency-dominated
    return (a @ b).sum()


@jax.jit
def stream_prog(x):  # ~1.6 GB of HBM traffic: bandwidth-dominated
    return jnp.sum(x * 1.0000001 + 0.5, axis=0)


rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((4096, 100_000)).astype(np.float32))

# warm (compile or cache-load)
fetch(small_prog(a, b))
fetch(stream_prog(x))

small_t, stream_t = [], []
for _ in range(3):
    t0 = time.time()
    fetch(small_prog(a, b))
    small_t.append(time.time() - t0)
    t0 = time.time()
    fetch(stream_prog(x))
    stream_t.append(time.time() - t0)

s_best, h_best = min(small_t), min(stream_t)
print(f"small cached program (relay RTT probe): best {s_best*1e3:.0f} ms "
      f"(all: {[f'{t*1e3:.0f}' for t in small_t]})", flush=True)
print(f"1.6 GB stream program (HBM probe): best {h_best*1e3:.0f} ms "
      f"(all: {[f'{t*1e3:.0f}' for t in stream_t]})", flush=True)

# Healthy references: RTT ~23 ms; the stream program is ~2 ms device + RTT.
# Degraded windows inflate these ~10x.
healthy = s_best < 0.15 and h_best < 0.25
print(f"VERDICT: {'HEALTHY' if healthy else 'DEGRADED'} "
      f"(gates: small < 150 ms, stream < 250 ms)", flush=True)
sys.exit(0 if healthy else 2)
