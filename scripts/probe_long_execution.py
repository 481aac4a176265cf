"""Probe: does the axon relay/worker kill long-RUNNING device programs?

Runs one while_loop device program of calibrated duration (dummy f32
matmul chain), fetching a scalar at the end. Usage:
    python scripts/probe_long_execution.py <iters>
Calibrate with a small <iters> first; scale up to 5/12/25-minute programs.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

iters = int(sys.argv[1])
print("backend:", jax.devices(), "iters:", iters, flush=True)


@jax.jit
def long_loop(a, n):
    def body(state):
        i, x = state
        x = x @ a
        x = x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)  # keep finite
        return i + 1, x

    _, x = jax.lax.while_loop(lambda s: s[0] < n, body, (jnp.int32(0), a))
    return jnp.sum(x)


rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.float32)
t0 = time.time()
s = float(np.asarray(long_loop(a, jnp.int32(iters))))
t1 = time.time()
print(f"OK iters={iters} wall={t1 - t0:.1f}s checksum={s:.3e}", flush=True)
