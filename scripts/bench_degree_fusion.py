"""Fused predicate-into-degree A/B + compiled-HLO evidence (VERDICT r4 #5/#8).

Measures, on the real chip:
  A. `trim_degrees_pallas` — TRIM-graph row degrees with the (N, N)
     predicate never materialized (not even as packed bits);
  B. the production path — `trim_adjacency_bits[_pallas]` (predicate packed
     to uint32 words in VMEM, words written to HBM) followed by the
     popcount degree reduction the k-core peel's first round performs.
at bunny scale (N=1889) and N=100K, warm, honest scalar-fetch timing.

Also dumps the POST-OPTIMIZATION compiled HLO of the N=100K XLA bits
builder and reports every >=1 MB buffer the executable actually
materializes — the evidence the r4 response cited but never produced
(VERDICT r4 Weak #3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_degree_fusion.py
"""
import re
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from teaserpp_tpu.ops.pallas_kernels import (
    trim_adjacency_bits_pallas,
    trim_degrees_pallas,
)
from teaserpp_tpu.ops.tims import trim_adjacency_bits

print("backend:", jax.devices(), flush=True)


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


@jax.jit
def popcount_degrees(bits):
    """(W, N) uint32 words -> (N,) int32 column degrees (adjacency is
    symmetric, so column sums == row degrees) — the k-core first round."""
    x = bits
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    pc = (x * jnp.uint32(0x01010101)) >> 24
    return jnp.sum(pc.astype(jnp.int32), axis=0)


def make_problem(rng, n, nb=0.005, outlier_frac=0.9):
    src = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    dst = (src + rng.normal(scale=nb / 4, size=(3, n))).astype(np.float32)
    k = int(n * outlier_frac)
    idx = rng.choice(n, k, replace=False)
    dst[:, idx] = rng.uniform(-2, 2, (3, k)).astype(np.float32)
    return jnp.asarray(src), jnp.asarray(dst), 2 * nb


def ab(tag, n, use_pallas_bits):
    rng = np.random.default_rng(42)
    src, dst, beta = make_problem(rng, n)
    bits_fn = (
        (lambda: trim_adjacency_bits_pallas(src, dst, beta))
        if use_pallas_bits
        else (lambda: trim_adjacency_bits(src, dst, beta / 2))
    )
    # warm
    deg_a = trim_degrees_pallas(src, dst, beta)
    fetch(deg_a)
    bits = bits_fn()
    deg_b = popcount_degrees(bits)
    fetch(deg_b)
    agree = bool(jnp.array_equal(deg_a, deg_b))
    # timed, best of 3
    ta, tb, tb_bits = [], [], []
    for _ in range(3):
        t0 = time.time()
        fetch(trim_degrees_pallas(src, dst, beta))
        ta.append(time.time() - t0)
        t0 = time.time()
        bits = bits_fn()
        fetch(popcount_degrees(bits))
        tb.append(time.time() - t0)
        t0 = time.time()
        fetch(bits_fn()[0, 0].astype(jnp.int32))
        tb_bits.append(time.time() - t0)
    print(f"{tag}: fused-degrees {min(ta)*1e3:.1f} ms | "
          f"bits+popcount {min(tb)*1e3:.1f} ms (bits alone "
          f"{min(tb_bits)*1e3:.1f} ms) | degrees agree: {agree}", flush=True)


# --- A/B ---------------------------------------------------------------
ab("bunny-scale N=1889 (XLA bits path)", 1889, use_pallas_bits=False)
ab("N=100000 (Pallas bits path, the production dispatch)", 100_000,
   use_pallas_bits=True)

# --- compiled-HLO materialization evidence -----------------------------
print("\n--- compiled HLO of the N=100K XLA bits builder ---", flush=True)
rng = np.random.default_rng(42)
src, dst, beta = make_problem(rng, 100_000)
lowered = jax.jit(
    lambda s, d: trim_adjacency_bits(s, d, beta / 2)
).lower(src, dst)
compiled = lowered.compile()
txt = compiled.as_text()
out_path = "/root/repo/.hlo_bits_builder_n100k.txt"
with open(out_path, "w") as f:
    f.write(txt)
# every tensor shape in the optimized HLO >= 1 MB
sizes = {}
for m in re.finditer(r"(f32|u32|s32|pred)\[([0-9,]+)\]", txt):
    dt, dims = m.group(1), m.group(2)
    elems = 1
    for d in dims.split(","):
        elems *= int(d)
    bytes_ = elems * (1 if dt == "pred" else 4)
    if bytes_ >= 1 << 20:
        key = f"{dt}[{dims}]"
        sizes[key] = max(sizes.get(key, 0), bytes_)
print(f"HLO text ({len(txt.splitlines())} lines) -> {out_path}", flush=True)
for k, v in sorted(sizes.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  {v/2**20:8.1f} MB  {k}", flush=True)
try:
    mem = compiled.memory_analysis()
    print(f"memory_analysis: temp={mem.temp_size_in_bytes/2**20:.1f} MB "
          f"out={mem.output_size_in_bytes/2**20:.1f} MB "
          f"peak args+temp ~ {(mem.temp_size_in_bytes + mem.argument_size_in_bytes)/2**20:.1f} MB",
          flush=True)
except Exception as e:  # relay backends may not expose it
    print(f"memory_analysis unavailable: {e}", flush=True)
