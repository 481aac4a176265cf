"""Profile the FPFH descriptor stage on the chip (VERDICT r4 #3).

Two jobs:
  1. RECONCILE the r4 discrepancy: PERFORMANCE.md's e2e table said the
     scene60k descriptor stage was 93.3 s warm while the component table
     said 4.0 s for the same cloud/radii — this script times the dense
     path per PASS and per CHUNK (honest scalar fetch per measurement) on
     exactly the e2e clouds, so device time vs dispatch-chain overhead vs
     stale-table is decided by measurement.
  2. Measure the grid-hash pruned path (features/spatial.py) against the
     dense path on the same clouds — the r5 descriptor-scaling fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fpfh_stage.py [dense] [grid] [synth]
  (no args = all on the 60K scene pair)
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

from teaserpp_tpu.features import estimate_normals
from teaserpp_tpu.features.normals import estimate_normals_pruned, _normals_chunk
from teaserpp_tpu.features.fpfh import (
    compute_fpfh,
    compute_fpfh_pruned,
    _spfh_chunk,
    _fpfh_chunk,
)
from teaserpp_tpu.features.spatial import build_neighbor_plans
from teaserpp_tpu.io.ply import read_ply

REFERENCE_DATA = "/root/reference/test/teaser/data"
CHUNK = 2048  # the e2e configuration

print("backend:", jax.devices(), flush=True)

args = [a for a in sys.argv[1:]]
do_dense = not args or "dense" in args
do_grid = not args or "grid" in args
do_synth = "synth" in args


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def rigid_copy(pts, rng, noise=0.005):
    q, r_ = np.linalg.qr(rng.standard_normal((3, 3)))
    q *= np.sign(np.diag(r_))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    t = rng.uniform(-1, 1, 3)
    return pts @ q.T + t + rng.normal(scale=noise / 3, size=pts.shape)


def time_dense(tag, pts, rn, rf):
    pts_d = jnp.asarray(pts, jnp.float32)
    n = len(pts)
    # warm (compile) pass
    nres = estimate_normals(pts_d, rn, chunk_size=CHUNK)
    fetch(nres.normals)
    desc = compute_fpfh(pts_d, nres.normals, rf, chunk_size=CHUNK)
    fetch(desc)
    # timed pass, per stage
    t0 = time.time()
    nres = estimate_normals(pts_d, rn, chunk_size=CHUNK)
    fetch(nres.normals)
    t_n = time.time() - t0
    t0 = time.time()
    desc = compute_fpfh(pts_d, nres.normals, rf, chunk_size=CHUNK)
    fetch(desc)
    t_f = time.time() - t0
    print(f"{tag} dense: normals {t_n:.2f}s  spfh+fpfh {t_f:.2f}s  "
          f"total {t_n + t_f:.2f}s", flush=True)
    # per-chunk anatomy of the SPFH pass: device time for one FULL chunk
    # (the ragged tail chunk is not represented — same shape, masked rows)
    normals = nres.normals
    cp = pts_d[:CHUNK]
    cn = normals[:CHUNK]
    cv = jnp.ones((CHUNK,), jnp.float32)
    fetch(_spfh_chunk(cp, cn, cv, pts_d, normals, rf))  # warm
    times = []
    for _ in range(4):
        t0 = time.time()
        fetch(_spfh_chunk(cp, cn, cv, pts_d, normals, rf))
        times.append(time.time() - t0)
    nchunks = (n + CHUNK - 1) // CHUNK
    per = min(times)
    print(f"{tag} dense: spfh chunk ({CHUNK}x{n}) best-of-4 {per*1e3:.0f} ms "
          f"x {nchunks} chunks -> {per*nchunks:.2f}s extrapolated "
          f"(all-4: {[f'{t*1e3:.0f}' for t in times]})", flush=True)
    return desc


def time_grid(tag, pts, rn, rf):
    t0 = time.time()
    plans = build_neighbor_plans(pts, (rn, rf))
    t_plan = time.time() - t0
    pts_d = jnp.asarray(pts, jnp.float32)
    # warm
    nres = estimate_normals_pruned(pts_d, rn, plans[0])
    fetch(nres.normals)
    desc = compute_fpfh_pruned(pts_d, nres.normals, rf, plans[1])
    fetch(desc)
    # timed
    t0 = time.time()
    nres = estimate_normals_pruned(pts_d, rn, plans[0])
    fetch(nres.normals)
    t_n = time.time() - t0
    t0 = time.time()
    desc = compute_fpfh_pruned(pts_d, nres.normals, rf, plans[1])
    fetch(desc)
    t_f = time.time() - t0
    frac = [f"{p.pair_fraction:.3f}" for p in plans]
    print(f"{tag} grid: plan {t_plan:.2f}s (host)  normals {t_n:.2f}s  "
          f"spfh+fpfh {t_f:.2f}s  total(device) {t_n + t_f:.2f}s  "
          f"pair fractions {frac} "
          f"(nblocks={plans[0].nblocks}, mpad={[p.mpad for p in plans]})",
          flush=True)
    return desc


rng = np.random.default_rng(11)
scene = np.asarray(read_ply(os.path.join(REFERENCE_DATA,
                                         "matcher-test-scene-1.ply")).points)
dst = rigid_copy(scene, rng)

for tag, pts in (("scene60k/src", scene), ("scene60k/dst", dst)):
    d_dense = time_dense(tag, pts, 0.02, 0.04) if do_dense else None
    d_grid = time_grid(tag, pts, 0.02, 0.04) if do_grid else None
    if d_dense is not None and d_grid is not None:
        err = np.abs(np.asarray(d_dense) - np.asarray(d_grid))
        print(f"{tag} dense-vs-grid: max {err.max():.2e} mean {err.mean():.2e} "
              f"frac>1e-3 {(err > 1e-3).mean():.4f}", flush=True)

if do_synth:
    pts = rng.uniform(-1, 1, (100_000, 3))
    if do_dense:
        time_dense("synth100k", pts, 0.05, 0.10)
    if do_grid:
        time_grid("synth100k", pts, 0.05, 0.10)
