"""Bisect the TPU worker crash in batched ITERATIVE certification.

Each case runs in its own subprocess (a worker crash kills the process, not
the sweep). Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_cert_batch_crash.py
"""
import subprocess
import sys

CASE = """
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from teaserpp_tpu.certification.drs import DRSCertifier, certify_batch
from teaserpp_tpu.params import DRSCertifierParams, EigSolverType
from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

mode, batch = {mode!r}, {batch}
nb = 0.03
rng = np.random.default_rng(7)
def make(n):
    v1 = rng.standard_normal((3, n))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0: q[:, 0] *= -1
    v2 = q @ v1 + rng.standard_normal((3, n)) * (nb / 4)
    out = rng.choice(n, n // 4, replace=False)
    v2[:, out] = rng.standard_normal((3, len(out))) * 2
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    th = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    return np.asarray(rot.rotation), v1, v2, th

params = DRSCertifierParams(noise_bound=nb, max_iterations=100,
                            eig_decomposition_solver=EigSolverType[mode])
probs = [make(100) for _ in range(max(batch, 1))]
if batch == 0:
    res = DRSCertifier(params).certify(*probs[0])
    print("single", mode, res.is_optimal, res.best_suboptimality)
else:
    rs = certify_batch(np.stack([p[0] for p in probs]), np.stack([p[1] for p in probs]),
                       np.stack([p[2] for p in probs]), np.stack([p[3] for p in probs]), params)
    print("batch", batch, mode, [r.is_optimal for r in rs],
          max(r.best_suboptimality for r in rs))
"""

for mode, batch in (("ITERATIVE", 0), ("ITERATIVE", 2), ("DENSE", 2)):
    print(f"--- mode={mode} batch={batch}", flush=True)
    p = subprocess.run(
        [sys.executable, "-c", CASE.format(mode=mode, batch=batch)],
        capture_output=True, text=True, timeout=2400,
    )
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-3:])
    print(f"rc={p.returncode}\n{tail}", flush=True)
