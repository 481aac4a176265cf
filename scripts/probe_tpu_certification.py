"""DRS certification on the TPU chip (f64 emulation) at N=100.

The f32 DRS loop stalls at suboptimality ~1e2 (PERFORMANCE.md); the axon
backend does real f64 emulation (dot rel err ~2e-15, eigvalsh ~3e-11), and
the ITERATIVE shift-invert path avoids the large dense eigh entirely —
Cholesky + triangular solves + a k x k eigh per DRS iteration.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tpu_certification.py [dense]
"""
import sys
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from teaserpp_tpu.certification.drs import DRSCertifier
from teaserpp_tpu.params import DRSCertifierParams, EigSolverType
from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

print("backend:", jax.devices())

rng = np.random.default_rng(3)
n = 100
v1 = rng.standard_normal((3, n))
a = rng.standard_normal((3, 3))
r0, _ = np.linalg.qr(a)
if np.linalg.det(r0) < 0:
    r0[:, 0] *= -1
nb = 0.03
v2 = r0 @ v1 + rng.standard_normal((3, n)) * (nb / 4)
out_idx = rng.choice(n, 25, replace=False)
v2[:, out_idx] = rng.standard_normal((3, 25)) * 2
rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
r_est = np.asarray(rot.rotation)
theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)

solver = EigSolverType.DENSE if "dense" in sys.argv else EigSolverType.ITERATIVE
params = DRSCertifierParams(
    noise_bound=nb, max_iterations=200, eig_decomposition_solver=solver
)
cert = DRSCertifier(params)
t0 = time.time()
res = cert.certify(r_est, v1, v2, theta)
t1 = time.time()
print("mode:", solver, "first call (incl compile):", t1 - t0)
print("is_optimal:", res.is_optimal, "best:", res.best_suboptimality,
      "iters:", len(res.suboptimality_traj), "sat:", res.rank_saturated)
print("traj tail:", [f"{v:.3e}" for v in res.suboptimality_traj[-4:]])
t0 = time.time()
res2 = cert.certify(r_est, v1, v2, theta)
t1 = time.time()
print("warm call:", t1 - t0, "best:", res2.best_suboptimality)
