"""Probe: DRS certification on the TPU chip in f64 (emulated) at N=100.

The f32 DRS loop stalls at suboptimality ~1e2 (PERFORMANCE.md); the axon
backend turns out to do real f64 emulation (dot rel err ~2e-15, eigvalsh
~3e-11), so the certifier may converge on-chip with x64 enabled.
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from teaserpp_tpu.certification.drs import DRSCertifier
from teaserpp_tpu.params import DRSCertifierParams

print("backend:", jax.devices())

rng = np.random.default_rng(0)
n = 100
v1 = rng.standard_normal((3, n))
a = rng.standard_normal((3, 3))
r0, _ = np.linalg.qr(a)
if np.linalg.det(r0) < 0:
    r0[:, 0] *= -1
nb = 0.03
v2 = r0 @ v1 + rng.standard_normal((3, n)) * (nb / 4)
n_out = 25
out_idx = rng.choice(n, n_out, replace=False)
v2[:, out_idx] = rng.standard_normal((3, n_out)) * 2
theta = np.ones(n)
theta[out_idx] = -1

# refit R on inliers (weighted Procrustes) so the estimate is near-optimal
inl = theta > 0
h = v2[:, inl] @ v1[:, inl].T
u, s, vt = np.linalg.svd(h)
d = np.sign(np.linalg.det(u @ vt))
r_est = u @ np.diag([1, 1, d]) @ vt

params = DRSCertifierParams(noise_bound=nb, max_iterations=200)
cert = DRSCertifier(params)
t0 = time.time()
res = cert.certify(r_est, v1, v2, theta)
t1 = time.time()
print("first call (incl compile):", t1 - t0)
print("is_optimal:", res.is_optimal, "best:", res.best_suboptimality,
      "iters:", len(res.suboptimality_traj))
print("traj head:", [f"{v:.3e}" for v in res.suboptimality_traj[:8]])
print("traj tail:", [f"{v:.3e}" for v in res.suboptimality_traj[-4:]])
t0 = time.time()
res2 = cert.certify(r_est, v1, v2, theta)
t1 = time.time()
print("warm call:", t1 - t0, "best:", res2.best_suboptimality)
