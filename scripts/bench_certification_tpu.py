"""TPU certification benchmarks: batched N=100 throughput and N=1000 scaling.

VERDICT r1 done-gates:
  #1: synthetic N=100 certification reaching sub_optimality < 1e-3 on the
      TPU backend (+ a certify_batch TPU throughput row).
  #2: certify N=1000 TIMs in reasonable time via the ITERATIVE
      (shift-invert) path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_certification_tpu.py [n1000]
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
from teaserpp_tpu.certification.drs import DRSCertifier, certify_batch
from teaserpp_tpu.params import DRSCertifierParams, EigSolverType
from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

print("backend:", jax.devices(), flush=True)


def make_problem(rng, n, nb=0.03, outlier_frac=0.25):
    v1 = rng.standard_normal((3, n))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    v2 = q @ v1 + rng.standard_normal((3, n)) * (nb / 4)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    v2[:, out_idx] = rng.standard_normal((3, n_out)) * 2
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    return np.asarray(rot.rotation), v1, v2, theta


rng = np.random.default_rng(7)
nb = 0.03

if "n1000" in sys.argv:
    n = 1000
    rank = next((int(a.split("=")[1]) for a in sys.argv if a.startswith("rank=")), 256)
    r, v1, v2, theta = make_problem(rng, n, nb)
    params = DRSCertifierParams(
        noise_bound=nb, max_iterations=200,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=rank,
    )
    print(f"N=1000 rank={rank}", flush=True)
    cert = DRSCertifier(params)
    t0 = time.time()
    res = cert.certify(r, v1, v2, theta)
    t1 = time.time()
    print(f"N=1000 first call (incl compile): {t1 - t0:.1f}s", flush=True)
    print(f"N=1000: optimal={res.is_optimal} best={res.best_suboptimality:.3e} "
          f"iters={len(res.suboptimality_traj)} sat={res.rank_saturated}", flush=True)
    t0 = time.time()
    res2 = cert.certify(r, v1, v2, theta)
    t1 = time.time()
    print(f"N=1000 warm: {t1 - t0:.1f}s best={res2.best_suboptimality:.3e}", flush=True)
    sys.exit(0)

# batched N=100 throughput. certify_batch auto-chunks to vmap width 4 on
# the axon backend (width-8 f64-emulated programs crash the TPU worker —
# see certify_batch docstring), so batch 8 = 2 executions of one program.
batch = 8
n = 100
probs = [make_problem(rng, n, nb) for _ in range(batch)]
rots = np.stack([p[0] for p in probs])
v1s = np.stack([p[1] for p in probs])
v2s = np.stack([p[2] for p in probs])
thetas = np.stack([p[3] for p in probs])
params = DRSCertifierParams(
    noise_bound=nb, max_iterations=200,
    eig_decomposition_solver=EigSolverType.ITERATIVE,
)
t0 = time.time()
results = certify_batch(rots, v1s, v2s, thetas, params)
t1 = time.time()
print(f"certify_batch[{batch}] first (incl compile): {t1 - t0:.1f}s", flush=True)
t0 = time.time()
results = certify_batch(rots, v1s, v2s, thetas, params)
t1 = time.time()
n_opt = sum(r.is_optimal for r in results)
worst = max(r.best_suboptimality for r in results)
print(f"certify_batch[{batch}] warm: {t1 - t0:.1f}s "
      f"({batch / (t1 - t0):.2f} certs/s/chip), optimal {n_opt}/{batch}, "
      f"worst best_suboptimality {worst:.3e}", flush=True)
