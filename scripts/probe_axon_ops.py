"""Minimal-repro probe for the axon TPU worker crash (VERDICT r2 #2).

Runs ONE isolated f64(-emulated) linalg op on the chip and prints a checksum;
a worker crash shows up as a JaxRuntimeError in THIS process only. Drive it
with scripts/probe_axon_crash_sweep.sh, which sweeps op x size x vmap width
in separate processes so one crash cannot poison the next probe.

Usage: python scripts/probe_axon_ops.py <op> <n> <width>
  op:    cholesky | eigh | qr | solve  -> n = matrix dim, width = vmap width
  certify:   n = correspondence count, width = psd_projection_rank
             (runs the real ITERATIVE DRS core, max_iterations=3)
  lobpcg:    n = matrix dim (the _lam_min_init seed eigensolve alone)
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

op, n, width = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

rng = np.random.default_rng(0)


def make_spd(k):
    a = rng.standard_normal((k, k))
    return a @ a.T + k * np.eye(k)


if op == "cholesky":
    fn = jnp.linalg.cholesky
    x = make_spd(n)
elif op == "eigh":
    fn = lambda a: jnp.linalg.eigh(a)[0]
    x = make_spd(n)
elif op == "qr":
    fn = lambda a: jnp.linalg.qr(a)[0]
    x = rng.standard_normal((n, max(n // 16, 8)))
elif op == "solve":
    # cho_solve shape as used by the shift-invert core
    from jax.scipy.linalg import cho_solve

    c = np.linalg.cholesky(make_spd(n))
    v = rng.standard_normal((n, max(n // 16, 8)))
    fn = lambda args: cho_solve((args[0], True), args[1])
    x = (c, v)
elif op == "lobpcg":
    from jax.experimental.sparse.linalg import lobpcg_standard

    a = make_spd(n)

    def fn(m):
        x0 = jnp.ones((m.shape[-1], 4), m.dtype) / np.sqrt(m.shape[-1])
        theta, _, _ = lobpcg_standard(m, x0, m=64)
        return theta

    x = a
elif op == "certify":
    # the real ITERATIVE DRS core, 3 iterations, rank = <width>
    from teaserpp_tpu.certification.drs import _certify_dispatch
    from teaserpp_tpu.params import DRSCertifierParams, EigSolverType
    from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

    nb = 0.03
    v1 = rng.standard_normal((3, n))
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    v2 = q @ v1 + rng.standard_normal((3, n)) * (nb / 4)
    rot = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb)
    theta = np.where(np.asarray(rot.inliers), 1.0, -1.0)
    params = DRSCertifierParams(
        noise_bound=nb, max_iterations=3,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        psd_projection_rank=width,
    )
    r = jnp.asarray(np.asarray(rot.rotation), jnp.float64)
    best, traj, it, sat = _certify_dispatch(
        r, jnp.asarray(v1, jnp.float64), jnp.asarray(v2, jnp.float64),
        jnp.asarray(theta, jnp.float64), params,
    )
    s = float(np.asarray(best))
    print(f"OK op=certify n={n} rank={width} best_after_3it={s:.3e}", flush=True)
    sys.exit(0)
else:
    raise SystemExit(f"unknown op {op}")

if width > 1:
    if isinstance(x, tuple):
        x = tuple(np.repeat(a[None], width, axis=0) for a in x)
    else:
        x = np.repeat(x[None], width, axis=0)
    fn = jax.vmap(fn)

jfn = jax.jit(fn)
x = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), x)
t0 = time.time()
out = jfn(x)
s = float(np.asarray(jnp.sum(jnp.abs(out))))  # honest fetch through the relay
t1 = time.time()
print(f"OK op={op} n={n} width={width} checksum={s:.6e} "
      f"first_call={t1 - t0:.1f}s", flush=True)
t0 = time.time()
out = jfn(x)
s = float(np.asarray(jnp.sum(jnp.abs(out))))
t1 = time.time()
print(f"OK warm {t1 - t0:.2f}s", flush=True)
