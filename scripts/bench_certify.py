"""Batched DRS certification throughput on the TPU chip.

B certifications of GNC rotation solutions (synthetic known-rotation
problems, ~20% outliers) in one device program. The per-iteration hot op is
the (4N+4)^2 eigh PSD projection, batched over B.

    python scripts/bench_certify.py [B] [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from teaserpp_tpu.certification import DRSCertifierParams
    from teaserpp_tpu.certification.drs import certify_batch

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    nb = 0.01

    rng = np.random.default_rng(0)
    rots, srcs, dsts, thetas = [], [], [], []
    for i in range(b):
        q, r_ = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(r_))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        src = rng.uniform(-1, 1, size=(3, n))
        dst = q @ src
        dst += rng.uniform(-nb / 2, nb / 2, size=dst.shape)
        theta = np.ones(n)
        n_out = n // 5
        out = rng.choice(n, size=n_out, replace=False)
        dst[:, out] = rng.uniform(-2, 2, size=(3, n_out))
        theta[out] = -1
        rots.append(q)
        srcs.append(src)
        dsts.append(dst)
        thetas.append(theta)

    params = DRSCertifierParams(noise_bound=nb, max_iterations=100)

    t0 = time.perf_counter()
    res = certify_batch(
        np.stack(rots), np.stack(srcs), np.stack(dsts), np.stack(thetas), params
    )
    t_cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = certify_batch(
        np.stack(rots), np.stack(srcs), np.stack(dsts), np.stack(thetas), params
    )
    t_warm = time.perf_counter() - t0

    opt = sum(r.is_optimal for r in res)
    gaps = [r.best_suboptimality for r in res]
    print(f"B={b} N={n} dtype={'f64' if jax.config.jax_enable_x64 else 'f32'}")
    print(f"cold {t_cold:.2f}s, warm {t_warm:.2f}s = {b / t_warm:.1f} certs/s")
    print(f"is_optimal: {opt}/{b}, median gap {np.median(gaps):.2e}, "
          f"max gap {np.max(gaps):.2e}")


if __name__ == "__main__":
    main()
