"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the driver validates real-TPU and
multi-chip paths separately) with x64 enabled so golden-value comparisons
against the reference's double-precision results hold at tight tolerances.

Note: this machine's sitecustomize imports jax and registers the tunneled
TPU ("axon") backend at interpreter startup, so env vars alone are too late —
the platform must be forced through jax.config before any backend is
initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_state():
    """Clear JAX's compiled-executable caches after every test module.

    The full suite performs ~200 fresh XLA:CPU compiles in one process; with
    every compiled executable kept alive by the jit caches, late-suite
    compiles of the heaviest graph (the GNC while_loop) die inside
    ``backend_compile_and_load`` with SIGSEGV/SIGABRT at ~85-93% of the run
    (three reproductions r3-r4; same site each time, different tests).
    System memory is NOT the cause (RSS ~5 GB of 128 GB, Committed_AS 15/66
    GB at crash) — the state that kills the compiler is in-process
    (LLVM/ORC-JIT executable state). Dropping executables between modules
    bounds that state; see known-issues.md for the full investigation.
    """
    yield
    jax.clear_caches()
    gc.collect()

REFERENCE_DATA = "/root/reference/test/teaser/data"
REFERENCE_EXAMPLE_DATA = "/root/reference/examples/example_data"


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def random_rotation(rng) -> np.ndarray:
    """Uniform random rotation via QR of a Gaussian matrix."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def make_registration_problem(
    rng,
    n: int = 100,
    outlier_ratio: float = 0.0,
    noise: float = 0.0,
    scale: float = 1.0,
    translation_scale: float = 1.0,
    outlier_magnitude: float = 5.0,
):
    """Synthetic correspondence set: dst = s R src + t, with injected outliers.

    Returns (src, dst, s, R, t, inlier_mask).
    """
    src = rng.uniform(-1.0, 1.0, size=(3, n))
    r = random_rotation(rng)
    t = rng.uniform(-translation_scale, translation_scale, size=3)
    dst = scale * (r @ src) + t[:, None]
    if noise > 0:
        dst = dst + rng.normal(scale=noise, size=dst.shape)
    n_out = int(round(outlier_ratio * n))
    inlier_mask = np.ones(n, bool)
    if n_out:
        idx = rng.choice(n, size=n_out, replace=False)
        inlier_mask[idx] = False
        dst[:, idx] = rng.uniform(
            -outlier_magnitude, outlier_magnitude, size=(3, n_out)
        )
    return src, dst, scale, r, t, inlier_mask
