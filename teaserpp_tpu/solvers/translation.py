"""Component-wise TLS translation solve.

Capability parity with reference registration.cc:445-471
(``TLSTranslationSolver``): raw translations ``dst - src`` per correspondence,
one scalar TLS per axis with half-interval ``beta = noise_bound * sqrt(cbar2)``,
final inlier = AND over the three axes. The three per-axis estimators run as
one batched (vmapped-over-axis) scalar TLS call.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from teaserpp_tpu.ops.tls import scalar_tls_fixed_range


class TranslationResult(NamedTuple):
    translation: jnp.ndarray  # (..., 3)
    inliers: jnp.ndarray  # (..., N) bool (AND over axes)


def solve_translation_tls(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> TranslationResult:
    """TLS translation from (..., 3, N) aligned correspondences."""
    raw = dst - src  # (..., 3, N)
    beta = noise_bound * math.sqrt(cbar2)
    vmask = None if valid is None else jnp.broadcast_to(valid[..., None, :], raw.shape)
    # all rows share one half-interval (registration.cc:452) -> fixed-range
    # fast path: one multi-operand sort, no argsort gathers
    est = scalar_tls_fixed_range(raw, beta, valid=vmask)  # batches over the axis dim
    translation = est.estimate  # (..., 3)
    inliers = jnp.all(est.inliers, axis=-2)
    if valid is not None:
        inliers = inliers & valid
    return TranslationResult(translation=translation, inliers=inliers)
