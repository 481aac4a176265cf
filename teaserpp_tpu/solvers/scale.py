"""Scale stage: TLS scale estimation and the known-scale TRIM inlier selector.

Capability parity with reference registration.cc:410-443 (``TLSScaleSolver``,
``ScaleInliersSelector``). Operates on TIM *norms* rather than TIM vectors, so
the caller can use the matmul-trick norm kernel and never materialize the
O(N^2) TIM tensor when only the scale stage needs it.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from teaserpp_tpu.ops.tls import scalar_tls


class ScaleResult(NamedTuple):
    scale: jnp.ndarray  # (...,) estimated scale
    inliers: jnp.ndarray  # (..., K) bool TIM-pair inlier mask


def solve_scale_tls(
    src_norms: jnp.ndarray,
    dst_norms: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> ScaleResult:
    """TLS scale from TIM norm ratios (reference registration.cc:410-425).

    raw scales ``s_k = |dst_tim_k| / |src_tim_k]``, half-intervals
    ``alpha_k = 2 * noise_bound * sqrt(cbar2) / |src_tim_k|``.
    """
    beta = 2.0 * noise_bound * math.sqrt(cbar2)
    safe_src = jnp.where(src_norms > 0, src_norms, jnp.ones_like(src_norms))
    raw_scales = dst_norms / safe_src
    alphas = beta / safe_src
    degenerate = src_norms <= 0
    if valid is None:
        valid_mask = ~degenerate
    else:
        valid_mask = valid & ~degenerate
    est = scalar_tls(raw_scales, alphas, valid=valid_mask)
    return ScaleResult(scale=est.estimate, inliers=est.inliers)


def select_scale_inliers(
    src_norms: jnp.ndarray,
    dst_norms: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
) -> ScaleResult:
    """Known-scale (s = 1) TRIM pruning (reference registration.cc:427-443).

    Pair k is an inlier iff ``| |src_tim_k| - |dst_tim_k| | <= 2 nb sqrt(cbar2)``.
    """
    beta = 2.0 * noise_bound * math.sqrt(cbar2)
    inliers = jnp.abs(src_norms - dst_norms) <= beta
    if valid is not None:
        inliers = inliers & valid
    scale = jnp.ones(src_norms.shape[:-1], dtype=src_norms.dtype)
    return ScaleResult(scale=scale, inliers=inliers)
