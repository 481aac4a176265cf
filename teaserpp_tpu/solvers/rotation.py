"""GNC rotation solvers: GNC-TLS, Fast Global Registration, and Quatro.

Capability parity with reference registration.cc:764-866 (GNC-TLS), 206-278
(FGR), 280-408 (Quatro SO(2)). TPU-first structure: each solver is a single
``lax.while_loop`` whose carry holds (R, weights, mu, costs, convergence
flag) — fixed iteration ceiling, convergence expressed as a flag rather than
a break, so the loop jits, vmaps over problem batches, and runs entirely
on-device. The inner Horn solve is the batched weighted-Procrustes SVD.

All solvers accept an optional validity mask for padded fixed-shape inputs;
invalid columns carry zero weight throughout and zero-vector TIMs are inert
in every accumulation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from teaserpp_tpu.ops.procrustes import svd_rot, svd_rot_2d, calculate_diameter


class RotationResult(NamedTuple):
    rotation: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    cost: jnp.ndarray  # scalar cost at termination
    iterations: jnp.ndarray  # scalar int


def _colnorm_sq(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-2)


def _gnc_tls_weight_update(residuals_sq, weights, mu, noise_bound_sq, valid_f):
    """Closed-form TLS weight update (reference registration.cc:827-844).

    cost uses the *previous* weights; new weights are 0 / 1 / interpolated by
    the residual against thresholds th1 = (mu+1)/mu * nb^2, th2 = mu/(mu+1) * nb^2.
    """
    th1 = (mu + 1.0) / mu * noise_bound_sq
    th2 = mu / (mu + 1.0) * noise_bound_sq
    cost = jnp.sum(weights * residuals_sq, axis=-1)
    safe_r = jnp.maximum(residuals_sq, 1e-30)
    interp = jnp.sqrt(noise_bound_sq * mu * (mu + 1.0) / safe_r) - mu
    new_w = jnp.where(
        residuals_sq >= th1,
        jnp.zeros_like(weights),
        jnp.where(residuals_sq <= th2, jnp.ones_like(weights), interp),
    )
    return cost, new_w * valid_f


def _solve_gnc_tls(
    src2d_or_3d: jnp.ndarray,
    dst2d_or_3d: jnp.ndarray,
    noise_bound: float,
    gnc_factor: float,
    max_iterations: int,
    cost_threshold: float,
    valid: Optional[jnp.ndarray],
    procrustes,
):
    """Shared GNC-TLS loop for the 3-D (GNC_TLS) and 2-D (Quatro) solvers."""
    src = src2d_or_3d
    dst = dst2d_or_3d
    dtype = src.dtype
    d, n = src.shape[-2], src.shape[-1]
    del d
    valid_f = (
        jnp.ones((n,), dtype) if valid is None else jnp.asarray(valid).astype(dtype)
    )

    # noise_bound may be a traced scalar (it depends on the estimated scale in
    # the full pipeline). Degenerate fallback per reference registration.cc:794-796.
    noise_bound_sq = jnp.asarray(noise_bound, dtype) ** 2
    noise_bound_sq = jnp.where(
        noise_bound_sq < 1e-16, jnp.asarray(1e-2, dtype), noise_bound_sq
    )

    inf = jnp.asarray(jnp.inf, dtype)

    def cond(state):
        i, r, w, mu, prev_cost, cost, done = state
        del r, w, mu, prev_cost, cost
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, r, weights, mu, prev_cost, cost, done = state
        del r, cost
        r = procrustes(src, dst, weights)
        residuals_sq = _colnorm_sq(dst - r @ src) * valid_f

        # mu initialization on the first iteration (reference
        # registration.cc:814-825); mu <= 0 means residuals are already tiny.
        max_residual = jnp.max(residuals_sq, axis=-1)
        mu0 = 1.0 / (2.0 * max_residual / noise_bound_sq - 1.0)
        is_first = i == 0
        mu = jnp.where(is_first, mu0, mu)
        degenerate = jnp.logical_and(is_first, mu <= 0)

        new_cost, new_w = _gnc_tls_weight_update(
            residuals_sq, weights, mu, noise_bound_sq, valid_f
        )
        # On the degenerate break the reference keeps the all-ones weights.
        new_w = jnp.where(degenerate, weights, new_w)
        new_cost = jnp.where(degenerate, prev_cost, new_cost)

        cost_diff = jnp.abs(new_cost - prev_cost)
        converged = cost_diff < cost_threshold
        done = jnp.logical_or(degenerate, converged)

        mu = jnp.where(degenerate, mu, mu * gnc_factor)
        return (i + 1, r, new_w, mu, new_cost, new_cost, done)

    r0 = jnp.eye(src.shape[-2], dtype=dtype)
    state0 = (
        jnp.asarray(0, jnp.int32),
        r0,
        valid_f,
        jnp.asarray(1.0, dtype),
        inf,
        inf,
        jnp.asarray(False),
    )
    i, r, weights, mu, prev_cost, cost, done = jax.lax.while_loop(cond, body, state0)
    del mu, prev_cost, done
    return r, weights, cost, i


def solve_rotation_gnc_tls(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    gnc_factor: float = 1.4,
    max_iterations: int = 100,
    cost_threshold: float = 1e-6,
    valid: Optional[jnp.ndarray] = None,
) -> RotationResult:
    """GNC-TLS rotation solve on (3, N) TIMs (reference registration.cc:764-866)."""
    r, weights, cost, i = _solve_gnc_tls(
        src, dst, noise_bound, gnc_factor, max_iterations, cost_threshold, valid,
        svd_rot,
    )
    inliers = weights >= 0.5  # reference registration.cc:861-865
    if valid is not None:
        inliers = inliers & valid
    return RotationResult(rotation=r, inliers=inliers, cost=cost, iterations=i)


def solve_rotation_quatro(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    gnc_factor: float = 1.4,
    max_iterations: int = 100,
    cost_threshold: float = 1e-6,
    valid: Optional[jnp.ndarray] = None,
) -> RotationResult:
    """Quatro degeneracy-robust SO(2) solve (reference registration.cc:280-408).

    Runs the GNC-TLS loop on the XY projection with a 2x2 Procrustes inner
    solve, embeds the SO(2) estimate into a 3x3 identity, and uses the 0.4
    inlier weight threshold of the reference (registration.cc:398-402).
    """
    r2, weights, cost, i = _solve_gnc_tls(
        src[..., :2, :], dst[..., :2, :], noise_bound, gnc_factor, max_iterations,
        cost_threshold, valid, svd_rot_2d,
    )
    r = jnp.eye(3, dtype=src.dtype).at[:2, :2].set(r2)
    inliers = weights >= 0.4
    if valid is not None:
        inliers = inliers & valid
    return RotationResult(rotation=r, inliers=inliers, cost=cost, iterations=i)


def solve_rotation_fgr(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    gnc_factor: float = 1.4,
    max_iterations: int = 100,
    cost_threshold: float = 1e-6,
    valid: Optional[jnp.ndarray] = None,
) -> RotationResult:
    """Fast-Global-Registration rotation solve (reference registration.cc:206-278).

    Geman-McClure line-process weights with annealed mu: mu starts from the
    squared cloud diameter over nb^4 and is *divided* by gnc_factor each
    iteration; terminates when cost < threshold or mu < 1.
    """
    dtype = src.dtype
    n = src.shape[-1]
    valid_f = (
        jnp.ones((n,), dtype) if valid is None else jnp.asarray(valid).astype(dtype)
    )
    noise_bound_sq = jnp.asarray(noise_bound, dtype) ** 2

    # Initial mu from the larger cloud diameter (reference registration.cc:224-228).
    # With a validity mask, the diameter is computed over valid columns only.
    if valid is None:
        src_diam = calculate_diameter(src)
        dst_diam = calculate_diameter(dst)
    else:
        cnt = jnp.maximum(jnp.sum(valid_f), 1.0)

        def masked_diam(x):
            cog = jnp.sum(x * valid_f, axis=-1, keepdims=True) / cnt
            sq = jnp.sum((x - cog) ** 2, axis=-2)
            sq = jnp.where(valid_f > 0, sq, jnp.zeros_like(sq))
            return 2.0 * jnp.sqrt(jnp.max(sq, axis=-1))

        src_diam = masked_diam(src)
        dst_diam = masked_diam(dst)
    global_scale = jnp.maximum(src_diam, dst_diam) / noise_bound_sq
    mu_init = (global_scale * global_scale) / noise_bound_sq

    def cond(state):
        i, r, l_pq, mu, cost, done = state
        del r, l_pq, mu, cost
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, r, l_pq, mu, cost, done = state
        del l_pq, cost
        scaled_mu = mu * noise_bound_sq
        # 1. line-process weights from the current rotation
        rsq = _colnorm_sq(dst - r @ src)
        l_pq = (scaled_mu / (scaled_mu + rsq)) ** 2 * valid_f
        # 2. weighted Procrustes
        r = svd_rot(src, dst, l_pq)
        # cost: sum of scaled Geman-McClure residuals (reference :257-260)
        diff = _colnorm_sq(dst - r @ src) * valid_f
        cost = jnp.sum(scaled_mu * diff / (scaled_mu + diff), axis=-1)
        done = jnp.logical_or(cost < cost_threshold, mu < 1.0)
        mu = jnp.where(done, mu, mu / gnc_factor)
        return (i + 1, r, l_pq, mu, cost, done)

    state0 = (
        jnp.asarray(0, jnp.int32),
        jnp.eye(3, dtype=dtype),
        valid_f,
        mu_init.astype(dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(False),
    )
    i, r, l_pq, mu, cost, done = jax.lax.while_loop(cond, body, state0)
    del mu, done
    inliers = l_pq > 0  # reference casts the weights to bool (:275-277)
    if valid is not None:
        inliers = inliers & valid
    return RotationResult(rotation=r, inliers=inliers, cost=cost, iterations=i)
