"""Point-to-point ICP refinement, fully on device.

The reference's example workflow refines the TEASER global solution with an
ICP local solve (examples/teaser_python_fpfh_icp/example.py:67-72, via
open3d ``registration_icp`` with ``TransformationEstimationPointToPoint``).
This is the TPU-native equivalent: a jittable fixed-shape ICP whose
correspondence search is an MXU-tiled distance argmin and whose inner solve
is the batched weighted Procrustes — it vmaps over batches of refinements
and composes with :func:`register_pair` outputs.

Clouds may have different sizes; padded points are masked. Matches farther
than ``max_correspondence_distance`` carry zero weight (open3d semantics).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from teaserpp_tpu.ops.procrustes import svd_rot


class ICPResult(NamedTuple):
    rotation: jnp.ndarray  # (3, 3) refined rotation
    translation: jnp.ndarray  # (3,) refined translation
    rmse: jnp.ndarray  # () inlier RMSE at termination
    fitness: jnp.ndarray  # () matched fraction of valid source points
    iterations: jnp.ndarray  # () int


def _nearest_dst(src_t: jnp.ndarray, dst: jnp.ndarray, dst_valid) -> tuple:
    """Nearest dst index + squared distance per transformed source point.

    (3, M) x (3, N) -> argmin over N of the squared distance, computed with
    the Gram trick so the (M, N) score matrix is one MXU contraction.
    """
    sq_s = jnp.sum(src_t * src_t, axis=0)  # (M,)
    sq_d = jnp.sum(dst * dst, axis=0)  # (N,)
    cross = src_t.T @ dst  # (M, N) MXU
    d2 = sq_s[:, None] + sq_d[None, :] - 2.0 * cross
    if dst_valid is not None:
        d2 = jnp.where(dst_valid[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
    return idx, jnp.maximum(best, 0.0)


def icp_point_to_point(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    max_correspondence_distance: float,
    r_init: Optional[jnp.ndarray] = None,
    t_init: Optional[jnp.ndarray] = None,
    max_iterations: int = 30,
    relative_rmse: float = 1e-6,
    src_valid: Optional[jnp.ndarray] = None,
    dst_valid: Optional[jnp.ndarray] = None,
) -> ICPResult:
    """Refine an SE(3) estimate by point-to-point ICP.

    Args:
      src: (3, M) source cloud (pre-transform).
      dst: (3, N) target cloud.
      max_correspondence_distance: matches beyond this are discarded.
      r_init, t_init: initial transform (defaults: identity / zero).
      max_iterations: fixed iteration ceiling (static for jit).
      relative_rmse: early-termination threshold on |Δrmse| / rmse.
      src_valid / dst_valid: padding masks.

    Returns:
      ICPResult with the refined (R, t), open3d-style rmse and fitness.
    """
    dtype = src.dtype
    m = src.shape[-1]
    r0 = jnp.eye(3, dtype=dtype) if r_init is None else jnp.asarray(r_init, dtype)
    t0 = jnp.zeros((3,), dtype) if t_init is None else jnp.asarray(t_init, dtype)
    sv = (
        jnp.ones((m,), dtype)
        if src_valid is None
        else jnp.asarray(src_valid).astype(dtype)
    )
    max_d2 = jnp.asarray(max_correspondence_distance, dtype) ** 2

    def cond(state):
        i, r, t, rmse_prev, rmse, fit, done = state
        del r, t, rmse_prev, rmse, fit
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(state):
        i, r, t, rmse_prev, rmse_old, fit_old, done = state
        del rmse_old, fit_old
        src_t = r @ src + t[:, None]
        idx, d2 = _nearest_dst(src_t, dst, dst_valid)
        w = sv * (d2 <= max_d2)
        matched = jnp.take(dst, idx, axis=1)  # (3, M)
        nw = jnp.maximum(jnp.sum(w), 1e-12)
        rmse = jnp.sqrt(jnp.sum(w * d2) / nw)
        fitness = nw / jnp.maximum(jnp.sum(sv), 1e-12)

        # weighted point-to-point update: center both sides (svd_rot solves
        # the translation-free Procrustes, reference utils.h:121), then align
        cog_s = jnp.sum(src * w, axis=1) / nw
        cog_m = jnp.sum(matched * w, axis=1) / nw
        r_new = svd_rot(src - cog_s[:, None], matched - cog_m[:, None], w)
        t_new = cog_m - r_new @ cog_s

        rel = jnp.abs(rmse_prev - rmse) / jnp.maximum(rmse, 1e-12)
        done = jnp.logical_and(i > 0, rel < relative_rmse)
        return (i + 1, r_new, t_new, rmse, rmse, fitness, done)

    inf = jnp.asarray(jnp.inf, dtype)
    state0 = (jnp.asarray(0, jnp.int32), r0, t0, inf, inf, jnp.zeros((), dtype),
              jnp.asarray(False))
    i, r, t, _, rmse, fitness, _ = jax.lax.while_loop(cond, body, state0)
    return ICPResult(rotation=r, translation=t, rmse=rmse, fitness=fitness,
                     iterations=i)
