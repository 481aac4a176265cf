"""Weighted Procrustes (Horn) rotation solves and geometry helpers.

Capability parity with reference utils.h:107-160 (``calculateDiameter``,
``svdRot``, ``svdRot2d``), redesigned for XLA: the 3x3/2x2 correlation matrix
is built with a single MXU-friendly contraction and the SVD runs batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def _svd_rot_from_h(h: jnp.ndarray) -> jnp.ndarray:
    """R = V * diag(1,..,1,det-fix) * U^T from H = X W Y^T.

    Det flip mirrors reference utils.h:131-135: if det(U)*det(V) < 0, negate
    the last column of V (guaranteeing det(R) = +1). Batched over leading dims.
    """
    u, _, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    d = jnp.linalg.det(u) * jnp.linalg.det(v)
    flip = jnp.where(d < 0, -1.0, 1.0).astype(h.dtype)
    v = v.at[..., :, -1].multiply(flip[..., None])
    return v @ jnp.swapaxes(u, -1, -2)


def svd_rot(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-D Procrustes: rotation R minimizing sum_i w_i ||y_i - R x_i||^2.

    ``x``/``y`` are (..., 3, N), ``w`` is (..., N). Matches reference
    utils.h:121-136 (H = X diag(w) Y^T, SVD, det-corrected R = V U^T).
    """
    h = jnp.einsum("...in,...n,...jn->...ij", x, w, y)
    return _svd_rot_from_h(h)


def svd_rot_2d(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted SO(2) Procrustes on (..., 2, N) inputs (reference utils.h:145-160)."""
    h = jnp.einsum("...in,...n,...jn->...ij", x, w, y)
    return _svd_rot_from_h(h)


def calculate_diameter(x: jnp.ndarray) -> jnp.ndarray:
    """Diameter proxy of a point set: 2 * max distance from the centroid.

    Matches reference utils.h:107-112 (note: this is the reference's
    definition, not the true pairwise diameter). ``x`` is (..., D, N).
    """
    cog = jnp.mean(x, axis=-1, keepdims=True)
    p = x - cog
    sq = jnp.sum(p * p, axis=-2)
    return 2.0 * jnp.sqrt(jnp.max(sq, axis=-1))
