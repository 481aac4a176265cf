"""Weighted Procrustes (Horn) rotation solves and geometry helpers.

Capability parity with reference utils.h:107-160 (``calculateDiameter``,
``svdRot``, ``svdRot2d``), redesigned TPU-first:

  * the 3-D solve uses the quaternion q-method (Davenport): build the 4x4
    K matrix from the correlation matrix H = X diag(w) Y^T and take its top
    eigenvector via a fixed-sweep cyclic Jacobi eigensolver. This replaces
    the reference's JacobiSVD — XLA's iterative small-matrix SVD on TPU is
    too inaccurate in f32 (observed ~1e-3 rad per solve), while Jacobi
    sweeps on a 4x4 are exact fixed work, f32-stable, fully batched, and
    return the optimal *proper* rotation by construction (no det-flip
    branch needed, cf. utils.h:131-135);
  * the 2-D solve is closed form: the optimal SO(2) angle satisfies
    (cos, sin) ∝ (H00 + H11, H01 - H10).
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobi_eigh_small(a: jnp.ndarray, sweeps: int = 10):
    """Symmetric eigendecomposition of a tiny (n<=8) matrix by cyclic Jacobi.

    Fixed ``sweeps`` full cycles of Givens rotations — quadratically
    convergent, backward stable in f32, batched over leading dims.

    Returns (eigenvalues (..., n) unsorted, eigenvectors (..., n, n) columns).
    """
    import jax

    n = a.shape[-1]
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    eps = jnp.asarray(jnp.finfo(a.dtype).tiny * 16, a.dtype)

    def one_sweep(_, carry):
        a, v = carry
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a[..., p, q]
                app = a[..., p, p]
                aqq = a[..., q, q]
                # Stable Jacobi rotation angle (Golub & Van Loan 8.4).
                small = jnp.abs(apq) <= eps
                tau = (aqq - app) / jnp.where(
                    small, jnp.ones_like(apq), 2.0 * apq
                )
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(small, jnp.zeros_like(t), t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c

                # column rotation: A <- A G
                ap_col = a[..., :, p]
                aq_col = a[..., :, q]
                a = a.at[..., :, p].set(c[..., None] * ap_col - s[..., None] * aq_col)
                a = a.at[..., :, q].set(s[..., None] * ap_col + c[..., None] * aq_col)
                # row rotation: A <- G^T A
                ap_row = a[..., p, :]
                aq_row = a[..., q, :]
                a = a.at[..., p, :].set(c[..., None] * ap_row - s[..., None] * aq_row)
                a = a.at[..., q, :].set(s[..., None] * ap_row + c[..., None] * aq_row)
                # accumulate eigenvectors: V <- V G
                vp = v[..., :, p]
                vq = v[..., :, q]
                v = v.at[..., :, p].set(c[..., None] * vp - s[..., None] * vq)
                v = v.at[..., :, q].set(s[..., None] * vp + c[..., None] * vq)
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, one_sweep, (a, v))
    eigvals = jnp.diagonal(a, axis1=-2, axis2=-1)
    return eigvals, v


def _quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    return r


def rotation_from_correlation(h: jnp.ndarray) -> jnp.ndarray:
    """Optimal proper rotation maximizing tr(R h), h = X diag(w) Y^T (..., 3, 3).

    Davenport q-method: q* is the top eigenvector of
      K = [[tr h, z^T], [z, h + h^T - tr(h) I]],
    z = [h12-h21, h20-h02, h01-h10]; R = R(q*). Degenerate h (all-zero
    weights) returns identity.
    """
    dtype = h.dtype
    sigma = jnp.trace(h, axis1=-2, axis2=-1)
    z = jnp.stack(
        [
            h[..., 1, 2] - h[..., 2, 1],
            h[..., 2, 0] - h[..., 0, 2],
            h[..., 0, 1] - h[..., 1, 0],
        ],
        axis=-1,
    )
    s_mat = h + jnp.swapaxes(h, -1, -2) - sigma[..., None, None] * jnp.eye(3, dtype=dtype)
    top = jnp.concatenate([sigma[..., None, None], z[..., None, :]], axis=-1)
    bottom = jnp.concatenate([z[..., :, None], s_mat], axis=-1)
    k = jnp.concatenate([top, bottom], axis=-2)

    # Normalize for f32 headroom; K scale is irrelevant to the eigenvector.
    norm = jnp.sqrt(jnp.sum(k * k, axis=(-2, -1), keepdims=True))
    degenerate = norm[..., 0, 0] < jnp.finfo(dtype).tiny * 1e4
    k = k / jnp.where(norm > 0, norm, jnp.ones_like(norm))

    eigvals, eigvecs = jacobi_eigh_small(k)
    idx = jnp.argmax(eigvals, axis=-1)
    q = jnp.take_along_axis(eigvecs, idx[..., None, None], axis=-1)[..., 0]
    r = _quat_to_rot(q)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), r.shape)
    return jnp.where(degenerate[..., None, None], eye, r)


def svd_rot(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-D Procrustes: rotation R minimizing sum_i w_i ||y_i - R x_i||^2.

    ``x``/``y`` are (..., 3, N), ``w`` is (..., N). Same solution as reference
    utils.h:121-136 (det-corrected SVD), computed via the quaternion q-method.
    """
    h = jnp.einsum("...in,...n,...jn->...ij", x, w, y)
    return rotation_from_correlation(h)


def svd_rot_2d(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted SO(2) Procrustes on (..., 2, N) inputs (reference utils.h:145-160).

    Closed form: R = [[c, -s], [s, c]] with (c, s) ∝ (h00 + h11, h01 - h10).
    """
    h = jnp.einsum("...in,...n,...jn->...ij", x, w, y)
    a = h[..., 0, 0] + h[..., 1, 1]
    b = h[..., 0, 1] - h[..., 1, 0]
    norm = jnp.sqrt(a * a + b * b)
    degenerate = norm < jnp.finfo(h.dtype).tiny * 1e4
    safe = jnp.where(degenerate, jnp.ones_like(norm), norm)
    c = jnp.where(degenerate, jnp.ones_like(a), a / safe)
    s = jnp.where(degenerate, jnp.zeros_like(b), b / safe)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def calculate_diameter(x: jnp.ndarray) -> jnp.ndarray:
    """Diameter proxy of a point set: 2 * max distance from the centroid.

    Matches reference utils.h:107-112 (note: this is the reference's
    definition, not the true pairwise diameter). ``x`` is (..., D, N).
    """
    cog = jnp.mean(x, axis=-1, keepdims=True)
    p = x - cog
    sq = jnp.sum(p * p, axis=-2)
    return 2.0 * jnp.sqrt(jnp.max(sq, axis=-1))
