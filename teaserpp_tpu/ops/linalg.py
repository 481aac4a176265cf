"""Small linear-algebra helpers (capability parity with reference linalg.h).

All functions are pure jnp, jit/vmap-friendly, and dtype-polymorphic.
"""

from __future__ import annotations

import jax.numpy as jnp


def hatmap(u: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric hat map of a 3-vector (reference linalg.h:24-32).

    hatmap(u) @ v == cross(u, v).
    """
    u = jnp.asarray(u).reshape(3)
    zero = jnp.zeros((), dtype=u.dtype)
    return jnp.stack(
        [
            jnp.stack([zero, -u[2], u[1]]),
            jnp.stack([u[2], zero, -u[0]]),
            jnp.stack([-u[1], u[0], zero]),
        ]
    )


def vector_kron(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product of two vectors (reference linalg.h:44-72).

    Returns a vector of length ``len(v1) * len(v2)`` with entries
    ``out[i * len(v2) + j] = v1[i] * v2[j]`` — a plain outer product reshape,
    which XLA fuses; the reference needed an OpenMP collapse(2) loop.
    """
    v1 = jnp.asarray(v1).reshape(-1)
    v2 = jnp.asarray(v2).reshape(-1)
    return jnp.outer(v1, v2).reshape(-1)


def get_nearest_psd(a: jnp.ndarray) -> jnp.ndarray:
    """Nearest (Frobenius) positive-semidefinite matrix (reference linalg.h:85-99).

    Symmetrizes ``a``, eigendecomposes, clamps negative eigenvalues to zero.
    Batched: accepts (..., n, n).
    """
    a = jnp.asarray(a)
    b = (a + jnp.swapaxes(a, -1, -2)) / 2
    w, v = jnp.linalg.eigh(b)
    w = jnp.where(w < 0, jnp.zeros_like(w), w)
    return jnp.einsum("...ik,...k,...jk->...ij", v, w, v)
