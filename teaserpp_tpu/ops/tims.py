"""Translation-Invariant Measurement (TIM) construction.

Capability parity with reference registration.cc:512-551 (``computeTIMs``) and
the CHAIN formulation of registration.cc:657-680, designed fixed-shape:

  * pair index maps are *static* numpy arrays computed at trace time, so the
    O(N^2) gather compiles to a single fused XLA op (the reference needed an
    OpenMP loop with arithmetic-series offsets);
  * ``compute_tim_norms`` offers a matmul-trick path (``||vi-vj||^2 =
    ||vi||^2+||vj||^2-2 vi.vj``) that rides the MXU and never materializes
    the 3xK TIM tensor — the hot path for the scale/TRIM stage at large N;
  * chain TIMs over a padded clique mask use a cyclic next-index gather.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def upper_tri_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (i, j) index arrays of the K = n(n-1)/2 upper-triangle pairs.

    Ordered row-major — identical to the reference's segment layout
    (registration.cc:531: segment for row i starts at i*n - i(i+1)/2).
    """
    i, j = np.triu_indices(n, k=1)
    return i.astype(np.int32), j.astype(np.int32)


def compute_tims(v: jnp.ndarray) -> jnp.ndarray:
    """All pairwise differences v[:, j] - v[:, i] for i < j.

    Args:
      v: (..., 3, N) points.
    Returns:
      (..., 3, K) TIMs with K = N(N-1)/2, in reference pair order.
    """
    n = v.shape[-1]
    i_idx, j_idx = upper_tri_indices(n)
    return v[..., :, j_idx] - v[..., :, i_idx]


def tim_pair_valid(valid: Optional[jnp.ndarray], n: int) -> Optional[jnp.ndarray]:
    """Pairwise validity mask for padded point sets: pair (i,j) valid iff both are."""
    if valid is None:
        return None
    i_idx, j_idx = upper_tri_indices(n)
    return valid[..., i_idx] & valid[..., j_idx]


def compute_tim_norms(v: jnp.ndarray, use_matmul: bool = False) -> jnp.ndarray:
    """Norms of all upper-triangle TIMs, (..., K).

    ``use_matmul=True`` computes the full N x N squared-distance matrix with
    one MXU contraction and gathers the upper triangle — faster at large N,
    slightly less accurate (catastrophic cancellation at tiny distances), so
    the accuracy-gated default is the direct gather-subtract path.
    """
    n = v.shape[-1]
    i_idx, j_idx = upper_tri_indices(n)
    if use_matmul:
        sq = jnp.sum(v * v, axis=-2)  # (..., N)
        gram = jnp.einsum("...dn,...dm->...nm", v, v)
        d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
        d2 = jnp.maximum(d2, 0.0)
        return jnp.sqrt(d2[..., i_idx, j_idx])
    tims = v[..., :, j_idx] - v[..., :, i_idx]
    return jnp.sqrt(jnp.sum(tims * tims, axis=-2))


def trim_pred_sq(d2s: jnp.ndarray, d2d: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Sqrt-free TRIM consistency predicate on SQUARED distances.

    ``|sqrt(a) - sqrt(b)| <= beta``  ⟺  ``a + b <= beta^2  OR
    (a - b)^2 <= beta^2 (2 (a + b) - beta^2)`` (square the rearranged
    inequality ``a + b - beta^2 <= 2 sqrt(ab)``; the first clause covers the
    region where the left side is negative). Removes the two VPU ``sqrt``s
    per pair from the O(N^2) adjacency build (reference registration.cc:427
    compares root distances directly). Exact in real arithmetic; f32
    rounding differs from the sqrt form only at threshold-boundary pairs.
    """
    b2 = beta * beta
    s = d2s + d2d
    d = d2s - d2d
    return (s <= b2) | (d * d <= b2 * (2.0 * s - b2))


def trim_adjacency_dense(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    valid: Optional[jnp.ndarray] = None,
    use_matmul: bool = False,
) -> jnp.ndarray:
    """(N, N) bool TRIM consistency adjacency, fully fused.

    adj[i, j] = | ||src_i - src_j|| - ||dst_i - dst_j|| | <= 2 nb sqrt(cbar2),
    i != j — the known-scale inlier-graph construction (reference
    registration.cc:427-443 + 609-619) with no upper-triangle gathers.

    The default path expands the squared distances as a broadcast-reduce
    (``sum_k (v_ki - v_kj)^2``): the contraction depth is only 3, so the MXU
    buys nothing, and the elementwise formulation lets XLA fuse both distance
    fields, the compare, and the diagonal mask into one N x N loop — nothing
    but the boolean mask ever reaches HBM. ``use_matmul=True`` keeps the
    Gram-matmul variant (row-shardable contraction for the multi-device
    sharded path, where the broadcast intermediate would be (3, N, N)).
    """
    import math

    beta = 2.0 * noise_bound * math.sqrt(cbar2)

    if use_matmul:

        def pdist2(v):
            sq = jnp.sum(v * v, axis=-2)
            gram = jnp.einsum("...dn,...dm->...nm", v, v)
            d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
            return jnp.maximum(d2, 0.0)

    else:

        def pdist2(v):
            # unrolled per-axis form: no reduce op anywhere, so XLA keeps the
            # whole chain (distances -> compare -> mask consumers) in ONE
            # elementwise fusion — a sum(axis) reduce would materialize each
            # N x N distance field in HBM (the N=50K OOM came from exactly
            # that: two f32 fields = 20 GB)
            x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
            dx = x[..., :, None] - x[..., None, :]
            dy = y[..., :, None] - y[..., None, :]
            dz = z[..., :, None] - z[..., None, :]
            return dx * dx + dy * dy + dz * dz

    ds = pdist2(src)
    dd = pdist2(dst)
    n = src.shape[-1]
    adj = trim_pred_sq(ds, dd, beta)
    adj = adj & ~jnp.eye(n, dtype=bool)
    if valid is not None:
        adj = adj & valid[..., None, :] & valid[..., :, None]
    return adj


def trim_adjacency_bits(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    block: int = 2048,
) -> jnp.ndarray:
    """Row-blocked TRIM adjacency, emitted directly as a row-packed bitset.

    Same predicate as :func:`trim_adjacency_dense`, but computed one
    ``block``-row stripe at a time and bit-packed on the spot, so the peak
    intermediate is O(block * N) instead of O(N^2) floats — at N=50K the
    dense path's two f32 distance fields alone are 20 GB, while this stays
    under ~1 GB. Output is (ceil(N/32), N) uint32 in the row-packed layout
    of :func:`teaserpp_tpu.clique.kcore.pack_bits_u32_rows`, consumable by
    ``core_numbers_from_bits``.
    """
    import math

    from teaserpp_tpu.clique.kcore import pack_bits_u32_rows

    beta = 2.0 * noise_bound * math.sqrt(cbar2)
    n = src.shape[-1]
    block = max(32, min(block, _round_up_multiple(n, 32)))
    block = _round_up_multiple(block, 32)
    n_rows = _round_up_multiple(n, block)
    col_idx = jnp.arange(n, dtype=jnp.int32)

    src_p = jnp.pad(src.astype(jnp.float32), ((0, 0), (0, n_rows - n)))
    dst_p = jnp.pad(dst.astype(jnp.float32), ((0, 0), (0, n_rows - n)))

    def one_block(i0):
        zero = jnp.zeros((), i0.dtype)
        rows_s = jax.lax.dynamic_slice(src_p, (zero, i0), (3, block))  # (3, B)
        rows_d = jax.lax.dynamic_slice(dst_p, (zero, i0), (3, block))

        def pd2(rows, full):
            # per-axis elementwise (no reduce) so the stripe fuses end to end
            dx = rows[0, :, None] - full[0, None, :]
            dy = rows[1, :, None] - full[1, None, :]
            dz = rows[2, :, None] - full[2, None, :]
            return dx * dx + dy * dy + dz * dz

        ds = pd2(rows_s, src.astype(jnp.float32))
        dd = pd2(rows_d, dst.astype(jnp.float32))
        row_idx = i0 + jnp.arange(block, dtype=jnp.int32)
        blk = trim_pred_sq(ds, dd, beta)
        blk = blk & (row_idx[:, None] != col_idx[None, :])
        blk = blk & (row_idx[:, None] < n)
        return pack_bits_u32_rows(blk)  # (B/32, N)

    starts = jnp.arange(0, n_rows, block, dtype=jnp.int32)
    bits = jax.lax.map(one_block, starts)  # (nb, B/32, N)
    w = (n + 31) // 32
    return bits.reshape(n_rows // 32, n)[:w]


def _round_up_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def chain_tims(
    v: jnp.ndarray, clique_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cyclic chain TIMs over the selected (clique) points, fixed shape.

    The reference builds TIMs between consecutive clique members with
    wrap-around (registration.cc:657-680: leaf = next member, root = current,
    tim = v[leaf] - v[root]). Here the clique is a boolean mask over all N
    points; for each selected index the "next" selected index (cyclically) is
    found with a vectorized doubling trick, producing N fixed-shape TIMs of
    which only the selected rows are valid — unselected rows emit zero
    vectors, which are inert in the downstream weighted Procrustes solve.

    Args:
      v: (3, N) points.
      clique_mask: (N,) bool.
    Returns:
      (tims (3, N), tim_valid (N,) bool).
    """
    n = clique_mask.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.asarray(2 * n, jnp.int32)
    # next_sel[i] = smallest selected j > i, cyclically. A reverse cumulative
    # min of "own index if selected" gives the strictly-after successor in one
    # scan; the cyclic wrap falls back to the first selected index overall.
    # (One scan + one gather — random-access pointer-chasing is the expensive
    # pattern on the VPU, a log-depth scan of contiguous lanes is not.)
    cand = jnp.where(clique_mask, idx, big)
    suffix_min = jax.lax.cummin(cand, axis=cand.ndim - 1, reverse=True)  # min(cand[i:])
    after = jnp.concatenate([suffix_min[1:], big[None]], axis=-1)  # min(cand[i+1:])
    first_sel = suffix_min[0]
    any_sel = first_sel < big
    nxt = jnp.where(after < big, after, first_sel)
    nxt = jnp.where(nxt < big, nxt, 0).astype(jnp.int32)
    tims = v[..., :, nxt] - v
    valid = clique_mask & any_sel
    tims = jnp.where(valid[None, :], tims, jnp.zeros_like(tims))
    return tims, valid
