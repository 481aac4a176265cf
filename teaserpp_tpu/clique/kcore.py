"""K-core decomposition on a dense adjacency matrix, fully on device.

Replaces the reference's use of PMC's ``compute_cores`` (graph.cc:58-59) and
the KCORE_HEU inlier heuristic (graph.cc:66-81). The classic sequential
min-degree peeling becomes *batch peeling*: every round removes ALL active
vertices whose active-degree is <= the current core level k, recomputing
degrees with one MXU matvec per round. Batch removal yields identical core
numbers to one-at-a-time peeling and converges in a number of rounds equal
to the number of distinct peel waves (typically tens, never more than N).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def pack_bits_u32(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a (..., N) bool mask into (..., ceil(N/32)) uint32 words.

    Bit j of word w holds element w*32+j. N is padded up with zeros.
    """
    n = mask.shape[-1]
    w = (n + 31) // 32
    pad = w * 32 - n
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros(mask.shape[:-1] + (pad,), mask.dtype)], axis=-1
        )
    bits = mask.astype(jnp.uint32).reshape(*mask.shape[:-1], w, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def pack_bits_u32_rows(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a (..., N, M) bool matrix over its ROW axis into (..., W, M) words.

    Bit b of word [w, j] holds element [w*32+b, j]. This layout keeps the
    column axis (length M, typically the padded vertex count) in the TPU
    lane dimension, so elementwise word ops tile at full vector width — the
    (..., M, W) row-major packing would put W (= N/32, usually < 128) in
    lanes and waste most of each tile.
    """
    n = mask.shape[-2]
    w = (n + 31) // 32
    pad = w * 32 - n
    if pad:
        zeros = jnp.zeros(mask.shape[:-2] + (pad,) + mask.shape[-1:], mask.dtype)
        mask = jnp.concatenate([mask, zeros], axis=-2)
    bits = mask.reshape(*mask.shape[:-2], w, 32, mask.shape[-1])
    if int(np.prod(mask.shape[-2:])) <= (1 << 26):
        # small: one fused weighted reduce (fastest — measured on the
        # batched bunny pipeline)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[:, None]
        return jnp.sum(bits.astype(jnp.uint32) * weights, axis=-2,
                       dtype=jnp.uint32)
    # large: OR-accumulate one bit plane at a time — peak extra memory is one
    # (..., W, M) u32 buffer instead of the (..., W, 32, M) u32 cast (32x the
    # packed size; at N=50K that intermediate alone is 10 GB)
    acc = bits[..., :, 0, :].astype(jnp.uint32)
    for b in range(1, 32):
        acc = acc | (bits[..., :, b, :].astype(jnp.uint32) << jnp.uint32(b))
    return acc


def core_numbers_from_bits(
    adj_bits: jnp.ndarray, n: int, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Core numbers from a row-packed (W, N) uint32 adjacency bitset.

    ``deg[j] = sum_w popcount(adj_bits[w, j] & active_bits[w])`` per peel
    round; see :func:`core_numbers_bitset` for the packing contract.
    """
    active0 = (
        jnp.ones((n,), bool) if valid is None else jnp.asarray(valid).astype(bool)
    )
    core0 = jnp.full((n,), -1, jnp.int32)

    def cond(state):
        active, core, k = state
        del core, k
        return jnp.any(active)

    def body(state):
        active, core, k = state
        act_bits = pack_bits_u32(active)  # (W,)
        live = adj_bits & act_bits[..., :, None]  # (W, N)
        deg = jnp.sum(
            jax.lax.population_count(live), axis=-2
        ).astype(jnp.int32)
        big = jnp.asarray(n + 1, jnp.int32)
        mind = jnp.min(jnp.where(active, deg, big))
        k = jnp.maximum(k, mind)
        remove = active & (deg <= k)
        core = jnp.where(remove, k, core)
        active = active & ~remove
        return active, core, k

    _, core, _ = jax.lax.while_loop(
        cond, body, (active0, core0, jnp.asarray(0, jnp.int32))
    )
    return core


def max_core_from_bits(
    adj_bits: jnp.ndarray, n: int, valid: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximum k-core mask + max core number, by binary search over k.

    :func:`core_numbers_from_bits` peels one degeneracy level per round —
    at N=100K that is ~600 sequential passes over the bitset. When only the
    TOP core is wanted (the KCORE_HEU threshold-0 selector), binary search
    needs ~log2(max_degree) probes, each a bulk-removal fixpoint that
    converges in a handful of rounds, and every successful probe shrinks the
    active set for all later probes (the k-core is contained in every
    k'-core with k' < k). ~40x fewer passes at N=100K.

    Returns (mask (N,) bool of the max-core vertices, max_core int32).
    """
    active0 = (
        jnp.ones((n,), bool) if valid is None else jnp.asarray(valid).astype(bool)
    )

    def degrees(active):
        act_bits = pack_bits_u32(active)
        live = adj_bits & act_bits[..., :, None]
        return jnp.sum(jax.lax.population_count(live), axis=-2).astype(jnp.int32)

    def fixpoint(k, active):
        """Remove active vertices with active-degree < k until stable."""

        def cond(state):
            active, changed = state
            del active
            return changed

        def body(state):
            active, _ = state
            deg = degrees(active)
            keep = active & (deg >= k)
            changed = jnp.any(keep != active)
            return keep, changed

        out, _ = jax.lax.while_loop(cond, body, (active, jnp.asarray(True)))
        return out

    deg0 = degrees(active0)
    hi0 = jnp.max(jnp.where(active0, deg0, 0))  # max_core <= max degree

    def bs_cond(state):
        lo, hi, base = state
        del base
        return lo < hi

    def bs_body(state):
        lo, hi, base = state
        k = (lo + hi + 1) // 2
        probe = fixpoint(k, base)
        ok = jnp.any(probe)
        lo = jnp.where(ok, k, lo)
        hi = jnp.where(ok, hi, k - 1)
        base = jnp.where(ok, probe, base)
        return lo, hi, base

    # lo = 0's fixpoint is active0 itself (degrees >= 0 always)
    lo, _, base = jax.lax.while_loop(
        bs_cond, bs_body, (jnp.asarray(0, jnp.int32), hi0, active0)
    )
    return base, lo


def core_numbers_bitset(
    adj: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Core numbers via a row-packed bitset + popcount degrees.

    Same batch-peeling recurrence as :func:`core_numbers_matvec`, but the
    adjacency lives as packed uint32 words so each peel round streams N*N/8
    bytes instead of N*N. The packing is over the ROW axis (adjacency is
    symmetric), keeping the N vertex columns in the lane dimension.
    """
    n = adj.shape[-1]
    adj_bits = pack_bits_u32_rows(adj)  # (W, N)
    return core_numbers_from_bits(adj_bits, n, valid)


def core_numbers(
    adj: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Core number of every vertex.

    Dispatches to the bitset+popcount implementation (the peel loop is
    HBM-bandwidth-bound; packed words stream 8x less than int8 rows).

    Args:
      adj: (N, N) bool symmetric adjacency, zero diagonal.
      valid: optional (N,) bool mask of vertices that exist (padding support);
        invalid vertices get core number -1.

    Returns:
      (N,) int32 core numbers.
    """
    return core_numbers_bitset(adj, valid)


def core_numbers_matvec(
    adj: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Reference implementation of :func:`core_numbers` via int8 MXU matvecs."""
    n = adj.shape[-1]
    # int8 adjacency: the peel loop re-reads it every round, so narrow dtype
    # cuts HBM traffic 4x vs f32 (the MXU takes int8 operands natively).
    adj_i8 = adj.astype(jnp.int8)
    active0 = (
        jnp.ones((n,), bool) if valid is None else jnp.asarray(valid).astype(bool)
    )
    core0 = jnp.full((n,), -1, jnp.int32)

    def cond(state):
        active, core, k = state
        del core, k
        return jnp.any(active)

    def body(state):
        active, core, k = state
        deg = jax.lax.dot_general(
            adj_i8,
            active.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        big = jnp.asarray(n + 1, jnp.int32)
        mind = jnp.min(jnp.where(active, deg, big))
        k = jnp.maximum(k, mind)
        remove = active & (deg <= k)
        core = jnp.where(remove, k, core)
        active = active & ~remove
        return active, core, k

    _, core, _ = jax.lax.while_loop(
        cond, body, (active0, core0, jnp.asarray(0, jnp.int32))
    )
    return core


def max_kcore_mask(
    adj: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vertices belonging to the maximum k-core (reference graph.cc:70-80).

    Returns (mask, max_core). ``max_core + 1`` upper-bounds the max clique.
    """
    core = core_numbers(adj, valid)
    max_core = jnp.max(core)
    mask = core >= max_core
    if valid is not None:
        mask = mask & valid
    return mask, max_core
