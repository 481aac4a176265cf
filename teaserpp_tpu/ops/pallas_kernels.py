"""Pallas TPU kernels for the O(N^2) hot paths.

Two kernels live here, with very different status:

* ``trim_adjacency_bits_pallas`` — **load-bearing**. The production huge-N
  adjacency builder (``parallel/sharded.py::_adjacency_bits_fast``)
  dispatches to it at N >= 65536 single-device on TPU: distances ->
  sqrt-free TRIM predicate -> in-VMEM 32-row bit-pack, 1.25x faster than
  the ``lax.map`` XLA stripe path at N=100K and bit-identical to it
  (PERFORMANCE.md "Huge-N Pallas bits kernel wins").
* ``trim_adjacency_pallas`` — reference/benchmark kernel only, on no hot
  path. It emits the dense int8 mask; the reduce-free per-axis XLA
  formulation achieves the same zero-materialization fusion with better
  codegen (its K=8 dot_general underutilizes the MXU), so the batched
  pipeline uses that instead (PERFORMANCE.md "adjacency lesson"). Kept as
  the MXU-tiled exemplar and exercised by the interpret-mode tests.

The TRIM test itself is reference registration.cc:427-443 applied to every
pair, i.e. the inlier-graph construction of registration.cc:609-619.

Points are laid out (3, N): the 3-axis sits on sublanes (padded to 8) and N
on lanes, so every tile is (8, T)-aligned per the f32 tiling constraint.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _trim_kernel(src_i, src_j, dst_i, dst_j, out_ref, *, beta: float):
    def pdist(a, b):
        # a, b: (8, T) tiles, xyz in rows 0..2 (rows 3..7 zero padding)
        a2 = jnp.sum(a * a, axis=0)[:, None]  # (T, 1)
        b2 = jnp.sum(b * b, axis=0)[None, :]  # (1, T)
        gram = jax.lax.dot_general(
            a[:], b[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T)
        return jnp.sqrt(jnp.maximum(a2 + b2 - 2.0 * gram, 0.0))

    ds = pdist(src_i[:], src_j[:])
    dd = pdist(dst_i[:], dst_j[:])
    out_ref[:] = (jnp.abs(ds - dd) <= beta).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("beta", "tile"))
def trim_adjacency_pallas(
    src: jnp.ndarray, dst: jnp.ndarray, beta: float, tile: int = 512
) -> jnp.ndarray:
    """(N, N) int8 TRIM consistency adjacency via a fused Pallas kernel.

    adj[i, j] = | ||src_i - src_j|| - ||dst_i - dst_j|| | <= beta for i != j.
    ``src``/``dst`` are (3, N) f32. Returns int8 (1 = consistent edge) with a
    zero diagonal; callers mask validity/padding as needed.
    """
    n = src.shape[-1]
    n_pad = _round_up(n, tile)

    def prep(v):
        v = v.astype(jnp.float32)
        v = jnp.pad(v, ((0, 5), (0, n_pad - n)))  # (8, n_pad), rows 3..7 zero
        # park padding columns far away so they never form edges
        if n_pad > n:
            far = jnp.full((8, n_pad - n), 1e15, jnp.float32).at[3:].set(0.0)
            v = v.at[:, n:].set(far)
        return v

    src_p = prep(src)
    dst_p = prep(dst)  # padding of dst at +1e15, src at +1e15 -> |ds-dd|=0?
    # Distances between two padded columns are 0 in both clouds -> the TRIM
    # test would pass; instead park dst padding at a DIFFERENT location so
    # |ds - dd| is huge for any pair involving padding.
    if n_pad > n:
        dst_p = dst_p.at[:3, n:].set(-1e15)

    grid = (n_pad // tile, n_pad // tile)
    kernel = functools.partial(_trim_kernel, beta=beta)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 3 * n_pad * n_pad,
            bytes_accessed=4 * 8 * n_pad * 2 + n_pad * n_pad,
            transcendentals=2 * n_pad * n_pad,  # the two sqrts
        ),
    )(src_p, src_p, dst_p, dst_p)

    out = out[:n, :n]
    out = out * (1 - jnp.eye(n, dtype=jnp.int8))
    return out


def _trim_bits_kernel(
    srcT_r, dstT_r, src_c, dst_c, out_ref, *, beta: float, n: int, rows: int
):
    """One (rows x C) stripe of the TRIM predicate, packed to uint32 rows.

    Row coordinates arrive transposed ((rows, 8): xyz in lanes 0..2) so the
    (rows, C) broadcast puts rows on sublanes and columns on lanes without
    any in-kernel relayout; everything is VPU elementwise (the per-axis
    formulation — the Gram/MXU form loses to it on both accuracy and fusion,
    see PERFORMANCE.md "adjacency lesson").
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = src_c.shape[-1]

    def pdist2(tr, tc):
        dx = tr[:, 0:1] - tc[0:1, :]
        dy = tr[:, 1:2] - tc[1:2, :]
        dz = tr[:, 2:3] - tc[2:3, :]
        return dx * dx + dy * dy + dz * dz

    ds = pdist2(srcT_r[:], src_c[:])
    dd = pdist2(dstT_r[:], dst_c[:])
    # sqrt-free TRIM predicate (ops/tims.py::trim_pred_sq, same op order so
    # the packed words stay bit-identical to the XLA stripe path)
    b2 = beta * beta
    s = ds + dd
    d = ds - dd
    pred = (s <= b2) | (d * d <= b2 * (2.0 * s - b2))

    row_idx = i * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0)
    col_idx = j * c + jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
    pred = pred & (row_idx != col_idx) & (row_idx < n)

    # pack: shift each row's bit to its position within its 32-row word,
    # then sum each 32-row band into one word per lane. Mosaic has no
    # unsigned reductions, so accumulate in int32 (two's-complement addition
    # of disjoint powers of two is bitwise identical) and bitcast out.
    shift = jax.lax.broadcasted_iota(jnp.int32, (rows, c), 0) % 32
    bits = pred.astype(jnp.int32) << shift
    for w in range(rows // 32):
        # dtype pinned: under x64 (interpret-mode tests) jnp.sum would
        # otherwise promote to int64 and the bitcast would widen
        word = jnp.sum(bits[32 * w : 32 * (w + 1), :], axis=0, dtype=jnp.int32)
        out_ref[w, :] = jax.lax.bitcast_convert_type(word, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("beta", "rows", "cols"))
def trim_adjacency_bits_pallas(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    beta: float,
    rows: int = 256,
    cols: int = 2048,
) -> jnp.ndarray:
    """Fused huge-N TRIM adjacency emitted directly as row-packed uint32 bits.

    Pallas replacement for :func:`teaserpp_tpu.ops.tims.trim_adjacency_bits`'s
    ``lax.map`` stripe loop: distances, compare, diagonal mask and 32-row
    bit-pack all happen in VMEM per (rows x cols) tile; only the packed words
    (N^2/8 bytes instead of two N^2 f32 fields) ever touch HBM. Output layout
    matches ``pack_bits_u32_rows``: bit b of word [w, j] = adjacency
    [32 w + b, j].
    """
    n = src.shape[-1]
    # the grid needs n_pad divisible by BOTH tile extents (a max() only
    # works when rows divides cols)
    n_pad = _round_up(n, math.lcm(rows, cols))
    src_p = jnp.pad(src.astype(jnp.float32), ((0, 8 - 3), (0, n_pad - n)))
    dst_p = jnp.pad(dst.astype(jnp.float32), ((0, 8 - 3), (0, n_pad - n)))
    src_t = src_p.T  # (n_pad, 8): rows on sublanes
    dst_t = dst_p.T

    grid = (n_pad // rows, n_pad // cols)
    out = pl.pallas_call(
        functools.partial(_trim_bits_kernel, beta=beta, n=n, rows=rows),
        out_shape=jax.ShapeDtypeStruct((n_pad // 32, n_pad), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cols), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cols), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows // 32, cols), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(src_t, dst_t, src_p, dst_p)
    w = (n + 31) // 32
    return out[:w, :n]


def _trim_deg_kernel(src_r, dst_r, srcT_c, dstT_c, out_ref, *, beta: float,
                     n: int, rows: int):
    """Accumulate one (cols x rows) tile of TRIM predicates directly into
    row degrees — the (N, N) mask never exists, even in VMEM beyond one
    tile. Stripe rows ride the LANE dim (so the degree reduction is a
    sublane sum, no relayout); candidates ride sublanes transposed."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = srcT_c.shape[0]

    def pdist2(tc, tr):  # (c, 8) x (8, rows) -> (c, rows)
        dx = tc[:, 0:1] - tr[0:1, :]
        dy = tc[:, 1:2] - tr[1:2, :]
        dz = tc[:, 2:3] - tr[2:3, :]
        return dx * dx + dy * dy + dz * dz

    ds = pdist2(srcT_c[:], src_r[:])
    dd = pdist2(dstT_c[:], dst_r[:])
    b2 = beta * beta
    s = ds + dd
    d = ds - dd
    pred = (s <= b2) | (d * d <= b2 * (2.0 * s - b2))
    row_idx = i * rows + jax.lax.broadcasted_iota(jnp.int32, (c, rows), 1)
    col_idx = j * c + jax.lax.broadcasted_iota(jnp.int32, (c, rows), 0)
    pred = pred & (row_idx != col_idx) & (row_idx < n) & (col_idx < n)
    part = jnp.sum(pred.astype(jnp.int32), axis=0, keepdims=True)  # (1, rows)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.broadcast_to(part, (8, rows))


@functools.partial(jax.jit, static_argnames=("beta", "rows", "cols"))
def trim_degrees_pallas(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    beta: float,
    rows: int = 256,
    cols: int = 2048,
) -> jnp.ndarray:
    """(N,) int32 TRIM-graph degrees with the pair predicate NEVER
    materialized (VERDICT r3/r4 stretch: "never materialize the pair
    predicate"). Each grid step evaluates a (cols x rows) predicate tile in
    VMEM and folds it straight into the stripe's degree accumulator; HBM
    only ever sees the (N,) degrees.

    This is the measurement vehicle for the fused predicate-into-degree
    A/B (PERFORMANCE.md "Kernel notes", r5 addendum): it bounds the best
    case of fusing the predicate into the k-core FIRST peel round. The
    peel's LATER rounds still need the adjacency (re-deriving it per round
    costs the full ~22-VPU-op/pair predicate again vs ~1 op/32-pair
    popcount word on the bits path), so this kernel can only ever replace
    round one — see the addendum for the measured verdict.
    """
    n = src.shape[-1]
    n_pad = _round_up(n, math.lcm(rows, cols))
    src_p = jnp.pad(src.astype(jnp.float32), ((0, 8 - 3), (0, n_pad - n)))
    dst_p = jnp.pad(dst.astype(jnp.float32), ((0, 8 - 3), (0, n_pad - n)))
    src_t = src_p.T  # (n_pad, 8)
    dst_t = dst_p.T

    grid = (n_pad // rows, n_pad // cols)
    out = pl.pallas_call(
        functools.partial(_trim_deg_kernel, beta=beta, n=n, rows=rows),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, rows), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rows), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, rows), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
    )(src_p, dst_p, src_t, dst_t)
    return out[0, :n]
