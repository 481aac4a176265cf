"""Pallas TPU kernels for the O(N^2) hot paths.

``trim_adjacency_pallas`` fuses the whole TRIM consistency test
(reference registration.cc:427-443 applied to every pair, i.e. the
inlier-graph construction of registration.cc:609-619) into one kernel:
for each (i, j) tile it computes the two pairwise-distance tiles on the MXU
and emits the boolean consistency mask — the two N x N distance matrices are
never materialized in HBM, only the final one-byte mask is, cutting HBM
traffic ~8x vs the XLA path at large N.

Points are laid out (3, N): the 3-axis sits on sublanes (padded to 8) and N
on lanes, so every tile is (8, T)-aligned per the f32 tiling constraint.
"""

from __future__ import annotations

import functools

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


def trim_adjacency_auto(src, dst, noise_bound, cbar2=1.0, valid=None):
    """TRIM adjacency: Pallas kernel on TPU, XLA fallback elsewhere."""
    import math

    beta = 2.0 * noise_bound * math.sqrt(cbar2)
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        adj = trim_adjacency_pallas(
            jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), beta
        ).astype(bool)
    else:
        from teaserpp_tpu.parallel.sharded import trim_adjacency_dense

        adj = trim_adjacency_dense(src, dst, noise_bound, cbar2)
    if valid is not None:
        adj = adj & valid[None, :] & valid[:, None]
    return adj
