"""Surface normal estimation on dense neighbor masks.

TPU-native replacement for the reference's pcl::NormalEstimationOMP usage
(fpfh.cc:28-33): per-point covariance of the radius neighborhood computed
with matmuls against (B, N) row-block neighbor masks, smallest eigenvector
via the batched Jacobi 3x3 eigensolver, deterministic orientation toward the
viewpoint (PCL flipNormalTowardsViewpoint semantics, default origin).
Chunked over query rows so 100K-point clouds stream through fixed-size
device kernels.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.ops.procrustes import jacobi_eigh_small


class NormalsResult(NamedTuple):
    normals: jnp.ndarray  # (N, 3)
    curvatures: jnp.ndarray  # (N,) lambda_0 / (l0 + l1 + l2), PCL-style
    valid: jnp.ndarray  # (N,) bool — at least 3 neighbors


def radius_neighbor_mask(
    pts: jnp.ndarray, radius: float, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """(N, N) bool: ||p_i - p_j|| <= radius (self included, PCL convention)."""
    sq = jnp.sum(pts * pts, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)
    mask = d2 <= radius * radius
    if valid is not None:
        mask = mask & valid[None, :] & valid[:, None]
    return mask


def _normals_core(chunk_pts, pts, viewpoint, radius):
    """Covariance-normal math for a (B,) query block against an (M, 3)
    neighbor-candidate set (the full cloud on the dense path; a gathered
    grid-hash candidate subset on the pruned path — identical semantics,
    the candidate set provably contains every true neighbor)."""
    dtype = pts.dtype
    # Work on query-centered differences: the covariance of a radius-r
    # neighborhood is ~r^2 while raw second moments scale with the cloud's
    # distance from the origin squared — accumulating raw moments in f32
    # loses the covariance to cancellation (observed: garbage normals on
    # clouds ~2 m from the origin). Centered accumulation is shift-invariant.
    diff = pts[None, :, :] - chunk_pts[:, None, :]  # (B, N, 3)
    diff2 = jnp.sum(diff * diff, axis=-1)
    mask = (diff2 <= radius * radius).astype(dtype)  # (B, N)
    cnt = jnp.sum(mask, axis=1)
    safe_cnt = jnp.maximum(cnt, 1.0)

    s1 = jnp.einsum("bn,bni->bi", mask, diff)
    mean = s1 / safe_cnt[:, None]
    s2 = jnp.einsum("bn,bni,bnj->bij", mask, diff, diff)
    cov = s2 / safe_cnt[:, None, None] - jnp.einsum("pi,pj->pij", mean, mean)

    eigvals, eigvecs = jacobi_eigh_small(cov)
    order = jnp.argsort(eigvals, axis=-1)
    small = order[:, 0]
    normal = jnp.take_along_axis(
        eigvecs, small[:, None, None].repeat(3, axis=1), axis=-1
    )[..., 0]
    lam = jnp.take_along_axis(eigvals, order, axis=-1)
    lam_sum = jnp.sum(jnp.abs(lam), axis=-1)
    curvature = jnp.where(
        lam_sum > 0,
        jnp.abs(lam[:, 0]) / jnp.where(lam_sum > 0, lam_sum, 1.0),
        0.0,
    )

    to_vp = viewpoint[None, :] - chunk_pts
    flip = jnp.sum(normal * to_vp, axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal, normal)
    return normal, curvature, cnt >= 3


@partial(jax.jit, static_argnames=("radius",))
def _normals_chunk(chunk_pts, pts, viewpoint, radius):
    return _normals_core(chunk_pts, pts, viewpoint, radius)


def _normals_blocks_body(q_blocks, cand_idx, sorted_pts_pad, viewpoint, radius):
    """lax.map over query blocks, each gathering its grid-hash candidate
    subset (features/spatial.py) — the ONE body both the single-device and
    the shard_map entry points run (so the two paths cannot diverge)."""
    return jax.lax.map(
        lambda a: _normals_core(a[0], sorted_pts_pad[a[1]], viewpoint, radius),
        (q_blocks, cand_idx),
    )


@jax.jit
def _normals_pruned(q_blocks, sorted_pts_pad, cand_idx, viewpoint, radius):
    """All query blocks in ONE device program."""
    return _normals_blocks_body(q_blocks, cand_idx, sorted_pts_pad,
                                viewpoint, radius)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _normals_pruned_sharded(q_blocks, sorted_pts_pad, cand_idx, viewpoint,
                            radius, mesh, axis):
    """Query blocks sharded over ``mesh[axis]``; the (small) sorted cloud
    is replicated and each device runs its local blocks — the front-end
    analog of the solver's row-sharded O(N^2) path (SURVEY §2.5).
    check_vma=False: purely per-shard map (no collectives); the jacobi
    fori_loop's constant-init carry trips the VMA checker."""
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        _normals_blocks_body,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    )(q_blocks, cand_idx, sorted_pts_pad, viewpoint, radius)


def estimate_normals_pruned(pts, radius, plan, viewpoint=(0.0, 0.0, 0.0),
                            mesh=None):
    """Grid-hash-pruned normals: identical semantics to the dense path
    (the candidate set provably contains every radius neighbor, the exact
    Euclidean predicate is re-tested on device) at ~3-10% of the pair work.
    ``plan`` comes from :func:`teaserpp_tpu.features.spatial.
    build_neighbor_plans` for this radius. With ``mesh``, query blocks are
    sharded over the mesh's first axis (bitwise-identical per-block math,
    devices work disjoint blocks)."""
    from teaserpp_tpu.features.spatial import (
        SENTINEL, pad_block_count, query_blocks, sorted_padded,
    )

    if float(radius) > plan.radius * (1 + 1e-9):
        raise ValueError(
            f"radius {radius} exceeds plan.radius {plan.radius}: the plan's "
            "candidate lists only provably cover plan.radius — neighbors "
            "beyond it would be silently dropped. Build a plan for this "
            "radius."
        )
    pts_np = np.asarray(pts)  # one download if device-resident; no-op if host
    dtype = jax.dtypes.canonicalize_dtype(pts_np.dtype)
    sp = sorted_padded(pts_np, plan, SENTINEL)
    qb = query_blocks(sp, plan)
    vp = jnp.asarray(viewpoint, dtype)
    if mesh is None:
        nr, cv, ok = _normals_pruned(
            jnp.asarray(qb, dtype),
            jnp.asarray(sp, dtype),
            jnp.asarray(plan.cand_idx),
            vp,
            jnp.asarray(radius, dtype),
        )
        nblocks = plan.nblocks
    else:
        axis = mesh.axis_names[0]
        ndev = mesh.shape[axis]
        qb_p, ci_p = pad_block_count(qb, plan, ndev)
        nr, cv, ok = _normals_pruned_sharded(
            jnp.asarray(qb_p, dtype),
            jnp.asarray(sp, dtype),
            jnp.asarray(ci_p),
            vp,
            jnp.asarray(radius, dtype),
            mesh,
            axis,
        )
        nblocks = qb_p.shape[0]
    flat = lambda a: jnp.reshape(a, (nblocks * plan.block,) + a.shape[2:])
    inv = jnp.asarray(plan.inv)
    return NormalsResult(
        normals=flat(nr)[: plan.n][inv],
        curvatures=flat(cv)[: plan.n][inv],
        valid=flat(ok)[: plan.n][inv],
    )


def estimate_normals(
    pts: jnp.ndarray,
    radius: float,
    viewpoint: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    valid: Optional[jnp.ndarray] = None,
    chunk_size: int = 1024,
) -> NormalsResult:
    """Per-point normals from the radius neighborhood covariance.

    Args:
      pts: (N, 3) points.
      radius: neighborhood radius (PCL setRadiusSearch equivalent).
      viewpoint: orientation reference; normals flipped to face it.
      valid: optional (N,) padding mask (invalid points excluded from
        neighborhoods and marked invalid in the result).
      chunk_size: query-row block size for the streamed device kernels.
    """
    dtype = pts.dtype
    n = pts.shape[0]
    vp = jnp.asarray(viewpoint, dtype)
    if valid is not None:
        # exclude invalid points from every neighborhood by parking them far away
        far = jnp.asarray(1e12, dtype)
        pts_eff = jnp.where(valid[:, None], pts, far)
    else:
        pts_eff = pts
    b = min(chunk_size, n)
    normals, curvatures, ok = [], [], []
    for s in range(0, n, b):
        e = min(s + b, n)
        cp = pts_eff[s:e]
        pad = b - (e - s)
        if pad:
            cp = jnp.pad(cp, ((0, pad), (0, 0)))
        nr, cv, vo = _normals_chunk(cp, pts_eff, vp, radius)
        normals.append(nr[: e - s])
        curvatures.append(cv[: e - s])
        ok.append(vo[: e - s])
    normal = jnp.concatenate(normals, axis=0)
    curvature = jnp.concatenate(curvatures, axis=0)
    okv = jnp.concatenate(ok, axis=0)
    if valid is not None:
        okv = okv & valid
    return NormalsResult(normals=normal, curvatures=curvature, valid=okv)
