"""Fast Point Feature Histograms (33-bin FPFH), fully vectorized.

TPU-native replacement for the reference's pcl::FPFHEstimationOMP usage
(fpfh.cc:36-40), reproducing PCL's algorithm semantics exactly so descriptors
match the reference pipeline (validated against the PCL-generated
bunny_fpfh.csv golden data):

  * pair features (f1, f2, f3) per PCL ``computePairFeatures`` including the
    source/target swap rule |angle1| < |angle2| and the f3 = -angle2 sign
    in the swapped branch;
  * SPFH: 3 x 11-bin histograms per point, increment 100 / (k - 1);
  * FPFH: neighbor SPFHs weighted by inverse *squared* distance (PCL uses
    the kd-tree's squared distances), self excluded, each 11-bin block
    normalized to sum 100.

Instead of kd-trees and ragged neighbor lists, neighborhoods are dense
(B, N) row blocks: each pass is matmul-shaped masked arithmetic, chunked
over query rows so 100K-point clouds stream through fixed-size device
kernels (the same blocking a Pallas kernel would use; XLA fuses each chunk).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.features.normals import estimate_normals
from teaserpp_tpu.ops.procrustes import jacobi_eigh_small

_NR_BINS = 11


class FPFHResult(NamedTuple):
    descriptors: jnp.ndarray  # (N, 33)
    normals: jnp.ndarray  # (N, 3)


def _pair_features_block(
    chunk_pts, chunk_normals, pts, normals, mask
):
    """f1/f2/f3 bins for every (chunk point p, cloud point q) under ``mask``."""
    dtype = pts.dtype
    diff = pts[None, :, :] - chunk_pts[:, None, :]  # (B, N, 3): q - p
    dist2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    ok = mask & (dist > 0)
    safe_dist = jnp.where(dist > 0, dist, jnp.ones_like(dist))

    n_p = chunk_normals[:, None, :]
    n_q = normals[None, :, :]
    angle1 = jnp.sum(n_p * diff, axis=-1) / safe_dist
    angle2 = jnp.sum(n_q * diff, axis=-1) / safe_dist
    # PCL swaps roles when acos|angle1| > acos|angle2|, i.e. |angle1| < |angle2|
    noswap = jnp.abs(angle1) >= jnp.abs(angle2)

    shape = diff.shape
    ns = jnp.where(noswap[..., None], jnp.broadcast_to(n_p, shape),
                   jnp.broadcast_to(n_q, shape))
    nt = jnp.where(noswap[..., None], jnp.broadcast_to(n_q, shape),
                   jnp.broadcast_to(n_p, shape))
    dvec = jnp.where(noswap[..., None], diff, -diff)
    # f3 is the source normal against the *effective* (possibly flipped)
    # direction: angle1 unswapped, -angle2 swapped (PCL pfh_tools semantics).
    f3 = jnp.where(noswap, angle1, -angle2)

    v = jnp.cross(dvec, ns)
    v_norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))
    ok = ok & (v_norm > 0)
    v = v / jnp.where(v_norm > 0, v_norm, jnp.ones_like(v_norm))[..., None]
    w = jnp.cross(ns, v)

    f2 = jnp.sum(v * nt, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(ns * nt, axis=-1))

    pi = jnp.asarray(np.pi, dtype)
    b1 = jnp.clip(
        jnp.floor(_NR_BINS * (f1 + pi) / (2.0 * pi)).astype(jnp.int32), 0, _NR_BINS - 1
    )
    b2 = jnp.clip(
        jnp.floor(_NR_BINS * (f2 + 1.0) * 0.5).astype(jnp.int32), 0, _NR_BINS - 1
    )
    b3 = jnp.clip(
        jnp.floor(_NR_BINS * (f3 + 1.0) * 0.5).astype(jnp.int32), 0, _NR_BINS - 1
    )
    return ok, dist2, b1, b2, b3


def _spfh_core(chunk_pts, chunk_normals, chunk_valid, pts, normals, radius):
    """(B, 33) SPFH histograms for a query block against an (M, 3)
    neighbor-candidate set (full cloud on the dense path; a gathered
    grid-hash subset on the pruned path — identical semantics)."""
    dtype = pts.dtype
    diff2 = jnp.sum((pts[None, :, :] - chunk_pts[:, None, :]) ** 2, axis=-1)
    mask = diff2 <= radius * radius  # includes self (dist 0)
    ok, _, b1, b2, b3 = _pair_features_block(
        chunk_pts, chunk_normals, pts, normals, mask
    )
    okf = ok.astype(dtype) * chunk_valid[:, None]
    cnt = jnp.sum(mask, axis=1).astype(dtype)
    incr = 100.0 / jnp.maximum(cnt - 1.0, 1.0)

    def hist(bins):
        oh = jax.nn.one_hot(bins, _NR_BINS, dtype=dtype)  # (B, N, 11)
        return jnp.einsum("pq,pqb->pb", okf, oh) * incr[:, None]

    return jnp.concatenate([hist(b1), hist(b2), hist(b3)], axis=-1)


_spfh_chunk = partial(jax.jit, static_argnames=("radius",))(_spfh_core)


def _fpfh_core(chunk_pts, pts, spfh, radius):
    """(B, 33) FPFH from candidate-set SPFHs for a block of query points."""
    dtype = pts.dtype
    diff2 = jnp.sum((pts[None, :, :] - chunk_pts[:, None, :]) ** 2, axis=-1)
    mask = (diff2 <= radius * radius) & (diff2 > 0)
    wgt = jnp.where(mask, 1.0 / jnp.maximum(diff2, 1e-30), 0.0).astype(dtype)
    raw = wgt @ spfh  # (B, 33)
    out = []
    for blk in range(3):
        seg = raw[:, blk * _NR_BINS : (blk + 1) * _NR_BINS]
        s = jnp.sum(seg, axis=-1, keepdims=True)
        out.append(jnp.where(s > 0, seg * (100.0 / jnp.where(s > 0, s, 1.0)), seg))
    return jnp.concatenate(out, axis=-1)


_fpfh_chunk = partial(jax.jit, static_argnames=("radius",))(_fpfh_core)


def _spfh_blocks_body(q_pts, q_normals, sorted_pts, sorted_normals,
                      cand_idx, radius):
    """lax.map SPFH body shared by the single-device and shard_map entry
    points (one implementation: the two paths cannot diverge)."""

    def one(args):
        qp, qn, ci = args
        ones = jnp.ones((qp.shape[0],), sorted_pts.dtype)
        return _spfh_core(
            qp, qn, ones, sorted_pts[ci], sorted_normals[ci], radius
        )

    return jax.lax.map(one, (q_pts, q_normals, cand_idx))


def _fpfh_blocks_body(q_pts, sorted_pts, sorted_spfh, cand_idx, radius):
    """lax.map FPFH body shared by both entry points."""
    return jax.lax.map(
        lambda a: _fpfh_core(a[0], sorted_pts[a[1]], sorted_spfh[a[1]], radius),
        (q_pts, cand_idx),
    )


_spfh_pruned = jax.jit(_spfh_blocks_body)
_fpfh_pruned = jax.jit(_fpfh_blocks_body)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _spfh_pruned_sharded(q_pts, q_normals, sorted_pts, sorted_normals,
                         cand_idx, radius, mesh, axis):
    # check_vma=False: purely per-shard map (no collectives); the
    # jacobi fori_loop's constant-init carry trips the VMA checker
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        _spfh_blocks_body,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(axis), P(), P(), P(axis), P()),
        out_specs=P(axis),
    )(q_pts, q_normals, sorted_pts, sorted_normals, cand_idx, radius)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _fpfh_pruned_sharded(q_pts, sorted_pts, sorted_spfh, cand_idx, radius,
                         mesh, axis):
    from jax.sharding import PartitionSpec as P

    # check_vma=False: purely per-shard map (no collectives); the
    # jacobi fori_loop's constant-init carry trips the VMA checker
    return jax.shard_map(
        _fpfh_blocks_body,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(), P(), P(axis), P()),
        out_specs=P(axis),
    )(q_pts, sorted_pts, sorted_spfh, cand_idx, radius)


def compute_fpfh_pruned(
    pts: jnp.ndarray, normals: jnp.ndarray, radius: float, plan, mesh=None
) -> jnp.ndarray:
    """(N, 33) FPFH via a grid-hash :class:`~teaserpp_tpu.features.spatial.
    NeighborPlan` — identical neighbor semantics to :func:`compute_fpfh`
    (the candidate set provably contains every radius neighbor; the exact
    predicate is re-tested on device) at ~3-10% of the pair work. With
    ``mesh``, query blocks are sharded over the mesh's first axis (the
    sorted cloud + SPFH table replicate; devices work disjoint blocks —
    the front-end analog of the solver's row-sharded O(N^2) path)."""
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
    sn = sorted_padded(np.asarray(normals), plan, 0.0)
    qb_pts = query_blocks(sp, plan)
    qb_nrm = query_blocks(sn, plan)
    ci_np = plan.cand_idx
    if mesh is not None:
        axis = mesh.axis_names[0]
        ndev = mesh.shape[axis]
        qb_pts, ci_np = pad_block_count(qb_pts, plan, ndev)
        qb_nrm, _ = pad_block_count(qb_nrm, plan, ndev)
    qb_p = jnp.asarray(qb_pts, dtype)
    qb_n = jnp.asarray(qb_nrm, dtype)
    sp_d = jnp.asarray(sp, dtype)
    sn_d = jnp.asarray(sn, dtype)
    ci = jnp.asarray(ci_np)
    r_d = jnp.asarray(radius, dtype)
    nblocks = qb_p.shape[0]

    if mesh is None:
        spfh = _spfh_pruned(qb_p, qb_n, sp_d, sn_d, ci, r_d)
    else:
        spfh = _spfh_pruned_sharded(
            qb_p, qb_n, sp_d, sn_d, ci, r_d, mesh, mesh.axis_names[0]
        )
    spfh_flat = spfh.reshape(nblocks * plan.block, 3 * _NR_BINS)[: plan.n]
    # re-pad the sorted SPFH table with a zero row for candidate gathers
    spfh_sorted = jnp.concatenate(
        [spfh_flat, jnp.zeros((1, 3 * _NR_BINS), dtype)], axis=0
    )
    if mesh is None:
        fpfh = _fpfh_pruned(qb_p, sp_d, spfh_sorted, ci, r_d)
    else:
        fpfh = _fpfh_pruned_sharded(
            qb_p, sp_d, spfh_sorted, ci, r_d, mesh, mesh.axis_names[0]
        )
    flat = fpfh.reshape(nblocks * plan.block, 3 * _NR_BINS)[: plan.n]
    return flat[jnp.asarray(plan.inv)]


def _chunks(n: int, size: int):
    for start in range(0, n, size):
        yield start, min(start + size, n)


def compute_fpfh(
    pts: jnp.ndarray,
    normals: jnp.ndarray,
    radius: float,
    valid: Optional[jnp.ndarray] = None,
    chunk_size: int = 1024,
) -> jnp.ndarray:
    """(N, 33) FPFH descriptors from points and normals, chunked over rows."""
    n = pts.shape[0]
    dtype = pts.dtype
    b = min(chunk_size, n)
    ones = jnp.ones((n,), dtype) if valid is None else jnp.asarray(valid).astype(dtype)

    def run_chunked(fn, *extra):
        outs = []
        for s, e in _chunks(n, b):
            pad = b - (e - s)
            cp = pts[s:e]
            cn = normals[s:e]
            cv = ones[s:e]
            if pad:
                cp = jnp.pad(cp, ((0, pad), (0, 0)))
                cn = jnp.pad(cn, ((0, pad), (0, 0)))
                cv = jnp.pad(cv, (0, pad))
            outs.append(fn(cp, cn, cv, *extra)[: e - s])
        return jnp.concatenate(outs, axis=0)

    spfh = run_chunked(
        lambda cp, cn, cv: _spfh_chunk(cp, cn, cv, pts, normals, radius)
    )
    fpfh = run_chunked(lambda cp, cn, cv: _fpfh_chunk(cp, pts, spfh, radius))
    return fpfh


class FPFHEstimation:
    """Reference-style facade (fpfh.h:23-92): computeFPFHFeatures + getNormals.

    ``neighbor_mode`` selects the neighborhood machinery:
      * ``"dense"``  — every pass tests all N candidates per query (the
        original chunked (B, N) row blocks);
      * ``"grid"``   — grid-hash candidate pruning (features/spatial.py),
        the analog of the reference's PCL kd-tree radius searches
        (fpfh.cc:28-40) with identical neighbor semantics;
      * ``"auto"``   — grid when the cloud is large enough for pruning to
        win (N >= 8192) AND the plan actually prunes (candidate work
        < 70% of dense); dense otherwise.

    ``mesh`` (optional jax.sharding.Mesh) shards the grid path's query
    blocks over the mesh's first axis (ignored on the dense path).
    """

    def __init__(self, chunk_size: int = 1024, neighbor_mode: str = "auto",
                 mesh=None):
        if neighbor_mode not in ("auto", "dense", "grid"):
            raise ValueError(f"unknown neighbor_mode: {neighbor_mode!r}")
        self._normals = np.zeros((0, 3))
        self._chunk_size = chunk_size
        self._neighbor_mode = neighbor_mode
        self._mesh = mesh

    def computeFPFHFeatures(
        self,
        input_cloud,
        normal_search_radius: float = 0.03,
        fpfh_search_radius: float = 0.05,
    ) -> np.ndarray:
        """(N, 33) float descriptors of ``input_cloud`` (PointCloud or (N,3))."""
        from teaserpp_tpu.features.normals import estimate_normals_pruned
        from teaserpp_tpu.features.spatial import build_neighbor_plans

        pts = np.asarray(getattr(input_cloud, "points", input_cloud), dtype=np.float64)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        pts_d = jnp.asarray(pts, dtype)
        n = len(pts)

        plans = None
        # auto mode also requires a sane radius ratio: the plan grid's cell
        # is the SMALLER radius, so a large fpfh/normal radius ratio blows
        # up the neighbor-cell count cubically (build_neighbor_plans
        # raises past reach 7; auto just falls back to dense)
        ratio_ok = (
            min(normal_search_radius, fpfh_search_radius) > 0
            and max(normal_search_radius, fpfh_search_radius)
            / min(normal_search_radius, fpfh_search_radius)
            <= 7
        )
        if self._neighbor_mode == "grid" or (
            self._neighbor_mode == "auto" and n >= 8192 and ratio_ok
        ):
            plans = build_neighbor_plans(
                pts, (normal_search_radius, fpfh_search_radius)
            )
            if self._neighbor_mode == "auto" and not all(
                p.pair_fraction < 0.7 for p in plans
            ):
                plans = None  # pruning would not pay for its gathers

        if plans is not None:
            # pass the HOST array: both pruned passes re-sort on host
            # (np.asarray of a device array would round-trip the cloud
            # through the relay for nothing)
            nres = estimate_normals_pruned(
                pts, normal_search_radius, plans[0], mesh=self._mesh
            )
            self._normals = np.asarray(nres.normals)
            desc = compute_fpfh_pruned(
                pts, nres.normals, fpfh_search_radius, plans[1],
                mesh=self._mesh,
            )
            return np.asarray(desc)

        nres = estimate_normals(
            pts_d, normal_search_radius, chunk_size=self._chunk_size
        )
        self._normals = np.asarray(nres.normals)
        desc = compute_fpfh(
            pts_d, nres.normals, fpfh_search_radius, chunk_size=self._chunk_size
        )
        return np.asarray(desc)

    def getNormals(self) -> np.ndarray:
        return self._normals


def compute_fpfh_features(
    cloud, normal_search_radius: float = 0.03, fpfh_search_radius: float = 0.05
):
    """Functional convenience wrapper returning (descriptors, normals)."""
    est = FPFHEstimation()
    desc = est.computeFPFHFeatures(cloud, normal_search_radius, fpfh_search_radius)
    return desc, est.getNormals()
