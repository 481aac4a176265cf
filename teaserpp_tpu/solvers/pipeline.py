"""Fully-jittable fixed-shape registration pipeline.

This is the TPU-native heart of the framework: the complete decoupled solve
(reference registration.cc:568-737) as one pure function of fixed-shape
arrays — scale stage over TIM norms, on-device clique selection, chain-TIM
GNC rotation, component-wise TLS translation — with all dynamic sizes
expressed as boolean masks. It jits once per (N, params), vmaps over batches
of independent registrations, and shards under ``shard_map``.

The host-orchestrated :class:`~teaserpp_tpu.solvers.registration.RobustRegistrationSolver`
wraps these stages and adds the PMC_EXACT (native C++ branch-and-bound) and
COMPLETE-graph paths that need host control or dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from teaserpp_tpu.params import (
    InlierSelectionMode,
    RobustRegistrationSolverParams,
    RotationEstimationAlgorithm,
)
from teaserpp_tpu.ops.tims import (
    chain_tims,
    compute_tim_norms,
    tim_pair_valid,
    trim_adjacency_dense,
    upper_tri_indices,
)
from teaserpp_tpu.solvers.scale import select_scale_inliers, solve_scale_tls
from teaserpp_tpu.solvers.rotation import (
    solve_rotation_fgr,
    solve_rotation_gnc_tls,
    solve_rotation_quatro,
)
from teaserpp_tpu.solvers.translation import solve_translation_tls
from teaserpp_tpu.clique.graph import adjacency_from_pair_mask
from teaserpp_tpu.clique.heuristic import heuristic_max_clique
from teaserpp_tpu.clique.kcore import core_numbers


class ScaleStageResult(NamedTuple):
    scale: jnp.ndarray  # () estimated scale
    pair_mask: jnp.ndarray  # (K,) bool scale-stage TIM inlier mask


class PipelineSolution(NamedTuple):
    """Solution + introspection masks of the fused pipeline (all fixed shape)."""

    valid: jnp.ndarray  # () bool — False when the clique degenerated (size <= 1)
    scale: jnp.ndarray  # ()
    rotation: jnp.ndarray  # (3, 3)
    translation: jnp.ndarray  # (3,)
    scale_pair_mask: jnp.ndarray  # (K,) bool TIM inliers from the scale stage
    clique_mask: jnp.ndarray  # (N,) bool max-clique membership
    rotation_inlier_mask: jnp.ndarray  # (N,) bool per chain-TIM root index
    translation_inlier_mask: jnp.ndarray  # (N,) bool over original measurements
    rotation_cost: jnp.ndarray  # () GNC cost at termination
    rotation_iterations: jnp.ndarray  # () int


def scale_stage(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
    use_matmul_norms: bool = False,
) -> ScaleStageResult:
    """TIM-norm construction + scale estimation / TRIM pruning.

    Reference flow: computeTIMs (registration.cc:599-600) + solveForScale
    (registration.cc:603). Only TIM *norms* are built here — the O(N^2) TIM
    vectors themselves are never materialized for the scale stage.
    """
    n = src.shape[-1]
    src_norms = compute_tim_norms(src, use_matmul=use_matmul_norms)
    dst_norms = compute_tim_norms(dst, use_matmul=use_matmul_norms)
    pv = tim_pair_valid(valid, n)
    if params.estimate_scaling:
        res = solve_scale_tls(
            src_norms, dst_norms, params.noise_bound, params.cbar2, valid=pv
        )
    else:
        res = select_scale_inliers(
            src_norms, dst_norms, params.noise_bound, params.cbar2, valid=pv
        )
    return ScaleStageResult(scale=res.scale, pair_mask=res.inliers)


def device_clique_from_adjacency(
    adj: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """On-device inlier selection from a dense adjacency -> (N,) bool mask."""
    n = adj.shape[-1]
    mode = params.resolved_inlier_selection_mode()
    if mode == InlierSelectionMode.KCORE_HEU:
        if params.kcore_heuristic_threshold <= 0:
            # threshold 0 = "always take the top k-core" (reference
            # registration.h:480-482) — statically skip the greedy search,
            # which matters because under vmap both sides of a data-dependent
            # select would otherwise execute.
            #
            # Measured A/B (r3, batched bunny 1889-corr on chip): the
            # level-by-level batch peel beats the binary-search max-core
            # fixpoint here — 8318 vs 8026 regs/s at batch 256, 9318 vs
            # 8986 at batch 512. The batch peel's `k = max(k, min_active
            # degree)` jumps whole degeneracy plateaus at once, so these
            # dense-clique TRIM graphs peel in a handful of rounds, while
            # binary search pays ~log2(max_degree) probes of several rounds
            # each. The binary-search selector (`max_core_from_bits`) stays
            # the huge-N single-problem path in parallel/sharded.py, where
            # the wave count is in the hundreds and it wins 17x.
            core = core_numbers(adj, valid)
            mask = core >= jnp.max(core)
        else:
            core = core_numbers(adj, valid)
            max_core = jnp.max(core)
            kcore_mask = core >= max_core
            nv = (
                jnp.asarray(n, jnp.float32)
                if valid is None
                else jnp.sum(valid).astype(jnp.float32)
            )
            use_kcore = jnp.logical_and(
                params.kcore_heuristic_threshold != 1,
                max_core.astype(jnp.float32)
                > params.kcore_heuristic_threshold * nv,
            )
            # skip=use_kcore makes the greedy while_loops zero-trip when the
            # k-core shortcut already decided — a threshold>0 batch where
            # every problem takes the shortcut now costs the same as
            # threshold=0 (the reference returns early on the host,
            # graph.cc:66-81; a traced program skips by emptying the loops).
            heu = heuristic_max_clique(
                adj,
                valid=valid,
                num_seeds=params.max_clique_heuristic_seeds,
                skip=use_kcore,
                core=core,
            )
            mask = jnp.where(use_kcore, kcore_mask, heu.mask)
    else:  # PMC_HEU -> on-device greedy heuristic
        heu = heuristic_max_clique(
            adj, valid=valid, num_seeds=params.max_clique_heuristic_seeds
        )
        mask = heu.mask
    if valid is not None:
        mask = mask & valid
    return mask


def device_clique_stage(
    pair_mask: jnp.ndarray,
    n: int,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """On-device inlier clique selection -> (N,) bool mask.

    Covers NONE / KCORE_HEU / PMC_HEU modes (reference registration.cc:609-654
    with graph.cc semantics); PMC_EXACT goes through the host facade.
    """
    mode = params.resolved_inlier_selection_mode()
    if mode == InlierSelectionMode.NONE:
        mask = jnp.ones((n,), bool)
        if valid is not None:
            mask = mask & valid
        return mask

    adj = adjacency_from_pair_mask(pair_mask, n)
    if valid is not None:
        adj = adj & valid[None, :] & valid[:, None]
    return device_clique_from_adjacency(adj, params, valid)


def _polish_rt(src, dst, scale, rotation, translation, inlier_mask):
    """Joint weighted-Procrustes re-fit of (R, t) on the final inlier points.

    ``dst = s R src + t`` with s fixed to the scale estimate. At small inlier
    counts this reaches the statistical floor the chain-TIM GNC estimate
    can't (TIM differencing doubles the effective noise); no reference
    analog. Falls back to the inputs when fewer than 3 inliers survive.
    """
    from teaserpp_tpu.ops.procrustes import svd_rot

    w = inlier_mask.astype(src.dtype)
    nw = jnp.sum(w)
    safe_nw = jnp.maximum(nw, 1.0)
    cs = jnp.sum(src * w, axis=-1) / safe_nw
    cd = jnp.sum(dst * w, axis=-1) / safe_nw
    r_pol = svd_rot(src - cs[:, None], dst - cd[:, None], w)
    t_pol = cd - scale * (r_pol @ cs)
    ok = nw >= 3
    return (
        jnp.where(ok, r_pol, rotation),
        jnp.where(ok, t_pol, translation),
    )


def rotation_translation_stage(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    scale: jnp.ndarray,
    clique_mask: jnp.ndarray,
    params: RobustRegistrationSolverParams,
) -> PipelineSolution:
    """Chain-TIM GNC rotation + component-wise TLS translation.

    Reference flow: chain TIM rebuild (registration.cc:657-680), de-scaling
    and rotation noise-bound update (registration.cc:697-704), rotation solve
    (registration.cc:708), translation solve on the clique points
    (registration.cc:717-727). CHAIN formulation only — COMPLETE needs
    dynamic shapes and lives in the host orchestrator.
    """
    dtype = src.dtype
    src_ctims, tim_valid = chain_tims(src, clique_mask)
    dst_ctims, _ = chain_tims(dst, clique_mask)

    inv_s = 1.0 / scale
    dst_ctims = dst_ctims * inv_s
    nb_rot = params.noise_bound * 2.0 * inv_s

    alg = params.rotation_estimation_algorithm
    rot_kw = dict(
        gnc_factor=params.rotation_gnc_factor,
        max_iterations=params.rotation_max_iterations,
        cost_threshold=params.rotation_cost_threshold,
        valid=tim_valid,
    )
    # noise bound is a traced value (depends on estimated scale) — the
    # rotation solvers accept array noise bounds.
    if alg == RotationEstimationAlgorithm.GNC_TLS:
        rot = solve_rotation_gnc_tls(src_ctims, dst_ctims, nb_rot, **rot_kw)
    elif alg == RotationEstimationAlgorithm.FGR:
        rot = solve_rotation_fgr(src_ctims, dst_ctims, nb_rot, **rot_kw)
    else:
        rot = solve_rotation_quatro(src_ctims, dst_ctims, nb_rot, **rot_kw)

    # Translation on the clique points, aligned by s * R (registration.cc:724-727).
    aligned_src = scale * (rot.rotation @ src)
    trans = solve_translation_tls(
        aligned_src, dst, params.noise_bound, params.cbar2, valid=clique_mask
    )

    rotation, translation = rot.rotation, trans.translation
    if params.final_polish:
        rotation, translation = _polish_rt(
            src, dst, scale, rotation, translation,
            trans.inliers & clique_mask,
        )

    clique_size = jnp.sum(clique_mask)
    return PipelineSolution(
        valid=clique_size > 1,  # reference registration.cc:643-647
        scale=jnp.asarray(scale, dtype),
        rotation=rotation,
        translation=translation,
        scale_pair_mask=jnp.zeros((0,), bool),  # filled by register_pair
        clique_mask=clique_mask,
        rotation_inlier_mask=rot.inliers,
        translation_inlier_mask=trans.inliers,
        rotation_cost=rot.cost,
        rotation_iterations=rot.iterations,
    )


def rotation_translation_complete(
    src_sel: jnp.ndarray,
    dst_sel: jnp.ndarray,
    point_valid: jnp.ndarray,
    scale: jnp.ndarray,
    params: RobustRegistrationSolverParams,
) -> PipelineSolution:
    """COMPLETE-graph rotation stage on (possibly padded) clique points.

    Reference registration.cc:681-694: rebuild the full M(M-1)/2 TIM set over
    the clique points and hand it to the GNC rotation solver. Inputs are the
    gathered clique points padded to a static size M with ``point_valid``.
    """
    m = src_sel.shape[-1]
    i_idx, j_idx = upper_tri_indices(m)
    src_tims = src_sel[..., :, j_idx] - src_sel[..., :, i_idx]
    dst_tims = dst_sel[..., :, j_idx] - dst_sel[..., :, i_idx]
    pv = tim_pair_valid(point_valid, m)

    inv_s = 1.0 / scale
    dst_tims = dst_tims * inv_s
    nb_rot = params.noise_bound * 2.0 * inv_s

    alg = params.rotation_estimation_algorithm
    rot_kw = dict(
        gnc_factor=params.rotation_gnc_factor,
        max_iterations=params.rotation_max_iterations,
        cost_threshold=params.rotation_cost_threshold,
        valid=pv,
    )
    if alg == RotationEstimationAlgorithm.GNC_TLS:
        rot = solve_rotation_gnc_tls(src_tims, dst_tims, nb_rot, **rot_kw)
    elif alg == RotationEstimationAlgorithm.FGR:
        rot = solve_rotation_fgr(src_tims, dst_tims, nb_rot, **rot_kw)
    else:
        rot = solve_rotation_quatro(src_tims, dst_tims, nb_rot, **rot_kw)

    aligned_src = scale * (rot.rotation @ src_sel)
    trans = solve_translation_tls(
        aligned_src, dst_sel, params.noise_bound, params.cbar2, valid=point_valid
    )

    rotation, translation = rot.rotation, trans.translation
    if params.final_polish:
        rotation, translation = _polish_rt(
            src_sel, dst_sel, scale, rotation, translation,
            trans.inliers & point_valid,
        )

    clique_size = jnp.sum(point_valid)
    return PipelineSolution(
        valid=clique_size > 1,
        scale=jnp.asarray(scale, src_sel.dtype),
        rotation=rotation,
        translation=translation,
        scale_pair_mask=jnp.zeros((0,), bool),
        clique_mask=point_valid,
        rotation_inlier_mask=rot.inliers,  # (M(M-1)/2,) over clique pair order
        translation_inlier_mask=trans.inliers,  # (M,) over clique point order
        rotation_cost=rot.cost,
        rotation_iterations=rot.iterations,
    )


def register_pair(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
    use_matmul_norms: bool = False,
) -> PipelineSolution:
    """Full fixed-shape solve: scale -> device clique -> rotation -> translation.

    Jittable end to end for NONE / KCORE_HEU / PMC_HEU inlier selection with
    the CHAIN rotation graph. ``valid`` masks padded correspondences.

    Known-scale fast path: when scale is fixed and a clique mode is active,
    the K-vector TIM norms are skipped entirely — the dense N x N TRIM
    adjacency is built directly with two Gram matmuls (no upper-triangle
    gathers), and the returned ``scale_pair_mask`` is empty (use
    :func:`scale_stage` when the per-pair mask itself is needed).
    """
    n = src.shape[-1]
    mode = params.resolved_inlier_selection_mode()
    if not params.estimate_scaling and mode != InlierSelectionMode.NONE:
        adj = trim_adjacency_dense(
            src, dst, params.noise_bound, params.cbar2, valid
        )
        clique_mask = device_clique_from_adjacency(adj, params, valid)
        scale = jnp.ones((), src.dtype)
        sol = rotation_translation_stage(src, dst, scale, clique_mask, params)
        return sol
    sc = scale_stage(src, dst, params, valid=valid, use_matmul_norms=use_matmul_norms)
    clique_mask = device_clique_stage(sc.pair_mask, n, params, valid=valid)
    sol = rotation_translation_stage(src, dst, sc.scale, clique_mask, params)
    return sol._replace(scale_pair_mask=sc.pair_mask)


@functools.partial(
    jax.jit, static_argnames=("params", "use_matmul_norms")
)
def register_pair_jit(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
    use_matmul_norms: bool = False,
) -> PipelineSolution:
    return register_pair(
        src, dst, params, valid=valid, use_matmul_norms=use_matmul_norms
    )


def register_batch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
    use_matmul_norms: bool = False,
) -> PipelineSolution:
    """vmapped batch of independent registrations, (B, 3, N) -> batched solution.

    The outermost organizing principle of the framework (SLAM scan-to-map
    style): the reference solves one problem per process; here a batch is one
    device program.
    """
    fn = lambda s, d, v: register_pair(
        s, d, params, valid=v, use_matmul_norms=use_matmul_norms
    )
    if valid is None:
        return jax.vmap(lambda s, d: fn(s, d, None))(src, dst)
    return jax.vmap(fn)(src, dst, valid)
