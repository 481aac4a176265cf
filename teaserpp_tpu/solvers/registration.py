"""Host-facing robust registration solver with the reference's API surface.

``RobustRegistrationSolver`` mirrors the reference orchestrator
(registration.h:361-957 / registration.cc:473-762) and its Python binding
surface (teaserpp_python.cc:82-177): ``solve``, ``getSolution``, and the full
introspection getter family (inlier masks/maps, TIMs, max clique, inlier
graph). Internally it drives the jitted fixed-shape stages of
``solvers/pipeline.py`` and the clique subsystem; the batched/sharded
performance paths live in ``teaserpp_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.params import (
    InlierGraphFormulation,
    InlierSelectionMode,
    CliqueSolverMode,
    MaxCliqueSolverParams,
    RobustRegistrationSolverParams,
)
from teaserpp_tpu.ops.tims import compute_tims, upper_tri_indices
from teaserpp_tpu.solvers import pipeline as _pipe
from teaserpp_tpu.clique.graph import Graph, MaxCliqueSolver, adjacency_from_pair_mask
from teaserpp_tpu.utils.diagnostics import debug_error_msg


@dataclasses.dataclass
class RegistrationSolution:
    """Solution to a registration problem (reference registration.h:25-38)."""

    valid: bool = True
    scale: float = 1.0
    translation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3)
    )
    rotation: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))

    def __repr__(self) -> str:
        return (
            f"RegistrationSolution(valid={self.valid}, scale={self.scale}, "
            f"translation={self.translation.tolist()}, "
            f"rotation={self.rotation.tolist()})"
        )


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class RobustRegistrationSolver:
    """Decoupled scale/rotation/translation robust registration solver.

    Accepts either a :class:`RobustRegistrationSolverParams` or keyword
    arguments with the same names. The compute path is JAX; arrays returned
    by getters are numpy, shaped exactly as the reference's getters.
    """

    # Reference-style nested aliases (registration.h:382-412).
    from teaserpp_tpu.params import (  # noqa: F401
        RotationEstimationAlgorithm as ROTATION_ESTIMATION_ALGORITHM,
        InlierSelectionMode as INLIER_SELECTION_MODE,
        InlierGraphFormulation as INLIER_GRAPH_FORMULATION,
    )

    def __init__(self, params: Optional[RobustRegistrationSolverParams] = None, **kw):
        if params is None:
            params = RobustRegistrationSolverParams(**kw)
        elif kw:
            params = params.replace(**kw)
        # Pluggable stage estimators (reference setScale/Rotation/
        # TranslationEstimator, registration.h:623-644). None = the built-in
        # jitted stage. These survive reset(), like the reference's member
        # solver objects survive solve().
        self._scale_estimator = None
        self._rotation_estimator = None
        self._translation_estimator = None
        self.reset(params)

    # ------------------------------------------------- pluggable estimators
    def setScaleEstimator(self, estimator) -> None:
        """Replace the scale stage (reference registration.h:623-629).

        ``estimator(src_tims (3, K), dst_tims (3, K)) -> (scale: float,
        pair_inliers: (K,) bool)`` over the upper-triangle TIM pair order of
        :meth:`getScaleInliersMap`. Pass ``None`` to restore the built-in.
        """
        self._scale_estimator = estimator

    def setRotationEstimator(self, estimator) -> None:
        """Replace the rotation stage (reference registration.h:631-638).

        ``estimator(src_tims (3, M), dst_tims (3, M)) -> (rotation (3, 3),
        inliers (M,) bool, cost: float)``; ``dst_tims`` arrive de-scaled by
        the scale estimate, as in the reference (registration.cc:697-704).
        """
        self._rotation_estimator = estimator

    def setTranslationEstimator(self, estimator) -> None:
        """Replace the translation stage (reference registration.h:640-644).

        ``estimator(src (3, M), dst (3, M)) -> (translation (3,),
        inliers (M,) bool)`` on the scale*R-aligned clique points.
        """
        self._translation_estimator = estimator

    # ------------------------------------------------------------------ reset
    def reset(self, params: RobustRegistrationSolverParams) -> None:
        """Reset params and clear all cached solve state (registration.h:830-908)."""
        self.params = params
        from teaserpp_tpu.utils.timing import StageTimer

        # Per-stage wall timings of the last solve — compiled-in observability
        # (the reference gates chrono macros behind TEASER_DIAG_PRINT;
        # here it's always available via getStageTimings()).
        self._timer = StageTimer()
        self._solution = RegistrationSolution(valid=False)
        self._n = 0
        self._src = None
        self._dst = None
        self._scale_pair_mask = None  # (K,) bool np
        self._max_clique: List[int] = []
        self._inlier_graph: Optional[Graph] = None
        self._rotation_inliers_mask = np.zeros((0,), bool)
        self._translation_inliers_mask = np.zeros((0,), bool)
        self._rotation_cost = float("nan")
        self._src_tims = None
        self._dst_tims = None
        self._pruned_src_tims = None
        self._pruned_dst_tims = None
        self._tims_map_rotation = np.zeros((2, 0), np.int32)

    def getParams(self) -> RobustRegistrationSolverParams:
        return self.params

    # ------------------------------------------------------------------ solve
    def solve(self, src, dst, correspondences: Optional[Sequence] = None):
        """Solve for scale, rotation, translation.

        Either ``solve(src_3xN, dst_3xN)`` on correspondence matrices
        (reference registration.cc:568) or
        ``solve(src_cloud, dst_cloud, correspondences)`` on point clouds plus
        an index-pair list (reference registration.cc:553).
        """
        if correspondences is not None:
            src = _gather_correspondences(src, correspondences, side=0)
            dst = _gather_correspondences(dst, correspondences, side=1)
        src = np.asarray(src, dtype=np.float64)
        dst = np.asarray(dst, dtype=np.float64)
        assert src.shape[0] == 3 and dst.shape[0] == 3, "inputs must be 3xN"
        assert src.shape == dst.shape, "src/dst correspondence counts differ"

        dtype = _default_dtype()
        n = src.shape[1]
        self.reset(self.params)
        self._n = n
        self._src = src
        self._dst = dst
        src_d = jnp.asarray(src, dtype)
        dst_d = jnp.asarray(dst, dtype)

        params = self.params
        mode = params.resolved_inlier_selection_mode()

        # ---- scale stage (TIM norms + TLS scale / TRIM selector)
        with self._timer.stage("scale"):
            if self._scale_estimator is not None:
                scale, pair_mask = self._scale_estimator(
                    self.getSrcTIMs(), self.getDstTIMs()
                )
                scale = float(scale)
                self._scale_pair_mask = np.asarray(pair_mask, bool)
                pair_mask_d = jnp.asarray(self._scale_pair_mask)
            else:
                sc = _scale_stage_jit(src_d, dst_d, params)
                scale = float(sc.scale)
                self._scale_pair_mask = np.asarray(sc.pair_mask)
                pair_mask_d = sc.pair_mask
        self._solution.scale = scale

        # ---- clique stage
        if mode != InlierSelectionMode.NONE:
            with self._timer.stage("clique"):
                adj = np.asarray(adjacency_from_pair_mask(pair_mask_d, n))
                self._inlier_graph = Graph(adj)
                clique_params = MaxCliqueSolverParams(
                    solver_mode=CliqueSolverMode(
                        {
                            InlierSelectionMode.PMC_EXACT: CliqueSolverMode.PMC_EXACT,
                            InlierSelectionMode.PMC_HEU: CliqueSolverMode.PMC_HEU,
                            InlierSelectionMode.KCORE_HEU: CliqueSolverMode.KCORE_HEU,
                        }[mode]
                    ),
                    time_limit=params.max_clique_time_limit,
                    kcore_heuristic_threshold=params.kcore_heuristic_threshold,
                    num_threads=params.max_clique_num_threads,
                    heuristic_num_seeds=params.max_clique_heuristic_seeds,
                )
                self._max_clique = sorted(
                    MaxCliqueSolver(clique_params).findMaxClique(self._inlier_graph)
                )
            if len(self._max_clique) <= 1:
                # Degenerate clique: abort (reference registration.cc:643-647,
                # which logs the same diagnostic before returning).
                debug_error_msg(
                    "Clique size too small. Abort and return an invalid solution."
                )
                self._solution.valid = False
                return self._solution
        else:
            self._max_clique = list(range(n))

        clique = np.asarray(self._max_clique, np.int32)

        # ---- rotation + translation stage
        rt_ctx = self._timer.stage("rotation_translation")
        rt_ctx.__enter__()
        if self._rotation_estimator is not None or self._translation_estimator is not None:
            self._solve_rt_custom(src, dst, scale, clique, params)
            rt_ctx.__exit__(None, None, None)
            return self._solution
        if params.rotation_tim_graph == InlierGraphFormulation.CHAIN:
            clique_mask = np.zeros(n, bool)
            clique_mask[clique] = True
            sol = _rt_chain_jit(
                src_d, dst_d, jnp.asarray(scale, dtype), jnp.asarray(clique_mask),
                params,
            )
            # Compact padded per-root masks to clique order for getter parity.
            rot_mask_padded = np.asarray(sol.rotation_inlier_mask)
            self._rotation_inliers_mask = rot_mask_padded[clique]
            trans_mask_padded = np.asarray(sol.translation_inlier_mask)
            self._translation_inliers_mask = trans_mask_padded[clique]
            leaf = np.roll(clique, -1)
            self._tims_map_rotation = np.stack([leaf, clique]).astype(np.int32)
            self._pruned_src_tims = (src[:, leaf] - src[:, clique]).astype(np.float64)
            self._pruned_dst_tims = (
                (dst[:, leaf] - dst[:, clique]) / scale
            ).astype(np.float64)
        else:
            # COMPLETE formulation: gather clique points, pad to a bucket size
            # to bound recompiles, run the dense-TIM stage.
            m = len(clique)
            m_pad = max(_round_up(m, 32), 2)
            sel = np.zeros((3, m_pad))
            sel_dst = np.zeros((3, m_pad))
            sel[:, :m] = src[:, clique]
            sel_dst[:, :m] = dst[:, clique]
            point_valid = np.zeros(m_pad, bool)
            point_valid[:m] = True
            sol = _rt_complete_jit(
                jnp.asarray(sel, dtype),
                jnp.asarray(sel_dst, dtype),
                jnp.asarray(point_valid),
                jnp.asarray(scale, dtype),
                params,
            )
            i_idx, j_idx = upper_tri_indices(m_pad)
            pair_valid = point_valid[i_idx] & point_valid[j_idx]
            self._rotation_inliers_mask = np.asarray(sol.rotation_inlier_mask)[
                pair_valid
            ]
            self._translation_inliers_mask = np.asarray(
                sol.translation_inlier_mask
            )[:m]
            ci, cj = upper_tri_indices(m)
            self._tims_map_rotation = np.stack(
                [clique[cj], clique[ci]]
            ).astype(np.int32)
            self._pruned_src_tims = (sel[:, cj] - sel[:, ci]).astype(np.float64)
            self._pruned_dst_tims = (
                (sel_dst[:, cj] - sel_dst[:, ci]) / scale
            ).astype(np.float64)

        self._rotation_cost = float(sol.rotation_cost)
        self._solution.valid = True
        self._solution.rotation = np.asarray(sol.rotation, np.float64)
        self._solution.translation = np.asarray(sol.translation, np.float64)
        rt_ctx.__exit__(None, None, None)
        return self._solution

    def _solve_rt_custom(self, src, dst, scale, clique, params) -> None:
        """Rotation+translation with user-plugged estimators.

        Mirrors the built-in path (reference registration.cc:657-731):
        pruned TIMs per the TIM-graph formulation, dst TIMs de-scaled, custom
        or default solvers per stage, masks stored for the getters.
        """
        if params.rotation_tim_graph == InlierGraphFormulation.CHAIN:
            leaf = np.roll(clique, -1)
            src_tims_p = src[:, leaf] - src[:, clique]
            dst_tims_p = (dst[:, leaf] - dst[:, clique]) / scale
            self._tims_map_rotation = np.stack([leaf, clique]).astype(np.int32)
        else:
            ci, cj = upper_tri_indices(len(clique))
            sel, sel_dst = src[:, clique], dst[:, clique]
            src_tims_p = sel[:, cj] - sel[:, ci]
            dst_tims_p = (sel_dst[:, cj] - sel_dst[:, ci]) / scale
            self._tims_map_rotation = np.stack(
                [clique[cj], clique[ci]]
            ).astype(np.int32)
        self._pruned_src_tims = src_tims_p.astype(np.float64)
        self._pruned_dst_tims = dst_tims_p.astype(np.float64)

        dtype = _default_dtype()
        nb_rot = params.noise_bound * 2.0 / scale
        if self._rotation_estimator is not None:
            r, rot_inliers, cost = self._rotation_estimator(src_tims_p, dst_tims_p)
        else:
            from teaserpp_tpu.solvers.rotation import (
                solve_rotation_fgr,
                solve_rotation_gnc_tls,
                solve_rotation_quatro,
            )
            from teaserpp_tpu.params import RotationEstimationAlgorithm as _RA

            fn = {
                _RA.GNC_TLS: solve_rotation_gnc_tls,
                _RA.FGR: solve_rotation_fgr,
                _RA.QUATRO: solve_rotation_quatro,
            }[params.rotation_estimation_algorithm]
            rr = fn(
                jnp.asarray(src_tims_p, dtype), jnp.asarray(dst_tims_p, dtype),
                nb_rot,
                gnc_factor=params.rotation_gnc_factor,
                max_iterations=params.rotation_max_iterations,
                cost_threshold=params.rotation_cost_threshold,
            )
            r, rot_inliers, cost = rr.rotation, rr.inliers, rr.cost
        r = np.asarray(r, np.float64)
        self._rotation_inliers_mask = np.asarray(rot_inliers, bool)
        self._rotation_cost = float(cost)

        aligned = scale * (r @ src[:, clique])
        if self._translation_estimator is not None:
            t, trans_inliers = self._translation_estimator(aligned, dst[:, clique])
        else:
            from teaserpp_tpu.solvers.translation import solve_translation_tls

            tr = solve_translation_tls(
                jnp.asarray(aligned, dtype), jnp.asarray(dst[:, clique], dtype),
                params.noise_bound, params.cbar2,
            )
            t, trans_inliers = tr.translation, tr.inliers
        self._translation_inliers_mask = np.asarray(trans_inliers, bool)
        self._solution.valid = True
        self._solution.rotation = r
        self._solution.translation = np.asarray(t, np.float64)

    def getStageTimings(self) -> dict:
        """Wall-clock seconds per stage of the last solve (always collected;
        the reference's analog is compile-gated TEASER_DEBUG_*_TIMING macros)."""
        return self._timer.as_dict()

    # --------------------------------------------------------------- getters
    def getSolution(self) -> RegistrationSolution:
        return self._solution

    @property
    def solution(self) -> RegistrationSolution:
        return self._solution

    def getGNCRotationCostAtTermination(self) -> float:
        return self._rotation_cost

    gnc_rotation_cost_at_termination = property(getGNCRotationCostAtTermination)

    def getScaleInliersMask(self) -> np.ndarray:
        """(K,) bool mask over TIM pairs (reference registration.h:651-653)."""
        return self._scale_pair_mask

    scale_inliers_mask = property(getScaleInliersMask)

    def getScaleInliersMap(self) -> np.ndarray:
        """2xK pair index map (reference registration.h:661)."""
        i_idx, j_idx = upper_tri_indices(self._n)
        return np.stack([i_idx, j_idx]).astype(np.int32)

    scale_inliers_map = property(getScaleInliersMap)

    def getScaleInliers(self) -> List[Tuple[int, int]]:
        i_idx, j_idx = upper_tri_indices(self._n)
        sel = self._scale_pair_mask
        return list(zip(i_idx[sel].tolist(), j_idx[sel].tolist()))

    scale_inliers = property(getScaleInliers)

    def getRotationInliersMask(self) -> np.ndarray:
        return self._rotation_inliers_mask

    rotation_inliers_mask = property(getRotationInliersMask)

    def getRotationInliersMap(self) -> np.ndarray:
        return np.asarray(self._max_clique, np.int32)

    def getRotationInliers(self) -> List[int]:
        return np.nonzero(self._rotation_inliers_mask)[0].tolist()

    rotation_inliers = property(getRotationInliers)

    def getTranslationInliersMask(self) -> np.ndarray:
        return self._translation_inliers_mask

    translation_inliers_mask = property(getTranslationInliersMask)

    def getTranslationInliersMap(self) -> np.ndarray:
        return np.asarray(self._max_clique, np.int32)

    translation_inliers_map = property(getTranslationInliersMap)

    def getTranslationInliers(self) -> List[int]:
        return np.nonzero(self._translation_inliers_mask)[0].tolist()

    translation_inliers = property(getTranslationInliers)

    def getInputOrderedTranslationInliers(self) -> List[int]:
        """Translation inliers as original input indices (registration.h:757-768)."""
        return [self._max_clique[i] for i in self.getTranslationInliers()]

    def getInlierMaxClique(self) -> List[int]:
        return list(self._max_clique)

    inlier_max_clique = property(getInlierMaxClique)

    def getInlierGraph(self) -> List[List[int]]:
        if self._inlier_graph is None:
            return []
        return [self._inlier_graph.getEdges(v) for v in range(self._n)]

    inlier_graph = property(getInlierGraph)

    def getSrcTIMs(self) -> np.ndarray:
        if self._src_tims is None and self._src is not None:
            self._src_tims = np.asarray(compute_tims(jnp.asarray(self._src)))
        return self._src_tims

    src_tims = property(getSrcTIMs)

    def getDstTIMs(self) -> np.ndarray:
        if self._dst_tims is None and self._dst is not None:
            self._dst_tims = np.asarray(compute_tims(jnp.asarray(self._dst)))
        return self._dst_tims

    dst_tims = property(getDstTIMs)

    def getMaxCliqueSrcTIMs(self) -> np.ndarray:
        return self._pruned_src_tims

    max_clique_src_tims = property(getMaxCliqueSrcTIMs)

    def getMaxCliqueDstTIMs(self) -> np.ndarray:
        return self._pruned_dst_tims

    max_clique_dst_tims = property(getMaxCliqueDstTIMs)

    def getSrcTIMsMap(self) -> np.ndarray:
        return self.getScaleInliersMap()

    src_tims_map = property(getSrcTIMsMap)

    def getDstTIMsMap(self) -> np.ndarray:
        return self.getScaleInliersMap()

    dst_tims_map = property(getDstTIMsMap)

    def getSrcTIMsMapForRotation(self) -> np.ndarray:
        return self._tims_map_rotation

    src_tims_map_for_rotation = property(getSrcTIMsMapForRotation)

    def getDstTIMsMapForRotation(self) -> np.ndarray:
        return self._tims_map_rotation

    dst_tims_map_for_rotation = property(getDstTIMsMapForRotation)


def _gather_correspondences(cloud, correspondences, side: int) -> np.ndarray:
    """Gather correspondence endpoints into a 3xK matrix (registration.cc:557-564)."""
    pts = np.asarray(getattr(cloud, "points", cloud), dtype=np.float64)
    if pts.ndim == 2 and pts.shape[0] != 3 and pts.shape[1] == 3:
        pts = pts.T
    idx = np.asarray([c[side] for c in correspondences], dtype=np.int64)
    return pts[:, idx]


# Jitted stage wrappers (params are hashable static args).
_scale_stage_jit = jax.jit(_pipe.scale_stage, static_argnames=("params",))
_rt_chain_jit = jax.jit(
    _pipe.rotation_translation_stage, static_argnames=("params",)
)
_rt_complete_jit = jax.jit(
    _pipe.rotation_translation_complete, static_argnames=("params",)
)
