"""Parameter structs for the registration engine.

Frozen, hashable dataclasses so they can ride through ``jax.jit`` as static
arguments. Field names and defaults mirror the reference parameter structs so
a TEASER++ user can move over without relearning the config surface:

  * ``RobustRegistrationSolverParams``  <- reference registration.h:419-514
  * ``MaxCliqueSolverParams``           <- reference graph.h:233-262
  * ``GNCRotationSolverParams``         <- reference registration.h:223-228
  * ``DRSCertifierParams``              <- reference certification.h:69-101
"""

from __future__ import annotations

import dataclasses
import enum


class RotationEstimationAlgorithm(enum.IntEnum):
    """GNC rotation estimation algorithm (reference registration.h:382-386)."""

    GNC_TLS = 0
    FGR = 1
    QUATRO = 2


class InlierSelectionMode(enum.IntEnum):
    """Graph-based inlier selection algorithm (reference registration.h:396-401).

    PMC_EXACT / PMC_HEU keep the reference's names for API familiarity; in this
    framework they are backed by our own native C++ branch-and-bound and the
    on-device greedy clique search, respectively — not by the PMC library.
    """

    PMC_EXACT = 0
    PMC_HEU = 1
    KCORE_HEU = 2
    NONE = 3


class InlierGraphFormulation(enum.IntEnum):
    """TIM graph handed to the GNC rotation solver (reference registration.h:409-412)."""

    CHAIN = 0
    COMPLETE = 1


class CliqueSolverMode(enum.IntEnum):
    """Max-clique solver mode (reference graph.h:224-228)."""

    PMC_EXACT = 0
    PMC_HEU = 1
    KCORE_HEU = 2


class EigSolverType(enum.IntEnum):
    """Eigendecomposition backend for certification (reference certification.h:61-64).

    Both map to XLA ``eigh`` here; ITERATIVE selects a Lanczos path for large
    problems (the analog of the reference's Spectra option).
    """

    DENSE = 0
    ITERATIVE = 1


# Reference-style aliases.
EIG_SOLVER_TYPE = EigSolverType


@dataclasses.dataclass(frozen=True)
class GNCRotationSolverParams:
    """Params shared by the GNC rotation solvers (reference registration.h:223-228)."""

    max_iterations: int = 100
    cost_threshold: float = 1e-6
    gnc_factor: float = 1.4
    noise_bound: float = 0.01

    def replace(self, **kw) -> "GNCRotationSolverParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MaxCliqueSolverParams:
    """Params for the max-clique inlier selector (reference graph.h:233-262)."""

    solver_mode: CliqueSolverMode = CliqueSolverMode.PMC_EXACT
    # Terminate the exact search after this many seconds and return the best
    # clique found so far (reference graph.h:256 default 3600 s).
    time_limit: float = 3600.0
    # If the graph's max core number exceeds this fraction of the vertex count,
    # KCORE_HEU mode returns the top k-core directly (reference graph.h:247).
    kcore_heuristic_threshold: float = 1.0
    num_threads: int = 1
    # Number of parallel greedy-expansion seeds for the on-device heuristic
    # clique search (our analog of PMC's heuristic; no reference equivalent).
    heuristic_num_seeds: int = 64
    # Vertex count above which PMC_EXACT switches from the dense-bitset
    # branch-and-bound to the sparse CSR search (reference graph.cc:43
    # hardcodes adj_limit = 20000 for the same dense/sparse switch).
    adj_limit: int = 20000

    def replace(self, **kw) -> "MaxCliqueSolverParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class RobustRegistrationSolverParams:
    """Params for the robust registration solver (reference registration.h:419-514)."""

    noise_bound: float = 0.01
    cbar2: float = 1.0
    estimate_scaling: bool = True
    rotation_estimation_algorithm: RotationEstimationAlgorithm = (
        RotationEstimationAlgorithm.GNC_TLS
    )
    rotation_gnc_factor: float = 1.4
    rotation_max_iterations: int = 100
    rotation_cost_threshold: float = 1e-6
    rotation_tim_graph: InlierGraphFormulation = InlierGraphFormulation.CHAIN
    inlier_selection_mode: InlierSelectionMode = InlierSelectionMode.PMC_EXACT
    kcore_heuristic_threshold: float = 0.5
    # Deprecated in the reference (registration.h:497,503); honored for parity:
    # use_max_clique=False forces NONE, max_clique_exact_solution=False forces
    # PMC_HEU (reference registration.cc:574-583).
    use_max_clique: bool = True
    max_clique_exact_solution: bool = True
    max_clique_time_limit: float = 3600.0
    max_clique_num_threads: int = 0
    # Seeds for the on-device heuristic clique search (ours; no reference field).
    max_clique_heuristic_seeds: int = 64
    # Final joint weighted-Procrustes re-fit of (R, t) on the translation-
    # inlier points (ours; no reference field). Statistically tighter than
    # the chain-TIM estimate at small inlier counts (e.g. 95%+ outlier
    # rates); off by default so solutions stay bit-comparable with the
    # reference's MATLAB estimates in the golden-parity tests.
    final_polish: bool = False

    def replace(self, **kw) -> "RobustRegistrationSolverParams":
        return dataclasses.replace(self, **kw)

    def resolved_inlier_selection_mode(self) -> InlierSelectionMode:
        """Apply the deprecated-field overrides (reference registration.cc:574-583)."""
        if not self.use_max_clique:
            return InlierSelectionMode.NONE
        if not self.max_clique_exact_solution and self.inlier_selection_mode not in (
            InlierSelectionMode.NONE,
        ):
            return InlierSelectionMode.PMC_HEU
        return self.inlier_selection_mode


@dataclasses.dataclass(frozen=True)
class DRSCertifierParams:
    """Params for the DRS optimality certifier (reference certification.h:69-101)."""

    noise_bound: float = 0.01
    cbar2: float = 1.0
    sub_optimality: float = 1e-3
    max_iterations: int = 200
    gamma_tau: float = 1.999999
    eig_decomposition_solver: EigSolverType = EigSolverType.DENSE
    # ITERATIVE-mode knobs (no reference analog — the reference's Spectra
    # path, certification.cc:198-218, only covers the gap eigenvalue; here
    # ITERATIVE replaces the per-iteration dense eigh of the PSD projection
    # with warm-started shift-invert subspace iteration, the large-N path):
    # subspace rank (0 = auto: npm // 4, comfortably above the peak negative
    # count observed at ~npm/8) and inner solve count per DRS iteration.
    psd_projection_rank: int = 0
    psd_projection_solves: int = 2
    # ITERATIVE mode: max DRS iterations per device dispatch. 0 = auto
    # (single dispatch off-TPU; short segments on the tunneled axon backend,
    # where a ~48-minute N=1000 DRS execution crashed the worker and left it
    # degraded — see PERFORMANCE.md. Short dispatches bound the blast radius
    # and give host-side recovery points). Chunking is bit-identical to a
    # single dispatch: the while_loop state stays in device memory between
    # dispatches.
    iterations_per_dispatch: int = 0

    def replace(self, **kw) -> "DRSCertifierParams":
        return dataclasses.replace(self, **kw)
