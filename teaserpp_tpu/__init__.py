"""teaserpp_tpu — a TPU-native certifiably-robust point-cloud registration engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
MIT-SPARK/TEASER-plusplus (reference surveyed in SURVEY.md): robust 3D
registration ``dst = s * R * src + t`` from correspondence sets with extreme
(90-99%) outlier rates, via scale/rotation/translation decoupling over
Translation-Invariant Measurements, maximum-clique inlier selection on the
consistency graph, Graduated Non-Convexity rotation solvers, and a
Douglas-Rachford-splitting optimality certifier.

Design principles (TPU-first, not a port):
  * every solver stage is fixed-shape and mask-based, so the full pipeline
    jits, vmaps over batches of independent registrations, and shards over
    a ``jax.sharding.Mesh`` for single huge problems;
  * the adaptive-voting scalar TLS is a sort + prefix-scan, not a sweep loop;
  * the consistency graph lives as a dense bitset/bool adjacency matrix and
    the k-core / heuristic clique searches are vectorized device code;
  * the exact max-clique fallback is a native C++ branch-and-bound (our
    equivalent of the reference's PMC library) reached through ctypes.
"""

from teaserpp_tpu.params import (
    RobustRegistrationSolverParams,
    RotationEstimationAlgorithm,
    InlierSelectionMode,
    InlierGraphFormulation,
    MaxCliqueSolverParams,
    GNCRotationSolverParams,
)
from teaserpp_tpu.solvers.registration import (
    RegistrationSolution,
    RobustRegistrationSolver,
)
from teaserpp_tpu.certification import (
    CertificationResult,
    DRSCertifier,
    DRSCertifierParams,
    EigSolverType,
)

# Reference-compatible aliases (mirrors python/teaserpp_python/__init__.py:17-20
# in the reference, which re-exports the enums at module scope).
ROTATION_ESTIMATION_ALGORITHM = RotationEstimationAlgorithm
INLIER_SELECTION_MODE = InlierSelectionMode
INLIER_GRAPH_FORMULATION = InlierGraphFormulation

__version__ = "0.1.0"

__all__ = [
    "RobustRegistrationSolver",
    "RobustRegistrationSolverParams",
    "RegistrationSolution",
    "RotationEstimationAlgorithm",
    "InlierSelectionMode",
    "InlierGraphFormulation",
    "MaxCliqueSolverParams",
    "GNCRotationSolverParams",
    "ROTATION_ESTIMATION_ALGORITHM",
    "INLIER_SELECTION_MODE",
    "INLIER_GRAPH_FORMULATION",
    "DRSCertifier",
    "DRSCertifierParams",
    "CertificationResult",
    "EigSolverType",
]
