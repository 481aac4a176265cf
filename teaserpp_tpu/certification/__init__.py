"""Optimality certification (Douglas-Rachford-splitting SDP dual solver).

TPU-native replacement for reference certification.{h,cc}.
"""

from teaserpp_tpu.certification.drs import (
    DRSCertifier,
    CertificationResult,
    certify_checkpointed,
    quat_from_rotation,
    get_q_cost,
    get_omega_1,
    get_block_diag_omega,
    get_lambda_guess,
    apply_inverse_map,
    optimal_dual_projection,
    suboptimality_gap,
)
from teaserpp_tpu.params import DRSCertifierParams, EigSolverType

__all__ = [
    "DRSCertifier",
    "CertificationResult",
    "certify_checkpointed",
    "DRSCertifierParams",
    "EigSolverType",
    "quat_from_rotation",
    "get_q_cost",
    "get_omega_1",
    "get_block_diag_omega",
    "get_lambda_guess",
    "apply_inverse_map",
    "optimal_dual_projection",
    "suboptimality_gap",
]
