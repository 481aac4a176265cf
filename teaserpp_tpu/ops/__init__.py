"""Numerical building blocks: linalg helpers, weighted Procrustes, scalar TLS, TIMs."""

from teaserpp_tpu.ops.linalg import hatmap, vector_kron, get_nearest_psd
from teaserpp_tpu.ops.procrustes import svd_rot, svd_rot_2d, calculate_diameter
from teaserpp_tpu.ops.tls import scalar_tls
from teaserpp_tpu.ops.tims import (
    upper_tri_indices,
    compute_tims,
    compute_tim_norms,
    chain_tims,
)

__all__ = [
    "hatmap",
    "vector_kron",
    "get_nearest_psd",
    "svd_rot",
    "svd_rot_2d",
    "calculate_diameter",
    "scalar_tls",
    "upper_tri_indices",
    "compute_tims",
    "compute_tim_norms",
    "chain_tims",
]
