"""Feature front-end: normals, FPFH descriptors, correspondence matching.

TPU-native replacement for reference fpfh.{h,cc} (PCL-backed) and
matcher.{h,cc} (FLANN-backed): dense-mask neighborhood math on the MXU, the
batched Jacobi eigensolver for normals, exact matmul nearest neighbors.
"""

from teaserpp_tpu.features.normals import estimate_normals, radius_neighbor_mask
from teaserpp_tpu.features.fpfh import (
    FPFHEstimation,
    compute_fpfh,
    compute_fpfh_features,
)
from teaserpp_tpu.features.matcher import Matcher

__all__ = [
    "estimate_normals",
    "radius_neighbor_mask",
    "FPFHEstimation",
    "compute_fpfh",
    "compute_fpfh_features",
    "Matcher",
]
