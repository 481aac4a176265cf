"""Feature front-end: normals, FPFH descriptors, correspondence matching.

TPU-native replacement for reference fpfh.{h,cc} (PCL-backed) and
matcher.{h,cc} (FLANN-backed): dense-mask neighborhood math on the MXU, the
batched Jacobi eigensolver for normals, exact matmul nearest neighbors.
"""

from teaserpp_tpu.features.normals import (
    estimate_normals,
    estimate_normals_pruned,
    radius_neighbor_mask,
)
from teaserpp_tpu.features.fpfh import (
    FPFHEstimation,
    compute_fpfh,
    compute_fpfh_features,
    compute_fpfh_pruned,
)
from teaserpp_tpu.features.spatial import NeighborPlan, build_neighbor_plans
from teaserpp_tpu.features.matcher import Matcher

__all__ = [
    "estimate_normals",
    "estimate_normals_pruned",
    "radius_neighbor_mask",
    "FPFHEstimation",
    "compute_fpfh",
    "compute_fpfh_features",
    "compute_fpfh_pruned",
    "NeighborPlan",
    "build_neighbor_plans",
    "Matcher",
]
