"""Robust solver stages: scale, rotation (GNC family), translation, orchestrator."""

from teaserpp_tpu.solvers.scale import solve_scale_tls, select_scale_inliers
from teaserpp_tpu.solvers.rotation import (
    solve_rotation_gnc_tls,
    solve_rotation_fgr,
    solve_rotation_quatro,
)
from teaserpp_tpu.solvers.translation import solve_translation_tls

__all__ = [
    "solve_scale_tls",
    "select_scale_inliers",
    "solve_rotation_gnc_tls",
    "solve_rotation_fgr",
    "solve_rotation_quatro",
    "solve_translation_tls",
]
