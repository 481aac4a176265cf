"""Error metrics (parity with reference test/test-tools/test_utils.h:92)."""

from __future__ import annotations

import numpy as np


def angular_error(r_est, r_ref) -> float:
    """Geodesic rotation error in radians: arccos((tr(R_ref^T R_est) - 1) / 2)."""
    r_est = np.asarray(r_est, dtype=np.float64)
    r_ref = np.asarray(r_ref, dtype=np.float64)
    c = (np.trace(r_ref.T @ r_est) - 1.0) / 2.0
    return float(np.arccos(np.clip(c, -1.0, 1.0)))


def rotation_error_deg(r_est, r_ref) -> float:
    return float(np.degrees(angular_error(r_est, r_ref)))


def translation_error(t_est, t_ref) -> float:
    return float(np.linalg.norm(np.asarray(t_est) - np.asarray(t_ref)))
