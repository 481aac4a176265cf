"""Geometry containers, error metrics, and misc helpers."""

from teaserpp_tpu.utils.geometry import PointXYZ, PointCloud
from teaserpp_tpu.utils.metrics import angular_error, rotation_error_deg

__all__ = ["PointXYZ", "PointCloud", "angular_error", "rotation_error_deg"]
