"""Trajectory / map-quality metrics (the module the reference ships as an
empty stub — /root/reference/gradslam/metrics/__init__.py, 0 LoC): ATE-RMSE
with Umeyama alignment, relative pose error, chamfer distance. All
differentiable."""

from .pointcloud import chamfer_distance
from .trajectory import align_trajectories, ate_rmse, rpe

__all__ = ["ate_rmse", "rpe", "align_trajectories", "chamfer_distance"]
