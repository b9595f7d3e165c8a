from .pointcloud import chamfer_distance
from .trajectory import ate_rmse, rpe

__all__ = ["ate_rmse", "rpe", "chamfer_distance"]
