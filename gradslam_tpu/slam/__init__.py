from .fusionutils import (
    prune_map,
    update_map_aggregate,
    update_map_fusion,
    voxel_downsample,
)
from .health import tracking_health
from .icpslam import ICPSLAM
from .pointfusion import PointFusion

__all__ = [
    "ICPSLAM",
    "PointFusion",
    "update_map_fusion",
    "update_map_aggregate",
    "prune_map",
    "voxel_downsample",
    "tracking_health",
]
