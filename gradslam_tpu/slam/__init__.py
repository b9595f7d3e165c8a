from .fusionutils import (
    prune_map,
    update_map_aggregate,
    update_map_fusion,
    voxel_downsample,
)
from .health import keyframe_anchor, tracking_health
from .icpslam import ICPSLAM
from .pointfusion import PointFusion
from .relocalize import perturbation_grid, relocalize

__all__ = [
    "ICPSLAM",
    "PointFusion",
    "update_map_fusion",
    "update_map_aggregate",
    "prune_map",
    "voxel_downsample",
    "tracking_health",
    "keyframe_anchor",
    "perturbation_grid",
    "relocalize",
]
