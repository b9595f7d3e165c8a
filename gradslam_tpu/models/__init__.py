r"""Model-family namespace: the SLAM pipelines are this framework's "models"
(alias of :mod:`gradslam_tpu.slam` — kept for discoverability in frameworks
where pipelines live under ``models/``)."""

from ..odometry import (
    GradICPOdometryProvider,
    GroundTruthOdometryProvider,
    ICPOdometryProvider,
)
from ..slam import ICPSLAM, PointFusion

__all__ = [
    "ICPSLAM",
    "PointFusion",
    "GroundTruthOdometryProvider",
    "ICPOdometryProvider",
    "GradICPOdometryProvider",
]
