r"""gradslam-tpu: a TPU-native differentiable dense SLAM framework.

Brand-new JAX/XLA/Pallas re-design of gradSLAM (gradslam/gradslam): fully
differentiable dense SLAM — nonlinear-least-squares solvers, differentiable
ICP, projective data association, point-based fusion — composed into
end-to-end pipelines (``ICPSLAM``, ``PointFusion``) such that gradients flow
from the outputs (map pointcloud, trajectory) back to the inputs (raw
color/depth, intrinsics, poses).

Public API mirrors the reference package root
(``/root/reference/gradslam/__init__.py:6-11``), minus the open3d import hack
(:1-2) — viz deps are imported lazily, never at package root.
"""

from . import metrics  # noqa: F401  (reference root does `from .metrics import *`)
from . import utils  # noqa: F401  (reference root does `from . import utils`)
from .geometry import *  # noqa: F401,F403
from .odometry import (  # noqa: F401
    GradICPOdometryProvider,
    GroundTruthOdometryProvider,
    ICPOdometryProvider,
    OdometryProvider,
)
from .slam import (  # noqa: F401
    ICPSLAM,
    PointFusion,
    perturbation_grid,
    relocalize,
    tracking_health,
)
from .structures import (  # noqa: F401
    Pointclouds,
    RGBDImages,
    pointclouds_from_rgbdimages,
)
from .version import __version__  # noqa: F401
