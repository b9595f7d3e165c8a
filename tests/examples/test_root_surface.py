"""Package-root surface parity: the reference root binds every subsystem as
an attribute of ``gradslam`` (/root/reference/gradslam/__init__.py:6-11 —
``from .metrics import *`` / ``from . import utils`` make ``gradslam.metrics``
and ``gradslam.utils`` resolvable without extra imports). A reference user's
``gs.metrics.…`` must work here too."""

import gradslam_tpu as gs


def test_root_submodule_attributes():
    # One attribute per reference-root binding (geometry/structures/odometry/
    # slam are covered by the symbol re-export tests elsewhere).
    assert callable(gs.metrics.ate_rmse)
    assert callable(gs.metrics.rpe)
    assert callable(gs.metrics.chamfer_distance)
    assert callable(gs.utils.save_state)
    assert callable(gs.utils.annotate)
    assert isinstance(gs.__version__, str)


def test_root_class_reexports():
    for name in (
        "RGBDImages",
        "Pointclouds",
        "ICPSLAM",
        "PointFusion",
        "OdometryProvider",
        "GroundTruthOdometryProvider",
        "ICPOdometryProvider",
        "GradICPOdometryProvider",
        "pointclouds_from_rgbdimages",
    ):
        assert hasattr(gs, name), name
