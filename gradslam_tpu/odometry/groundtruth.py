r"""Ground-truth odometry provider (parity with
``/root/reference/gradslam/odometry/groundtruth.py:10``)."""

from __future__ import annotations

from ..geometry.geometryutils import relative_transformation
from ..structures.rgbdimages import RGBDImages
from .base import OdometryProvider

__all__ = ["GroundTruthOdometryProvider"]


class GroundTruthOdometryProvider(OdometryProvider):
    r"""Relative transform ``T1^-1 @ T2`` between two posed frame batches
    (reference groundtruth.py:15-75)."""

    def provide(self, rgbdimages1: RGBDImages, rgbdimages2: RGBDImages):
        """Relative transform between two seq-len-1 posed frame batches:
        ``inv(poses1) @ poses2``, shape ``(B, 1, 4, 4)`` (reference
        groundtruth.py:15-75)."""
        if not isinstance(rgbdimages1, RGBDImages) or not isinstance(
            rgbdimages2, RGBDImages
        ):
            raise TypeError("Expected rgbdimages of type RGBDImages.")
        if rgbdimages1.shape[1] != 1 or rgbdimages2.shape[1] != 1:
            raise ValueError("Expected rgbdimages to have sequence length of 1.")
        if len(rgbdimages1) != len(rgbdimages2):
            raise ValueError(
                "Batch sizes of rgbdimages1 and rgbdimages2 must be equal "
                f"({len(rgbdimages1)} != {len(rgbdimages2)})."
            )
        if rgbdimages1.poses is None or rgbdimages2.poses is None:
            raise ValueError("Both rgbdimages must have poses.")
        return relative_transformation(rgbdimages1.poses, rgbdimages2.poses)
