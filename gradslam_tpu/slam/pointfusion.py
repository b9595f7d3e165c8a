r"""PointFusion pipeline (TPU-native).

Parity with ``/root/reference/gradslam/slam/pointfusion.py:16``: ICPSLAM with
the map update replaced by Keller et al. point-based fusion. Default
parameters match the reference (``dist_th=0.05``, ``angle_th=20`` degrees,
``sigma=0.6`` — pointfusion.py:53-105).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax.numpy as jnp

from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages
from .fusionutils import unpack_colors, update_map_fusion
from .icpslam import ICPSLAM

__all__ = ["PointFusion"]


class PointFusion(ICPSLAM):
    r"""Point-based fusion SLAM: projective data association + confidence
    weighted map merging."""

    has_features = True  # ccounts live in the map's feature channel

    def __init__(
        self,
        *,
        odom: str = "gradicp",
        odom_assoc: str = "knn",
        odom_angle_gate: Optional[float] = None,
        odom_sym_normals: bool = False,
        odom_point_weight: float = 0.0,
        odom_subpixel: bool = False,
        dist_th: Union[float, int] = 0.05,
        angle_th: Union[float, int] = 20,
        sigma: Union[float, int] = 0.6,
        dsratio: int = 4,
        numiters: int = 20,
        pyramid: Optional[list] = None,
        damp: float = 1e-8,
        dist_thresh: Optional[float] = None,
        robust_loss: Optional[str] = None,
        robust_scale: float = 0.05,
        lambda_max: float = 2.0,
        B: float = 1.0,
        B2: float = 1.0,
        nu: float = 200.0,
        map_capacity: Optional[int] = None,
        icp_capacity: Optional[int] = None,
        icp_window_frames: Optional[int] = None,
        motion_model: str = "static",
        lookahead_assoc: str = "fresh",
        active_capacity: Optional[int] = None,
        association: str = "auto",
        merge: str = "auto",
        quantize_colors: bool = False,
        feature_channels: int = 0,
        prune_every: int = 0,
        prune_min_confidence: float = 1.0,
        normal_pitch: Optional[int] = None,
        relocalize_below: float = 0.0,
        relocalize_grid: Optional[dict] = None,
        relocalize_dsratio: int = 8,
        relocalize_numiters: int = 12,
        anchor_every: int = 0,
        anchor_below: float = 0.98,
        anchor_dsratio: Optional[int] = None,
        use_jit: bool = True,
        remat: bool = False,
    ):
        if icp_window_frames is not None:
            # The recency window assumes an APPEND-ORDERED buffer (ICPSLAM's
            # aggregate map). PointFusion merges revisited surface in place
            # into OLD rows, so the most-recent rows hold only points the
            # frame did NOT overlap — exactly the wrong target for alignment
            # (measured: 232x worse tracking). Fail loudly.
            raise ValueError(
                "icp_window_frames is not supported by PointFusion: its map "
                "merges in place, so buffer recency does not mean spatial "
                "recency. Use it with ICPSLAM's append-ordered map, or rely "
                "on PointFusion's bounded map size instead."
            )
        super().__init__(
            odom=odom,
            odom_assoc=odom_assoc,
            odom_angle_gate=odom_angle_gate,
            odom_sym_normals=odom_sym_normals,
            odom_point_weight=odom_point_weight,
            odom_subpixel=odom_subpixel,
            dsratio=dsratio,
            numiters=numiters,
            pyramid=pyramid,
            damp=damp,
            dist_thresh=dist_thresh,
            robust_loss=robust_loss,
            robust_scale=robust_scale,
            lambda_max=lambda_max,
            B=B,
            B2=B2,
            nu=nu,
            map_capacity=map_capacity,
            icp_capacity=icp_capacity,
            icp_window_frames=icp_window_frames,
            motion_model=motion_model,
            lookahead_assoc=lookahead_assoc,
            prune_every=prune_every,
            prune_min_confidence=prune_min_confidence,
            feature_channels=feature_channels,
            normal_pitch=normal_pitch,
            relocalize_below=relocalize_below,
            relocalize_grid=relocalize_grid,
            relocalize_dsratio=relocalize_dsratio,
            relocalize_numiters=relocalize_numiters,
            anchor_every=anchor_every,
            anchor_below=anchor_below,
            anchor_dsratio=anchor_dsratio,
            use_jit=use_jit,
            remat=remat,
        )
        if dist_th < 0:
            import warnings

            warnings.warn(f"Distance threshold ({dist_th}) should be non-negative.")
        if not (0 <= angle_th <= 90):
            import warnings

            warnings.warn(
                f"Angle threshold ({angle_th}) should be non-negative and <=90."
            )
        self.dist_th = dist_th
        self.dot_th = math.cos(angle_th * math.pi / 180.0)
        self.sigma = sigma
        self.active_capacity = active_capacity
        self.association = association
        self.merge = merge
        # Opt-in quantized-color map layout: colors quantized to 8 bits and
        # packed into the features channel (see fusionutils.pack_colors) so
        # the fusion write-back is a single 8-wide pass (~2.4 ms/frame saved
        # at 640x480 on v5e). Lossless for PLY export (8-bit uchar anyway);
        # color gradients stop. Assumes frame colors in [0, 1] — pack_colors
        # clips, so 0-255 dataset floats (normalize_color=False loaders)
        # would quantize to solid white; normalize colors first. Default off
        # — the exact float-color path is the reference-parity default.
        self.quantize_colors = bool(quantize_colors)
        if self.quantize_colors:
            self._map_has_colors = False
        # feature_channels (semantic / descriptor fusion — validated and
        # stored by ICPSLAM.__init__): the map's feature buffer gains user
        # channels after the bookkeeping channels ([ccount] or
        # [ccount, packed_color]); frames must carry a matching
        # RGBDImages.feature_image, fused with the colors'
        # confidence-weighted running average. Differentiable.

    @property
    def _map_feature_dim(self):
        return (2 if self.quantize_colors else 1) + self.feature_channels

    @staticmethod
    def decode_map(pointclouds: Pointclouds) -> Pointclouds:
        """Materialize float colors from a quantized-layout map
        (``quantize_colors=True``): features ``[ccount, packed_color,
        *user]`` become ``colors (B, CAP, 3)`` + features ``[ccount,
        *user]``. No-op for float-color maps."""
        import dataclasses

        feats = pointclouds.features
        if pointclouds.colors is not None or feats is None or feats.shape[-1] < 2:
            return pointclouds
        return dataclasses.replace(
            pointclouds,
            colors=unpack_colors(feats[..., 1:2]),
            features=jnp.concatenate([feats[..., :1], feats[..., 2:]], axis=-1),
        )

    def _map(self, pointclouds: Pointclouds, live_frame: RGBDImages) -> Pointclouds:
        return update_map_fusion(
            pointclouds,
            live_frame,
            self.dist_th,
            self.dot_th,
            self.sigma,
            active_capacity=self.active_capacity,
            association=self.association,
            merge=self.merge,
        )
