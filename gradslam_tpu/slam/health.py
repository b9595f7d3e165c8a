r"""Tracking-health telemetry for production SLAM serving.

The reference has no observability for lost tracking — a diverged
`ICPSLAM`/`PointFusion` run silently produces a garbage map (its examples
only print final map sizes, ``/root/reference/examples/pointfusion.py:79``).
This module evaluates the SAME frame-to-map association the odometry solver
uses (`icpslam.py _localize`) at the *solved* pose and reduces it to a few
per-sequence scalars a serving loop can threshold, log, or alarm on.

Measured signatures (hard clip at 160x120, tuned cv+tukey, CPU 2026-08-19):

- healthy tracking: ``inlier_frac`` 0.87, ``median_abs_residual`` 2 mm
  (robust_scale 30 mm);
- the same frame with its pose corrupted by 0.25 m: ``inlier_frac`` 0.35,
  ``median_abs_residual`` 32 mm (saturated at the band edge) — an abrupt
  misalignment (solver blow-up, kidnapped sensor, bad relocalization) is
  unambiguous. ``overlap_frac`` separately detects the camera leaving the
  mapped volume (frustum overlap with the map).

Honest limitation — **slow drift is invisible to self-consistency**: a
tracker drifting a few mm/frame fuses the map at its own wrong poses, so
frame-vs-own-map residuals stay healthy (measured: a run drifting to
63 mm ATE over 10 frames still reads inlier_frac 0.87). Detecting slow
drift needs an external reference (loop closure, GT, a second sensor) —
no per-frame residual statistic can provide it.

Everything is jit-safe and static-shape; cost is one extra KNN pass per
call (one solver iteration's worth), so calling it every frame is
affordable and calling it every K frames is ~free.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..odometry.icputils import downsample_pointclouds, downsample_rgbdimages
from ..ops import nn_points_auto
from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages
from .fusionutils import find_active_map_points

__all__ = ["tracking_health"]


def tracking_health(
    pointclouds: Pointclouds,
    live_frame: RGBDImages,
    *,
    dsratio: int = 4,
    robust_scale: float = 0.05,
    dist_thresh: Optional[float] = None,
    icp_capacity: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    r"""Evaluate frame-to-map tracking health at the frame's current pose.

    Args:
        pointclouds: the map (must carry normals — the same requirement the
            ICP providers have).
        live_frame: sequence-length-1 :class:`RGBDImages` whose ``poses``
            hold the pose under test (normally the solver's output — pass
            the frame exactly as it went into the map update).
        dsratio / dist_thresh / icp_capacity: association controls; use the
            pipeline's values so health measures the solver's own view.
        robust_scale: the inlier band — residual rows at or under this
            magnitude count as inliers (use the pipeline's ``robust_scale``;
            for plain least-squares pipelines a few x the sensor noise
            floor is a good band).

    Returns:
        dict of ``(B,)`` float arrays:

        - ``inlier_frac``: fraction of valid downsampled frame points whose
          point-to-plane residual against their map NN is within
          ``robust_scale`` (and within ``dist_thresh`` if set). The primary
          lost-tracking signal.
        - ``assoc_frac``: fraction of valid frame points with an admissible
          association at all (= inlier_frac's denominator gate). Low
          assoc_frac with high inlier_frac among survivors = occlusion or
          aggressive gating rather than divergence.
        - ``median_abs_residual``: median |n . (d - s)| over admissible
          associations (NaN when there are none).
        - ``overlap_frac``: fraction of map points projecting into the
          frame's frustum — camera-left-the-map detector.
    """
    if not isinstance(pointclouds, Pointclouds):
        raise TypeError(
            f"Expected pointclouds to be of type Pointclouds. Got {type(pointclouds)}."
        )
    if not isinstance(live_frame, RGBDImages):
        raise TypeError(
            f"Expected live_frame to be of type RGBDImages. Got {type(live_frame)}."
        )
    if pointclouds.normals is None:
        raise ValueError(
            "tracking_health needs map normals (point-to-plane residuals); "
            "the map has none."
        )
    if live_frame.poses is None:
        raise ValueError("live_frame must carry poses (the pose under test).")
    return _association_health(
        pointclouds,
        live_frame,
        dsratio=dsratio,
        robust_scale=robust_scale,
        dist_thresh=dist_thresh,
        icp_capacity=icp_capacity,
    )


# The KNN backends return this sentinel distance for rows with NO admissible
# target (fully-masked target buffer); the gathered "neighbour" is then a
# zeroed padding row whose zero normal makes the point-to-plane residual
# exactly 0 — a spurious perfect inlier. Gate on a finite distance so an
# association-free row can never count as healthy (matters when scoring
# relocalization hypotheses that see no map at all).
_FINITE_DIST = 1e29


def _association_health(
    pointclouds: Pointclouds,
    live_frame: RGBDImages,
    *,
    dsratio: int,
    robust_scale: float,
    dist_thresh: Optional[float],
    icp_capacity: Optional[int],
) -> Dict[str, jnp.ndarray]:
    """Validation-free core of :func:`tracking_health` (jit/vmap-safe; reused
    by :func:`~gradslam_tpu.slam.relocalize.relocalize` to score hypothesis
    poses)."""
    B, _, H, W = live_frame.shape

    target = Pointclouds(
        points=pointclouds.points,
        num_points=pointclouds.num_points,
        normals=pointclouds.normals,
    )
    active = find_active_map_points(target, live_frame)
    frames_pc = downsample_rgbdimages(live_frame, dsratio)
    cap = (
        icp_capacity
        if icp_capacity is not None
        else 2 * math.ceil(H / dsratio) * math.ceil(W / dsratio)
    )
    maps_pc = downsample_pointclouds(
        target, active.valid, active.pix_h, active.pix_w, dsratio, cap
    )

    def health_one(src, src_mask, tgt, tgt_normals, tgt_mask):
        dists, idx = nn_points_auto(src, tgt, tgt_mask)
        admissible = src_mask & (dists < _FINITE_DIST)
        if dist_thresh is not None:
            admissible = admissible & (dists < dist_thresh)
        d = jnp.take(tgt, idx, axis=0)
        n = jnp.take(tgt_normals, idx, axis=0)
        r = jnp.abs(jnp.sum(n * (d - src), axis=-1))
        n_src = jnp.maximum(jnp.sum(src_mask), 1.0)
        inlier = admissible & (r <= robust_scale)
        med = jnp.nanmedian(jnp.where(admissible, r, jnp.nan))
        return (
            jnp.sum(inlier) / n_src,
            jnp.sum(admissible) / n_src,
            med,
        )

    inlier_frac, assoc_frac, med = jax.vmap(health_one)(
        frames_pc.points,
        frames_pc.nonpad_mask,
        maps_pc.points,
        maps_pc.normals,
        maps_pc.nonpad_mask,
    )
    overlap = jnp.sum(active.valid, axis=-1) / jnp.maximum(
        pointclouds.num_points.astype(jnp.float32), 1.0
    )
    return {
        "inlier_frac": inlier_frac,
        "assoc_frac": assoc_frac,
        "median_abs_residual": med,
        "overlap_frac": overlap,
    }
