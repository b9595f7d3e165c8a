r"""Relocalization: recover a lost tracker by batched multi-hypothesis ICP.

The reference has no recovery path — once its frame-to-frame odometry
diverges (``/root/reference/gradslam/slam/icpslam.py:180-247`` has no failure
branch), every subsequent frame fuses at a garbage pose. This module is the
production complement of :func:`~gradslam_tpu.slam.health.tracking_health`:
the health statistic *detects* an abrupt misalignment, :func:`relocalize`
*re-attaches* the frame to the map.

TPU-native design: instead of a sequential "try pose, check, try next" loop,
all ``K`` candidate poses are solved **in one compiled program** — the
hypothesis axis is ``vmap``-ed over the same downsample/associate/gradICP
pipeline the tracker runs per frame, so the whole search is K batched
point-to-plane solves whose 6x6 systems and KNN matmuls ride the MXU
together. Each hypothesis is then scored with the SAME statistic the health
monitor thresholds (inlier fraction at the solved pose), and the
best-scoring pose wins per batch element. Static shapes throughout; one
trace, reusable every time recovery triggers.

Hypothesis sets compose from two sources (both are just ``(B, K, 4, 4)``
arrays):

- :func:`perturbation_grid`: a deterministic camera-local grid (yaw spins x
  translation offsets) around the last healthy pose — covers solver blow-ups
  and short occlusions where the sensor is still near its last known place;
- trajectory / keyframe poses (e.g. every Nth recovered pose): covers the
  kidnapped-sensor case where the camera re-appears somewhere it has already
  mapped. Concatenate them along the K axis.

Scoring guards against the empty-view trap: a hypothesis whose frustum
contains NO map points gets no admissible associations (the KNN's +inf
sentinel distance is gated out), so it scores 0.0 rather than vacuously
"perfect" — see ``health._FINITE_DIST``.

Measured (hard clip, 160x120, tuned cv+tukey pipeline): a 0.4 m / 25-degree
kidnapped frame whose tracking_health reads inlier_frac ~0.1 recovers to
within mm of the true pose from a 15-hypothesis grid; see
``tests/slam/test_relocalize.py`` for the committed numbers.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.geometryutils import (
    compose_transformations,
    orthonormalize_rotations,
)
from ..geometry.se3utils import se3_exp
from ..odometry.gradicp import GradICPOdometryProvider
from ..odometry.icp import ICPOdometryProvider
from ..odometry.icputils import downsample_pointclouds, downsample_rgbdimages
from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages
from ..utils.precision import einsum_hp
from .fusionutils import find_active_map_points
from .health import _association_health

__all__ = ["perturbation_grid", "relocalize"]


def perturbation_grid(
    poses: jnp.ndarray,
    *,
    yaw_deg: Sequence[float] = (0.0, -15.0, 15.0, -30.0, 30.0),
    translations: Sequence[Sequence[float]] = ((0.0, 0.0, 0.0),),
) -> jnp.ndarray:
    r"""Deterministic camera-local hypothesis grid around ``poses``.

    Args:
        poses: ``(B, 4, 4)`` anchor poses (camera-to-world, the library's
            pose convention).
        yaw_deg: rotations (degrees) about the camera's vertical (y) axis.
        translations: camera-frame translation offsets (meters), each a
            3-sequence ``(x right, y down, z forward)``.

    Returns:
        ``(B, K, 4, 4)`` hypotheses with ``K = len(yaw_deg) *
        len(translations)``; hypothesis ``[b, 0]`` is ``poses[b]`` itself
        when the first yaw is 0 and the first translation is zero.
        Perturbations compose on the camera side (``pose @ delta``), so a
        "10-degree yaw" means the camera turns 10 degrees in place wherever
        it is in the world.
    """
    poses = jnp.asarray(poses)
    if poses.ndim != 3 or poses.shape[-2:] != (4, 4):
        raise ValueError(f"poses must have shape (B, 4, 4). Got {poses.shape}.")
    if len(yaw_deg) == 0 or len(translations) == 0:
        raise ValueError("yaw_deg and translations must be non-empty.")
    xis = []
    for t in translations:
        t = tuple(float(x) for x in t)
        if len(t) != 3:
            raise ValueError(f"each translation must be a 3-sequence. Got {t}.")
        for yd in yaw_deg:
            w = math.radians(float(yd))
            xis.append(t + (0.0, w, 0.0))  # twist layout (v, omega)
    deltas = se3_exp(jnp.asarray(xis, dtype=poses.dtype))  # (K, 4, 4)
    # pose (B, 1, 4, 4) @ delta (1, K, 4, 4) -> (B, K, 4, 4)
    return einsum_hp("bij,kjl->bkil", poses, deltas)


def relocalize(
    pointclouds: Pointclouds,
    live_frame: RGBDImages,
    anchor_poses: jnp.ndarray,
    *,
    odom: str = "gradicp",
    dsratio: int = 8,
    numiters: int = 12,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    robust_scale: float = 0.05,
    icp_capacity: Optional[int] = None,
    hypothesis_mode: str = "vmap",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    r"""Re-attach a lost frame to the map: solve ICP from every hypothesis
    pose, score each solution with the tracking-health statistic, return the
    winner.

    Args:
        pointclouds: the map (must carry normals, like the ICP providers).
        live_frame: sequence-length-1 :class:`RGBDImages`; its own poses are
            ignored (the hypotheses replace them).
        anchor_poses: ``(B, K, 4, 4)`` hypothesis poses — a
            :func:`perturbation_grid` around the last healthy pose,
            trajectory/keyframe poses, or both concatenated along ``K``.
        odom: ``'gradicp'`` (differentiable, default) or ``'icp'``.
        dsratio / numiters / damp / dist_thresh: solver controls. The
            defaults are coarser/shorter than tracking (``dsratio=8``,
            ``numiters=12``): recovery starts far from the optimum, where
            coarse association is what matters, and K solves run at once.
            Plain least squares is used intentionally — a hard-rejecting
            robust kernel would zero out exactly the far-off initializations
            recovery has to pull in from.
        robust_scale: the health inlier band used for SCORING (use the
            tracking pipeline's value so the winner's score is comparable
            with the monitor's threshold).
        icp_capacity: downsampled map-target capacity per hypothesis
            (default ``2 * ceil(H/ds) * ceil(W/ds)``).
        hypothesis_mode: ``'vmap'`` (default) solves all K hypotheses
            concurrently — fastest wall-clock, but K association windows
            (and K downsample/compaction pipelines) are live at once;
            ``'scan'`` runs them as a ``lax.scan`` over the K axis, so only
            ONE hypothesis's buffers exist at any time — K times slower when
            recovery actually executes, but the compiled program's memory
            high-water mark stays at one window. Use 'scan' when relocalize
            is embedded in a larger compiled program (the in-scan
            ``relocalize_below`` branch does: a vmap there held the K
            buffers live inside the whole forward scan and cost 5.5x HBM
            even on healthy frames — VERDICT r4 #4).

    Returns:
        ``(poses, info)``: ``poses (B, 1, 4, 4)`` — the best-scoring solved
        pose per batch element, SO(3)-projected; ``info`` dict with

        - ``inlier_frac (B,)``: the winner's health score. Threshold it the
          same way as ``tracking_health`` before trusting the recovery (a
          kidnapped sensor outside the mapped volume has NO correct answer;
          every hypothesis scores low and the best of them is still wrong);
        - ``best_hypothesis (B,)``: winning index into the K axis;
        - ``hypothesis_inlier_frac (B, K)``: every hypothesis's score (for
          logging / tuning the grid).

    The map is never modified — callers fuse the frame themselves once they
    accept the recovery (see ``examples/online_slam.py --relocalize-below``).
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
            "relocalize needs map normals (point-to-plane solves); "
            "the map has none."
        )
    anchor_poses = jnp.asarray(anchor_poses)
    B = len(pointclouds)
    if anchor_poses.ndim != 4 or anchor_poses.shape[0] != B or anchor_poses.shape[-2:] != (4, 4):
        raise ValueError(
            f"anchor_poses must have shape (B, K, 4, 4) = ({B}, K, 4, 4). "
            f"Got {anchor_poses.shape}."
        )
    if odom == "gradicp":
        prov = GradICPOdometryProvider(numiters, damp, dist_thresh)
    elif odom == "icp":
        prov = ICPOdometryProvider(numiters, damp, dist_thresh)
    else:
        raise ValueError(f"Unknown odom for relocalize: {odom!r}. "
                         "Expected 'gradicp' or 'icp'.")
    live_frame = live_frame.to_channels_last()
    _, _, H, W = live_frame.shape
    cap = (
        icp_capacity
        if icp_capacity is not None
        else 2 * math.ceil(H / dsratio) * math.ceil(W / dsratio)
    )
    target = Pointclouds(
        points=pointclouds.points,
        num_points=pointclouds.num_points,
        normals=pointclouds.normals,
    )

    def solve_one_hypothesis(pose_k):  # (B, 4, 4)
        frame_h = live_frame.with_poses(pose_k[:, None])
        active = find_active_map_points(target, frame_h)
        maps_pc = downsample_pointclouds(
            target, active.valid, active.pix_h, active.pix_w, dsratio, cap
        )
        frames_pc = downsample_rgbdimages(frame_h, dsratio)
        transform = prov.provide(maps_pc, frames_pc)  # (B, 1, 4, 4)
        solved = orthonormalize_rotations(
            compose_transformations(transform[:, 0], pose_k)
        )
        h = _association_health(
            target,
            live_frame.with_poses(solved[:, None]),
            dsratio=dsratio,
            robust_scale=robust_scale,
            dist_thresh=dist_thresh,
            icp_capacity=cap,
        )
        return solved, h["inlier_frac"]

    if hypothesis_mode == "vmap":
        # vmap the hypothesis axis: K downsample/associate/solve/score
        # pipelines in one program (map and frame imagery are closed over —
        # broadcast, not replicated).
        solved, scores = jax.vmap(solve_one_hypothesis, in_axes=1)(
            anchor_poses
        )
    elif hypothesis_mode == "scan":
        # one hypothesis at a time: K x slower when it runs, but only one
        # window/compaction pipeline is ever live (memory-bounded mode for
        # embedding inside larger compiled programs)
        def step(carry, pose_k):
            return carry, solve_one_hypothesis(pose_k)

        _, (solved, scores) = jax.lax.scan(
            step, None, jnp.moveaxis(anchor_poses, 1, 0)
        )
    else:
        raise ValueError(
            f"Unknown hypothesis_mode: {hypothesis_mode!r}. "
            "Expected 'vmap' or 'scan'."
        )
    # solved (K, B, 4, 4), scores (K, B)
    best = jnp.argmax(scores, axis=0)  # (B,)
    batch_ix = jnp.arange(B)
    poses = solved[best, batch_ix]  # (B, 4, 4)
    return poses[:, None], {
        "inlier_frac": scores[best, batch_ix],
        "best_hypothesis": best,
        "hypothesis_inlier_frac": scores.T,
    }
