r"""ICP-SLAM pipeline (TPU-native).

Re-design of ``/root/reference/gradslam/slam/icpslam.py:18``. The reference is
an ``nn.Module`` with a Python loop over the sequence dimension, a per-frame
host->device transfer (icpslam.py:125-137), and batch-serial odometry. Here:

- the frame recurrence is a single ``lax.scan`` over the sequence axis — the
  whole SLAM run is one compiled XLA program;
- the scan carry is ``(map buffers, previous pose)`` — an explicit pytree that
  is trivially checkpointable;
- the map is a fixed-capacity padded buffer (see ``Pointclouds``);
- odometry is ``vmap``-ed over the batch;
- both the scanned ``forward`` and the single-frame ``step`` (reference
  icpslam.py:140) are exposed; both are jit-compiled.

Gradients flow end-to-end: from the returned map/trajectory back to depth,
color, and intrinsics.
"""

from __future__ import annotations

import dataclasses
import math
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.geometryutils import (
    compose_transformations,
    inverse_transformation,
    orthonormalize_rotations,
)
from ..odometry.gradicp import GradICPOdometryProvider
from ..odometry.icp import ICPOdometryProvider
from ..odometry.icputils import (
    downsample_pointclouds,
    downsample_rgbdimages,
    validate_pyramid,
    validate_robust,
)
from ..odometry.projective import ProjectiveOdometryProvider
from ..structures.pointclouds import Pointclouds, compact_masked
from ..structures.rgbdimages import RGBDImages
from .fusionutils import find_active_map_points, prune_map, update_map_aggregate

__all__ = ["ICPSLAM"]


def split_prune_segments(start: int, n: int, prune_every: int):
    """Split the global frame run ``[start, start + n)`` into
    ``(sub_n, prune_after)`` chunks whose boundaries land after every
    ``prune_every``-th mapped frame, so :func:`prune_map` runs BETWEEN
    ``lax.scan`` calls instead of as a ``lax.cond`` inside the scan body.
    A cond in the carry path blocks XLA's buffer aliasing for the whole
    map pytree — every frame then pays a full-capacity copy of
    points/normals/colors/features (measured on-TPU at 2.4M-row capacity:
    +40 ms/frame, ~10x the cost of the amortized prune pass itself;
    design.md 'Map maintenance'). Shared by the single-device pipelines
    and ``MapShardedPointFusion``."""
    if not prune_every:
        return [(n, False)] if n else []
    if n // prune_every > 64:
        import warnings

        warnings.warn(
            f"prune_every={prune_every} over {n} frames unrolls "
            f"{n // prune_every + 1} scan segments into one program — "
            "trace/compile time scales with the segment count. Use a "
            "longer prune interval on long sequences, or prune manually "
            "in a step() loop.",
            stacklevel=2,
        )
    out = []
    s, end, k = start, start + n, prune_every
    while s < end:
        # next global boundary g >= s with (g + 1) % k == 0
        g = s + (k - 1 - (s % k)) % k
        if g < end:
            out.append((g - s + 1, True))
            s = g + 1
        else:
            out.append((end - s, False))
            s = end
    return out


class ICPSLAM:
    r"""ICP-SLAM: frame-to-map odometry + naive map aggregation.

    Args:
        odom: odometry method — 'gt', 'icp' or 'gradicp' (reference
            icpslam.py:80-91).
        odom_assoc: how the tracked solvers associate frame and map.
            ``'knn'`` (default, reference semantics): each downsampled frame
            point finds its Euclidean nearest map point every iteration — an
            O(N·M) search (the reference's chamferdist KNN,
            icputils.py:200). ``'projective'``: frame-to-model projective
            association — the map window is projected into the live camera
            at the current estimate and reads the frame vertex/normal at
            the landed pixel, one streaming pass + one row gather per
            iteration (O(N); no KNN anywhere). Measured: the tracked
            640x480 pipeline's odometry cost drops ~an order of magnitude
            at comparable ATE (see BENCH_ALL). The solvers, robust kernels,
            pyramid and motion-model knobs apply to both modes.
            With a ``pyramid``, ``odom_assoc`` may also be a per-level list
            (same length), enabling HYBRID schedules — e.g.
            ``pyramid=[(8, 6), (8, 4)],
            odom_assoc=['projective', 'knn']``: cheap projective
            pre-alignment plus a short KNN level that re-anchors the
            tangential drift projective association cannot observe
            (measured on the noisy 320x240 hard clip: ungated hybrid
            17.9 mm vs pure projective 176 mm vs pure KNN 14.3 mm at
            ~8x pure-KNN speed; at 640x480 the hybrid wants the 45-degree
            gate — see design.md section 4 for the sweep).
        odom_angle_gate: optional normal-compatibility gate (degrees),
            BOTH association modes: associations whose frame normal
            deviates from the associated map normal by more than this
            angle are rejected — discards wrong-surface correspondences a
            pure distance gate admits, letting association density scale
            with resolution on noisy depth (design.md §4). In the KNN mode
            the gate compares the downsampled frame cloud's normals
            (rotated with the solver iterate) against the nearest map
            point's. None disables.
        odom_sym_normals: use the symmetric normal
            ``normalize(n_map + n_frame)`` in the projective solver's
            point-to-plane rows (Rusinkiewicz's symmetric objective).
            STRONGLY recommended with ``odom_assoc='projective'`` on noisy
            depth: one-sided map normals leave per-frame depth noise
            unopposed along the surface tangent and the pose drifts
            monotonically (measured 320x240 noisy clip: 205 mm -> 46 mm
            ATE). Projective association only.
        odom_point_weight: if > 0, augment the projective solver with
            point-to-POINT rows at this weight (relative to the plane
            rows) — an anti-drift constraint wherever the scene has
            relief. The rows carry a half-pixel in-plane quantization
            floor (~z/(2 fx)), so this is for production resolutions,
            small weights (~0.25), and only when ``odom_sym_normals``
            alone is insufficient. Projective association only.
        odom_subpixel: bilinearly interpolate the frame vertex/normal at
            the continuous projected pixel instead of rounding to the
            nearest one (4 row gathers + lerp; standard KinectFusion
            practice) — removes the half-pixel in-plane quantization floor
            of nearest-pixel association (~z/(2 fx) meters of tangential
            noise; design.md §4). Projective association only.
        dsratio: downsampling ratio applied to frames and map before ICP.
        numiters / damp / dist_thresh: ICP solver parameters.
        robust_loss / robust_scale: optional robust kernel ('huber' or
            'tukey') IRLS-weighting the point-to-plane rows — outliers
            (dynamic objects, depth noise) are down-weighted instead of
            pulling the least-squares solve (the reference has plain least
            squares only). All kernels are continuous, so differentiability
            is preserved. ``robust_scale`` is the residual scale in meters
            (Huber knee / Tukey cutoff).
        pyramid: optional coarse-to-fine schedule ``[(dsratio, numiters),
            ...]`` replacing the single-level ``dsratio``/``numiters``:
            each frame's odometry solves at the first (coarsest) level from
            identity, then warm-starts each finer level with the previous
            level's transform. KNN cost per iteration scales ~1/ds^4, so
            shifting iterations to coarse levels cuts odometry cost while
            the fine level keeps final accuracy (e.g. ``[(8, 6), (4, 4)]``
            vs ``dsratio=4, numiters=10``). ``pyramid=[(d, n)]`` is exactly
            ``dsratio=d, numiters=n``. A user-set ``icp_capacity`` applies
            to every level; the default is per-level
            ``2 * ceil(H/ds) * ceil(W/ds)``.
        lambda_max / B / B2 / nu: gradLM parameters (odom='gradicp').
        map_capacity: capacity of the global map buffer. Either a fixed int
            (default ``L * H * W`` — the aggregate worst case — at call time)
            or a growth schedule ``[(frames, capacity), ...]``: ``forward``
            then scans each segment of the sequence with its own (smaller)
            buffer and zero-pads the map between segments. Every fusion
            stage is O(capacity), so amortized growth cuts early-frame cost
            the way a growable array does; results are identical to running
            the final capacity throughout provided no segment overflows —
            which is checkable: the returned map's ``num_dropped`` counters
            record every row lost to a full buffer (assert they are zero).
        icp_capacity: fixed capacity of the downsampled ICP target buffer;
            default ``ceil(H/ds) * ceil(W/ds) * 2``.
        icp_window_frames: if set, frame-to-map odometry associates against
            only the most recent ``icp_window_frames * H * W`` map rows (a
            sliding recency window over the append-ordered buffer) instead
            of projecting the ENTIRE map each frame. The aggregate map grows
            by H*W rows per frame, so every active-point stage is
            O(L * H * W) without a window — on long sequences the window
            turns odometry cost constant per frame (measured: ICPSLAM(icp)
            320x240 38 -> see BENCH_ALL). Default None = reference semantics
            (project the whole map, reference icpslam.py:240-243). Only
            valid for append-ordered (aggregate) maps — PointFusion merges
            in place, so buffer recency is not spatial recency there and
            its constructor rejects the option.
        motion_model: odometry initialization across frames. ``'static'``
            (default, reference semantics): each frame's solve starts at the
            previous pose (zero-motion prior). ``'constant_velocity'``: the
            solve starts at the previous pose composed with the previous
            frame's relative transform — the classic constant-velocity
            prior. The prediction also re-centers the projective
            association window, so fast steady motion keeps more map points
            in view (measured: 35% lower ATE at 8 cm/frame with 3 solver
            iterations). At slow motion prefer the default: the zero-motion
            prior is already near-optimal there, and CV feeds the previous
            solve's error into the next initialization. Applies to tracked
            ``forward``; the stateless ``step`` API takes the prior
            explicitly via ``prev_transform``.
        prune_every / prune_min_confidence: if ``prune_every > 0``, every
            ``prune_every``-th mapped frame ends with
            :func:`~gradslam_tpu.slam.fusionutils.prune_map` — unstable
            points (confidence below ``prune_min_confidence``) are removed
            and capacity is reclaimed (Keller et al.'s map-maintenance
            stage; the reference never implemented it). Requires a pipeline
            whose map carries confidence counters (PointFusion). Applies to
            ``forward`` only — the frame-counter lives in its scan; online
            ``step`` loops call ``prune_map`` themselves (see
            ``examples/online_slam.py``). Implementation: the scan is cut
            at prune boundaries and ``prune_map`` runs between the
            resulting sub-scans — a ``lax.cond`` in the scan body would
            block XLA's map-buffer aliasing and cost a full-capacity copy
            every frame (see ``_prune_segments``).
        relocalize_below: if > 0, the scanned ``forward`` gains the failure
            branch the reference never had (icpslam.py:180-247): after every
            odometry solve, tracking health (inlier fraction of the
            frame-to-map association at the solved pose —
            :func:`~gradslam_tpu.slam.health.tracking_health`) is evaluated,
            and when it drops below this threshold a multi-hypothesis
            relocalization (:func:`~gradslam_tpu.slam.relocalize.relocalize`
            over a camera-local perturbation grid) runs INSIDE the scan via
            ``lax.cond`` — the healthy path pays only the health statistic
            (~one solver iteration per frame); the recovery solves execute
            only on unhealthy frames. The recovered pose is adopted only if
            it scores strictly better than the failed solve (scored with
            the same gates), so recovery can never make a frame worse.
            Healthy runs read inlier fractions ~0.8+; 0.2-0.5 are useful
            thresholds. 0 disables (reference semantics). Tracked odometry
            only (odom='icp'/'gradicp').
        relocalize_grid: optional dict of
            :func:`~gradslam_tpu.slam.relocalize.perturbation_grid` kwargs
            (``yaw_deg``, ``translations``) defining the in-scan hypothesis
            grid; default = the grid's defaults (5 yaw spins). Size the
            translations to the jumps you expect (e.g. ``((0, 0, 0),
            (-0.3, 0, 0), (0.3, 0, 0))`` for kidnaps along camera-x).
        relocalize_dsratio / relocalize_numiters: recovery solve controls
            (coarser/shorter than tracking by default: 8 / 12).
        anchor_every: if > 0 (requires ``relocalize_below``), the scanned
            ``forward`` additionally carries a FROZEN keyframe anchor
            (:func:`~gradslam_tpu.slam.health.keyframe_anchor` as a scan
            carry, refreshed every ``anchor_every`` frames at the solved
            pose) and scores every solved pose against it. Self-consistent
            health cannot see slow drift — the map is fused at the
            tracker's own wrong poses (health.py's documented blind spot) —
            but the anchor can: when the anchor disagrees
            (CONDITIONAL inlier fraction — inliers among admissible
            associations, which is view-invariant where the absolute
            fraction decays with legitimate camera motion — drops below
            ``anchor_below`` while the anchor is still in view), the frame
            re-solves against the ANCHOR itself under ``lax.cond``
            (relocalizing against the drifted map would return the drifted
            pose right back; the recovery solve is the KNN solver on
            purpose — plane residuals share the tracker's tangential
            blindness, 3D nearest neighbours re-anchor on relief). Refresh
            is skipped while drifting, so the alarm cannot bake drift into
            its own reference; the blind window is the refresh interval.
            0 disables (default).
        anchor_below: conditional-inlier threshold for the anchored drift
            gate (default 0.98; healthy conditional inliers read ~1.0 on
            clean depth — lower this toward ~0.85 on clips with heavy
            outlier content).
        anchor_dsratio: stride of the anchor snapshot (default: ``dsratio``).
            The anchor gate associates projectively, so strided anchors do
            not alias (the ``keyframe_anchor`` mod-ds trap applies to the
            KNN health only).
        normal_pitch: finite-difference baseline (pixels) for the frames'
            normal maps (see :class:`~gradslam_tpu.structures.RGBDImages`).
            Depth-noise-induced normal error scales with
            ``sigma * fx / (pitch * z)`` — it DOUBLES every time resolution
            doubles at pitch 1, and 5 mm sensor noise is enough to break
            point-to-plane tracking outright at 320x240 (measured: 0.34 m
            ATE from noise alone on the hard clip; pitch 2 tracks). Rule of
            thumb: scale the pitch with resolution (pitch ~ W/160). Default
            None keeps the frames' own ``normal_pitch`` (1 = bit-exact
            reference-parity normals).
        use_jit: jit-compile forward/step (disable for debugging).
        remat: apply ``jax.checkpoint`` to the scan body — end-to-end
            gradients over long sequences then rematerialise per-frame
            activations instead of holding O(L x capacity) residuals.
    """

    has_features = False  # aggregate maps carry no confidence channel

    def __init__(
        self,
        *,
        odom: str = "gradicp",
        odom_assoc: str = "knn",
        odom_angle_gate: Optional[float] = None,
        odom_sym_normals: bool = False,
        odom_point_weight: float = 0.0,
        odom_subpixel: bool = False,
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
        prune_every: int = 0,
        prune_min_confidence: float = 1.0,
        feature_channels: int = 0,
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
        if odom not in ("gt", "icp", "gradicp"):
            raise ValueError(
                f"Odometry method ({odom}) not supported for ICPSLAM. "
                "Currently supported odometry modules for ICPSLAM are: "
                "'gt', 'icp', 'gradicp'"
            )
        self.odom = odom
        self.dist_thresh = dist_thresh
        if isinstance(odom_assoc, (list, tuple)):
            # per-level association for a HYBRID pyramid, e.g. coarse
            # projective pre-alignment + one fine KNN level to re-anchor the
            # tangential drift projective association cannot observe.
            if pyramid is None or len(odom_assoc) != len(pyramid):
                raise ValueError(
                    "A per-level odom_assoc list requires a pyramid of the "
                    f"same length. Got {odom_assoc!r} with "
                    f"pyramid={pyramid!r}."
                )
            odom_assoc = tuple(odom_assoc)
            bad = [a for a in odom_assoc if a not in ("knn", "projective")]
            if bad:
                raise ValueError(
                    f"Unknown odom_assoc level(s): {bad!r}. "
                    "Expected 'knn' or 'projective'."
                )
        elif odom_assoc not in ("knn", "projective"):
            raise ValueError(
                f"Unknown odom_assoc: {odom_assoc!r}. "
                "Expected 'knn' or 'projective'."
            )
        self.odom_assoc = odom_assoc
        any_projective = (
            "projective" in odom_assoc
            if isinstance(odom_assoc, tuple)
            else odom_assoc == "projective"
        )
        # the finest level's mode decides the health statistic's association
        self._finest_assoc = (
            odom_assoc[-1] if isinstance(odom_assoc, tuple) else odom_assoc
        )
        if odom_angle_gate is not None:
            if odom == "gt":
                raise ValueError(
                    "odom_angle_gate requires tracked odometry "
                    "(odom='icp'/'gradicp'), not odom='gt'."
                )
            if not (0 < odom_angle_gate <= 180):
                raise ValueError(
                    f"odom_angle_gate must be in (0, 180] degrees or None. "
                    f"Got {odom_angle_gate}."
                )
        self.odom_angle_gate = odom_angle_gate
        if (odom_sym_normals or odom_point_weight) and not any_projective:
            raise ValueError(
                "odom_sym_normals / odom_point_weight require "
                "odom_assoc='projective' (they shape the projective solver's "
                "rows; the KNN mode has no per-association frame normal)."
            )
        if odom_point_weight < 0:
            raise ValueError(
                f"odom_point_weight must be >= 0. Got {odom_point_weight}."
            )
        self.odom_sym_normals = bool(odom_sym_normals)
        self.odom_point_weight = float(odom_point_weight)
        if odom_subpixel and not any_projective:
            raise ValueError(
                "odom_subpixel requires odom_assoc='projective' (it refines "
                "the projective association's pixel lookup; the KNN mode "
                "has no pixel grid)."
            )
        self.odom_subpixel = bool(odom_subpixel)
        if not isinstance(dsratio, int) or dsratio < 1:
            raise ValueError(f"dsratio must be an int >= 1. Got {dsratio}.")
        self.dsratio = dsratio
        if not isinstance(numiters, int) or numiters < 1:
            raise ValueError(f"numiters must be an int >= 1. Got {numiters}.")
        self.map_capacity = map_capacity
        self.icp_capacity = icp_capacity
        if icp_window_frames is not None and icp_window_frames < 1:
            raise ValueError(
                f"icp_window_frames must be >= 1. Got {icp_window_frames}."
            )
        self.icp_window_frames = icp_window_frames
        if motion_model not in ("static", "constant_velocity"):
            raise ValueError(
                f"Unknown motion_model: {motion_model!r}. "
                "Expected 'static' or 'constant_velocity'."
            )
        self.motion_model = motion_model
        self.remat = remat
        if prune_every < 0:
            raise ValueError(f"prune_every must be >= 0. Got {prune_every}.")
        if prune_every and not self.has_features:
            raise ValueError(
                "prune_every requires a pipeline whose map carries confidence "
                "counters (PointFusion); ICPSLAM's aggregate map has none."
            )
        self.prune_every = int(prune_every)
        self.prune_min_confidence = prune_min_confidence
        # User feature channels appended per map point (semantic mapping —
        # see PointFusion(feature_channels=...)); on an aggregate map the
        # features come out as [alpha, *user] per update_map_aggregate.
        if not isinstance(feature_channels, int) or feature_channels < 0:
            raise ValueError(
                f"feature_channels must be a non-negative int. "
                f"Got {feature_channels!r}."
            )
        self.feature_channels = feature_channels
        if normal_pitch is not None and (
            not isinstance(normal_pitch, int) or normal_pitch < 1
        ):
            raise ValueError(
                f"normal_pitch must be None or an int >= 1. Got {normal_pitch!r}."
            )
        self.normal_pitch = normal_pitch
        if relocalize_below < 0 or relocalize_below >= 1:
            raise ValueError(
                f"relocalize_below must be in [0, 1) (0 disables). "
                f"Got {relocalize_below}."
            )
        if relocalize_below > 0 and odom == "gt":
            raise ValueError(
                "relocalize_below requires tracked odometry "
                "(odom='icp'/'gradicp'), not odom='gt' — ground-truth "
                "poses cannot be lost."
            )
        self.relocalize_below = float(relocalize_below)
        self.relocalize_grid = dict(relocalize_grid or {})
        if relocalize_dsratio < 1 or relocalize_numiters < 1:
            raise ValueError(
                "relocalize_dsratio and relocalize_numiters must be >= 1. "
                f"Got {relocalize_dsratio}, {relocalize_numiters}."
            )
        self.relocalize_dsratio = relocalize_dsratio
        self.relocalize_numiters = relocalize_numiters
        if anchor_every < 0 or not isinstance(anchor_every, int):
            raise ValueError(
                f"anchor_every must be a non-negative int. Got {anchor_every!r}."
            )
        if anchor_every > 0 and not (relocalize_below > 0):
            raise ValueError(
                "anchor_every requires relocalize_below > 0 — the anchored "
                "drift gate reuses the in-scan relocalization threshold and "
                "recovery machinery."
            )
        self.anchor_every = int(anchor_every)
        if not (0 < anchor_below <= 1):
            raise ValueError(
                f"anchor_below must be in (0, 1]. Got {anchor_below}."
            )
        self.anchor_below = float(anchor_below)
        if anchor_dsratio is not None and (
            not isinstance(anchor_dsratio, int) or anchor_dsratio < 1
        ):
            raise ValueError(
                f"anchor_dsratio must be None or an int >= 1. "
                f"Got {anchor_dsratio!r}."
            )
        self.anchor_dsratio = anchor_dsratio
        self.pyramid = validate_pyramid(pyramid)
        validate_robust(robust_loss, robust_scale)
        self.robust_loss = robust_loss
        self.robust_scale = robust_scale

        def make_provider(n_iters, assoc):
            if odom in ("icp", "gradicp") and assoc == "projective":
                return ProjectiveOdometryProvider(
                    solver=odom,
                    numiters=n_iters,
                    damp=damp,
                    dist_thresh=dist_thresh,
                    dot_gate=(
                        None if odom_angle_gate is None
                        else math.cos(math.radians(odom_angle_gate))
                    ),
                    lambda_max=lambda_max,
                    B=B,
                    B2=B2,
                    nu=nu,
                    lookahead_assoc=lookahead_assoc,
                    robust_loss=robust_loss,
                    robust_scale=robust_scale,
                    sym_normals=odom_sym_normals,
                    point_weight=odom_point_weight,
                    subpixel=odom_subpixel,
                )
            knn_gate = (
                None if odom_angle_gate is None
                else math.cos(math.radians(odom_angle_gate))
            )
            if odom == "icp":
                return ICPOdometryProvider(
                    n_iters, damp, dist_thresh, lookahead_assoc,
                    robust_loss, robust_scale, dot_gate=knn_gate,
                )
            if odom == "gradicp":
                return GradICPOdometryProvider(
                    n_iters, damp, dist_thresh, lambda_max, B, B2, nu,
                    lookahead_assoc, robust_loss, robust_scale,
                    dot_gate=knn_gate,
                )
            return None

        if self.pyramid is None:
            self.odomprov = make_provider(numiters, self.odom_assoc)
            self._pyramid_provs = None
        else:
            assocs = (
                self.odom_assoc
                if isinstance(self.odom_assoc, tuple)
                else (self.odom_assoc,) * len(self.pyramid)
            )
            self._pyramid_provs = [
                make_provider(n, a)
                for (_, n), a in zip(self.pyramid, assocs)
            ]
            self.odomprov = self._pyramid_provs[-1]  # finest level
        self._forward = jax.jit(self._forward_impl) if use_jit else self._forward_impl
        self._step = jax.jit(self._step_impl) if use_jit else self._step_impl
        self._localize_only = (
            jax.jit(self._localize_impl) if use_jit else self._localize_impl
        )
        # step()'s gt/bootstrap branch runs the map update alone — jit it
        # too, or every online odom='gt' frame dispatches the fusion
        # pipeline op-by-op (an order of magnitude slower on TPU).
        # The pipeline's normal_pitch override applies here exactly as it
        # does inside _step_impl/_forward_impl: the decomposed serving loop
        # (localize -> gate -> map_update) and step()'s gt branch must fuse
        # the same pitch-k normals step()/forward() fuse.
        def _map_pitched(pointclouds, live_frame):
            return self._map(pointclouds, self._with_normal_pitch(live_frame))

        self._map_only = jax.jit(_map_pitched) if use_jit else _map_pitched

    # ------------------------------------------------------------------ #
    # Public API
    # ------------------------------------------------------------------ #
    def __call__(self, frames: RGBDImages) -> Tuple[Pointclouds, jnp.ndarray]:
        return self.forward(frames)

    def forward(self, frames: RGBDImages) -> Tuple[Pointclouds, jnp.ndarray]:
        r"""Run SLAM over a batch of sequences. Returns ``(pointclouds,
        poses (B, L, 4, 4))`` (reference icpslam.py:99-138)."""
        if not isinstance(frames, RGBDImages):
            raise TypeError(
                f"Expected frames to be of type RGBDImages. Got {type(frames)}."
            )
        if self.odom == "gt" and frames.poses is None:
            raise ValueError("`frames` must have poses when `odom='gt'`.")
        want = getattr(self, "feature_channels", 0)
        got = frames.feature_channels
        if want != got:
            # Loud mismatch at the API boundary: a feature plane the map
            # cannot hold would otherwise be dropped silently (or fusion
            # would die mid-trace on a width mismatch).
            hint = (
                "construct the pipeline with PointFusion(feature_channels="
                f"{got})" if got else "attach RGBDImages.feature_image with "
                f"{want} channel(s)"
            )
            raise ValueError(
                f"frames carry {got} feature channel(s) but this pipeline "
                f"fuses {want} — {hint}."
            )
        return self._forward(frames.to_channels_last())

    def step(
        self,
        pointclouds: Pointclouds,
        live_frame: RGBDImages,
        prev_frame: Optional[RGBDImages] = None,
        prev_transform: Optional[jnp.ndarray] = None,
    ) -> Tuple[Pointclouds, jnp.ndarray]:
        r"""Single online SLAM step (reference icpslam.py:140-178). If
        ``prev_frame`` is None (or odom='gt'), uses the pose from
        ``live_frame``; otherwise runs the odometry provider.

        ``prev_transform``: optional ``(B, 4, 4)`` world-frame relative
        transform of the PREVIOUS step (``pose_prev @ pose_prevprev^-1``) —
        the constant-velocity prior. When given, odometry starts from (and
        the association window projects at) the predicted pose
        ``prev_transform @ prev_pose`` instead of ``prev_pose``; ``step``
        is stateless, so the caller threads it (compute it from the
        returned poses; see ``examples/online_slam.py --motion-model``).

        Note: ``prune_every`` applies to :meth:`forward` only — ``step`` has
        no frame counter, so step-driven loops schedule their own
        maintenance by calling
        :func:`~gradslam_tpu.slam.fusionutils.prune_map` periodically (see
        ``examples/online_slam.py --prune-every``)."""
        if not isinstance(live_frame, RGBDImages):
            raise TypeError(
                f"Expected live_frame to be of type RGBDImages. Got {type(live_frame)}."
            )
        if prev_frame is not None and not isinstance(prev_frame, RGBDImages):
            raise TypeError(
                f"Expected prev_frame to be of type RGBDImages or None. "
                f"Got {type(prev_frame)}."
            )
        if prev_frame is not None and self.odom != "gt" and prev_frame.poses is None:
            raise ValueError("`prev_frame` should have poses, but did not.")
        if (prev_frame is None or self.odom == "gt") and live_frame.poses is None:
            raise ValueError(
                "`live_frame` must have poses when `prev_frame` is None or `odom='gt'`."
            )
        if prev_transform is not None:
            prev_transform = jnp.asarray(prev_transform)
            B = live_frame.rgb_image.shape[0]
            if prev_transform.shape != (B, 4, 4):
                # the natural mistake — passing the (B, 1, 4, 4) pose step
                # returns — would otherwise broadcast into rank-5 poses and
                # die far downstream
                raise ValueError(
                    f"prev_transform must have shape (B, 4, 4) = ({B}, 4, 4)."
                    f" Got {prev_transform.shape}."
                )
        want = getattr(self, "feature_channels", 0)
        got = live_frame.feature_channels
        if want != got:
            raise ValueError(
                f"live_frame carries {got} feature channel(s) but this "
                f"pipeline fuses {want} — see PointFusion(feature_channels=...)."
            )
        live_frame = live_frame.to_channels_last()
        prev_frame = None if prev_frame is None else prev_frame.to_channels_last()
        if prev_frame is None or self.odom == "gt":
            # Reference parity (icpslam.py:219-230): warn on the two misuse
            # shapes instead of silently fusing at the live_frame pose — a
            # forgotten prev_frame with tracked odometry quietly corrupts
            # the map otherwise. Like the reference, the None-with-tracking
            # case only warns once the map is non-empty (frame 0 bootstrap
            # legitimately passes prev_frame=None); skip silently if the
            # counter is a tracer (user-jitted step).
            if prev_frame is None and self.odom != "gt":
                try:
                    nonempty = bool(jnp.any(pointclouds.num_points > 0))
                except jax.errors.TracerBoolConversionError:
                    nonempty = False
                if nonempty:
                    warnings.warn(
                        f"`prev_frame` was None despite odom='{self.odom}'; "
                        "skipping odometry and using `live_frame.poses`. "
                        "Thread the previous frame through step() to enable "
                        "tracking.",
                        stacklevel=2,
                    )
            elif prev_frame is not None and self.odom == "gt":
                warnings.warn(
                    "`prev_frame` is not used when `odom='gt'`.", stacklevel=2
                )
            poses = live_frame.poses
            new_map = self._map_only(pointclouds, live_frame)
            return new_map, poses
        return self._step(pointclouds, live_frame, prev_frame, prev_transform)

    def localize(
        self,
        pointclouds: Pointclouds,
        live_frame: RGBDImages,
        prev_frame: RGBDImages,
        prev_transform: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        r"""Pose-only odometry solve — :meth:`step` without the map update.

        Together with :meth:`map_update` this decomposes ``step`` for
        serving loops that gate fusion on tracking health::

            poses = slam.localize(pc, live, prev)
            h = tracking_health(pc, live.with_poses(poses))
            if h["inlier_frac"][0] < threshold:
                poses, info = relocalize(pc, live, anchors)   # recover
            pc = slam.map_update(pc, live.with_poses(poses))  # fuse last

        ``step`` fuses unconditionally, so a diverged solve would corrupt
        the map before the monitor ever sees it.

        Same arguments/semantics as :meth:`step` (odometry part only);
        returns poses ``(B, 1, 4, 4)``. Not available for ``odom='gt'``
        (there is nothing to solve — use the frame's own poses).
        """
        if self.odom == "gt":
            raise ValueError(
                "localize is not available for odom='gt'; ground-truth "
                "pipelines use the frame's own poses."
            )
        if not isinstance(live_frame, RGBDImages):
            raise TypeError(
                f"Expected live_frame to be of type RGBDImages. Got {type(live_frame)}."
            )
        if not isinstance(prev_frame, RGBDImages):
            raise TypeError(
                f"Expected prev_frame to be of type RGBDImages. Got {type(prev_frame)}."
            )
        if prev_frame.poses is None:
            raise ValueError("`prev_frame` should have poses, but did not.")
        return self._localize_only(
            pointclouds,
            live_frame.to_channels_last(),
            prev_frame.to_channels_last(),
            prev_transform,
        )

    def map_update(
        self, pointclouds: Pointclouds, live_frame: RGBDImages
    ) -> Pointclouds:
        r"""Map-only update at the frame's current pose — :meth:`step`
        without odometry (the fusion half of the :meth:`localize`
        decomposition; jit-compiled)."""
        if not isinstance(live_frame, RGBDImages):
            raise TypeError(
                f"Expected live_frame to be of type RGBDImages. Got {type(live_frame)}."
            )
        if live_frame.poses is None:
            raise ValueError("live_frame must carry poses to fuse at.")
        return self._map_only(pointclouds, live_frame.to_channels_last())

    # ------------------------------------------------------------------ #
    # Internals
    # ------------------------------------------------------------------ #
    def _default_map_capacity(self, frames: RGBDImages) -> int:
        B, L, H, W = frames.shape
        if self.map_capacity is None:
            return L * H * W
        if isinstance(self.map_capacity, int):
            return self.map_capacity
        return max(c for _, c in self.map_capacity)

    def _capacity_schedule(self, frames: RGBDImages):
        """Normalize ``map_capacity`` into ``[(frames, capacity), ...]``."""
        B, L, H, W = frames.shape
        cap = self.map_capacity
        if cap is None or isinstance(cap, int):
            return [(L, self._default_map_capacity(frames))]
        sched = [(int(n), int(c)) for n, c in cap]
        if any(n <= 0 or c <= 0 for n, c in sched):
            raise ValueError(f"Invalid capacity schedule: {sched}.")
        if sum(n for n, _ in sched) != L:
            raise ValueError(
                f"Capacity schedule covers {sum(n for n, _ in sched)} frames "
                f"but the sequence has {L}."
            )
        caps = [c for _, c in sched]
        if any(c2 < c1 for c1, c2 in zip(caps, caps[1:])):
            raise ValueError(
                f"Capacity schedule must be non-decreasing. Got {caps}."
            )
        return sched

    def _default_icp_capacity(self, H: int, W: int, ds: Optional[int] = None) -> int:
        if self.icp_capacity is not None:
            return self.icp_capacity
        ds = self.dsratio if ds is None else ds
        return 2 * math.ceil(H / ds) * math.ceil(W / ds)

    # Map-layout knobs (overridden by PointFusion(quantize_colors=True)):
    # float colors + 1 confidence feature by default.
    _map_has_colors = True

    @property
    def _map_feature_dim(self):
        if self.feature_channels:
            # [alpha, *user] — a confidence channel always leads so the
            # feature layout is uniform across pipelines
            return 1 + self.feature_channels
        return 1 if self.has_features else None

    def empty_map(self, batch_size: int, capacity: int) -> Pointclouds:
        r"""An empty map buffer compatible with this pipeline (the initial
        value for the online ``step`` API)."""
        return Pointclouds.empty(
            batch_size,
            capacity,
            has_normals=True,
            has_colors=self._map_has_colors,
            feature_dim=self._map_feature_dim,
        )

    # kept as an alias for internal callers
    _empty_map = empty_map

    def _map(self, pointclouds: Pointclouds, live_frame: RGBDImages) -> Pointclouds:
        r"""Map update — naive aggregation (reference icpslam.py:249-263).
        Overridden by PointFusion."""
        return update_map_aggregate(pointclouds, live_frame)

    def _prune_segments(self, start: int, n: int):
        return split_prune_segments(start, n, self.prune_every)

    def _icp_target_window(
        self, pointclouds: Pointclouds, H: int, W: int
    ) -> Pointclouds:
        """Build the odometry target: a geometry-only (points + normals) view
        of the map — the solvers never read colors/features, so compacting
        them per frame would be a dead O(capacity) scatter — optionally
        sliced to the ``icp_window_frames`` recency window."""
        rows = (
            None if self.icp_window_frames is None
            else self.icp_window_frames * H * W
        )
        cap = pointclouds.capacity
        if rows is None or rows >= cap:
            return Pointclouds(
                points=pointclouds.points,
                num_points=pointclouds.num_points,
                normals=pointclouds.normals,
            )
        start = jnp.clip(pointclouds.num_points - rows, 0, cap - rows)  # (B,)

        def slice_one(buf, s):
            return jax.lax.dynamic_slice_in_dim(buf, s, rows, axis=0)

        def slice_buf(buf):
            return (
                None if buf is None else jax.vmap(slice_one)(buf, start)
            )

        return Pointclouds(
            points=slice_buf(pointclouds.points),
            num_points=jnp.minimum(pointclouds.num_points, rows),
            normals=slice_buf(pointclouds.normals),
        )

    def _localize(
        self,
        pointclouds: Pointclouds,
        live_frame: RGBDImages,
        prev_frame: RGBDImages,
        return_window: bool = False,
    ) -> jnp.ndarray:
        r"""Odometry: align the live frame against the (downsampled) active
        map (reference icpslam.py:180-247). Returns poses ``(B, 1, 4, 4)``.

        ``return_window=True`` additionally returns the finest-level
        compacted map window the solver associated against (a geometry-only
        :class:`Pointclouds`) — the in-scan health gate scores the solved
        pose against this SAME window instead of re-projecting and
        re-compacting the full map buffer, so the armed healthy path pays
        one cheap association instead of two O(capacity) passes."""
        B, _, H, W = live_frame.shape
        live_frame = live_frame.with_poses(prev_frame.poses)
        target = self._icp_target_window(pointclouds, H, W)
        active = find_active_map_points(target, prev_frame)
        finest_window = None  # set by every branch below (last level solved)

        def solve_with(prov, maps_pc, ds, init_T):
            if isinstance(prov, ProjectiveOdometryProvider):
                # frame-to-model: the live frame's own vertex/normal image
                # is the association target — no frame cloud, no KNN
                return prov.provide(maps_pc, live_frame,
                                    initial_transform=init_T)
            frames_pc = downsample_rgbdimages(live_frame, ds)
            return prov.provide(maps_pc, frames_pc, initial_transform=init_T)

        def solve_level(prov, ds, init_T):
            maps_pc = downsample_pointclouds(
                target,
                active.valid,
                active.pix_h,
                active.pix_w,
                ds,
                self._default_icp_capacity(H, W, ds),
            )
            return solve_with(prov, maps_pc, ds, init_T), maps_pc

        if self.pyramid is None:
            transform, finest_window = solve_level(
                self.odomprov, self.dsratio, None
            )
        else:
            # coarse-to-fine: each level warm-starts the next (the returned
            # transform includes the initial, so chaining composes).
            # Window compaction is O(map capacity) per call — the dominant
            # fixed cost of a tracked frame at large capacities — so when
            # the level strides nest (every coarser ds a multiple of the
            # finest: pix % ds_c == 0 implies pix % ds_f == 0), compact the
            # FULL buffer once at the finest level (pixel coords ride along
            # as two extra f32 channels) and carve the coarser windows out
            # of that small buffer. compact_masked is rank-order-preserving,
            # so the per-level windows — and therefore the trajectories —
            # are identical to the direct per-level compaction whenever the
            # finest window does not overflow (num_dropped still reports
            # fine-level overflow on every level).
            ds_fine = self.pyramid[-1][0]
            nested = len(self.pyramid) > 1 and all(
                ds_l % ds_fine == 0 for ds_l, _n in self.pyramid
            )
            transform = None
            if nested:
                capf = self._default_icp_capacity(H, W, ds_fine)
                dt = target.points.dtype
                packed = jnp.concatenate(
                    [
                        target.points,
                        target.normals,
                        active.pix_h[..., None].astype(dt),
                        active.pix_w[..., None].astype(dt),
                    ],
                    axis=-1,
                )
                keep = (
                    active.valid
                    & (active.pix_h % ds_fine == 0)
                    & (active.pix_w % ds_fine == 0)
                )
                win8, counts = compact_masked(packed, keep, capf)
                dropped_f = (
                    jnp.sum(keep.astype(jnp.int32), axis=-1) - counts
                )
                rowmask = (
                    jnp.arange(capf, dtype=jnp.int32)[None]
                    < counts[:, None]
                )
                for prov, (ds_l, _n) in zip(
                    self._pyramid_provs, self.pyramid
                ):
                    init_T = (
                        None if transform is None else transform[:, 0]
                    )
                    if ds_l == ds_fine:
                        maps_pc = Pointclouds(
                            points=win8[..., :3],
                            num_points=counts,
                            normals=win8[..., 3:6],
                            num_dropped=dropped_f,
                        )
                    else:
                        ph = win8[..., 6].astype(jnp.int32)
                        pw = win8[..., 7].astype(jnp.int32)
                        keep_l = (
                            rowmask & (ph % ds_l == 0) & (pw % ds_l == 0)
                        )
                        cap_l = self._default_icp_capacity(H, W, ds_l)
                        sub, c_l = compact_masked(
                            win8[..., :6], keep_l, cap_l
                        )
                        maps_pc = Pointclouds(
                            points=sub[..., :3],
                            num_points=c_l,
                            normals=sub[..., 3:6],
                            num_dropped=dropped_f
                            + jnp.sum(keep_l.astype(jnp.int32), axis=-1)
                            - c_l,
                        )
                    transform = solve_with(prov, maps_pc, ds_l, init_T)
                    finest_window = Pointclouds(
                        points=maps_pc.points,
                        num_points=maps_pc.num_points,
                        normals=maps_pc.normals,
                    )
            else:
                for prov, (ds, _n) in zip(
                    self._pyramid_provs, self.pyramid
                ):
                    init_T = (
                        None if transform is None else transform[:, 0]
                    )
                    transform, finest_window = solve_level(prov, ds, init_T)
        poses = compose_transformations(
            transform[:, 0], prev_frame.poses[:, 0]
        )[:, None]
        if return_window:
            return poses, finest_window
        return poses

    def _health_gate(
        self, live: RGBDImages, poses: jnp.ndarray, window: Pointclouds
    ) -> jnp.ndarray:
        """Healthy-path inlier fraction for the in-scan relocalization gate,
        scored against the odometry solve's OWN finest-level window (no
        re-projection/re-compaction of the full map — the armed overhead is
        one cheap association per frame; VERDICT r4 #4)."""
        from .health import (
            _pack_frame_geom,
            _window_health_knn,
            _window_health_projective,
        )

        if self._finest_assoc == "projective":
            B, _, H, W = live.shape
            frame_geom = _pack_frame_geom(live)
            inlier, _assoc = _window_health_projective(
                window, frame_geom, live.intrinsics[:, 0], poses[:, 0],
                H, W,
                robust_scale=self.robust_scale,
                dist_thresh=self.dist_thresh,
            )
            return inlier
        ds = self.pyramid[-1][0] if self.pyramid else self.dsratio
        frames_pc = downsample_rgbdimages(live.with_poses(poses), ds)
        return _window_health_knn(
            frames_pc, window,
            robust_scale=self.robust_scale,
            dist_thresh=self.dist_thresh,
        )

    def _maybe_relocalize(
        self,
        map_pc: Pointclouds,
        live: RGBDImages,
        poses: jnp.ndarray,
        window: Pointclouds,
    ) -> jnp.ndarray:
        """In-scan failure branch (``relocalize_below``): score the solved
        pose against the solve's own association window (cheap; see
        :meth:`_health_gate`); when any batch element is unhealthy, run the
        multi-hypothesis recovery under ``lax.cond`` (the healthy path never
        executes it — and the hypotheses run as a ``lax.scan``, so only ONE
        recovery window is ever live in the compiled program) and adopt the
        recovered pose per element only where it scores strictly better
        under the same full-health gates as the failed solve."""
        from .health import _association_health, _projective_health
        from .relocalize import perturbation_grid, relocalize

        target = Pointclouds(
            points=map_pc.points,
            num_points=map_pc.num_points,
            normals=map_pc.normals,
        )
        inlier_frac = self._health_gate(live, poses, window)
        unhealthy = inlier_frac < self.relocalize_below

        def recover(p):
            health_kw = dict(
                dsratio=self.dsratio,
                robust_scale=self.robust_scale,
                dist_thresh=self.dist_thresh,
                icp_capacity=None,
            )
            # full (re-projecting) health for BOTH sides of the acceptance
            # test: the window statistic that armed this branch was
            # compacted at the predicted pose, which a far-off recovery
            # might legitimately leave — apples-to-apples needs a statistic
            # that follows each candidate pose. All of this executes only
            # on unhealthy frames.
            health_fn = (
                _projective_health if self._finest_assoc == "projective"
                else _association_health
            )
            h1 = health_fn(target, live.with_poses(p), **health_kw)
            anchors = perturbation_grid(p[:, 0], **self.relocalize_grid)
            # recovery solves run WITHOUT the tracking dist_thresh: a tight
            # association gate starves exactly the far-off initializations
            # recovery must pull in (relocalize's own default rationale)
            rec, _info = relocalize(
                target,
                live,
                anchors,
                odom=self.odom,
                dsratio=self.relocalize_dsratio,
                numiters=self.relocalize_numiters,
                robust_scale=self.robust_scale,
                hypothesis_mode="scan",
            )
            h2 = health_fn(target, live.with_poses(rec), **health_kw)
            take = (unhealthy & (h2["inlier_frac"] > h1["inlier_frac"]))
            return jnp.where(take[:, None, None, None], rec, p)

        return jax.lax.cond(jnp.any(unhealthy), recover, lambda p: p, poses)

    def _anchor_snapshot(self, live: RGBDImages) -> Tuple[jnp.ndarray, ...]:
        """Frozen keyframe snapshot (world-frame strided points + normals +
        counts) for the in-scan drift gate — the scan-carry form of
        :func:`~gradslam_tpu.slam.health.keyframe_anchor`. Strided anchors
        are safe here because the gate associates PROJECTIVELY (no mod-ds
        map-side filter to alias against — the trap documented on
        ``keyframe_anchor`` applies to the KNN health only)."""
        ds = self.anchor_dsratio or self.dsratio
        pc = downsample_rgbdimages(live, ds)
        # drop zero-normal rows: their plane residual is 0 at any pose, so
        # they would score as unconditional inliers in the drift gate and
        # mask the drift the anchor exists to expose (see keyframe_anchor)
        solid = pc.nonpad_mask & (
            jnp.sum(pc.normals * pc.normals, axis=-1) > 0.0
        )
        cap = pc.points.shape[1]
        pts, cnt = compact_masked(pc.points, solid, cap)
        nrm, _ = compact_masked(pc.normals, solid, cap)
        return pts, nrm, cnt

    def _maybe_anchor_recover(
        self,
        anchor: Tuple[jnp.ndarray, ...],
        live: RGBDImages,
        poses: jnp.ndarray,
    ) -> jnp.ndarray:
        """Auto-arming slow-drift recovery: score the solved pose against
        the FROZEN keyframe anchor (self-consistent map health cannot see
        slow drift — health.py's documented blind spot); when the anchor
        disagrees while still in view, re-solve against the anchor itself
        under ``lax.cond``. Relocalizing against the self-fused map would
        return the drifted pose right back — the anchor is the only
        non-drifted reference in the program."""
        from .health import _pack_frame_geom, _window_health_projective

        a_pts, a_nrm, a_cnt = anchor
        anchor_pc = Pointclouds(
            points=a_pts, num_points=a_cnt, normals=a_nrm
        )
        B, _, H, W = live.shape
        frame_geom = _pack_frame_geom(live)
        hkw = dict(robust_scale=self.robust_scale,
                   dist_thresh=self.dist_thresh)

        def anchor_health(pose_b):
            """Anchor statistics: ABSOLUTE and CONDITIONAL inlier fraction.
            The absolute fraction decays as the camera legitimately moves
            away from the anchor's view, so the DRIFT GATE thresholds the
            conditional ratio (inliers among admissible — view-invariant:
            measured on an 18-frame 5 mm/frame drift, absolute decays
            1.0 -> 0.22 at the TRUE poses while the conditional stays 1.00
            and the drifted solve reads ~0.97). ACCEPTANCE, by contrast,
            compares the absolute fraction: a recovery that rejects most
            rows can game the conditional ratio on a few survivors
            (measured: a 287 mm-worse pose passed a conditional-only test),
            but it cannot fake admissible support."""
            inl, ass = _window_health_projective(
                anchor_pc, frame_geom, live.intrinsics[:, 0], pose_b,
                H, W, **hkw,
            )
            return inl, inl / jnp.maximum(ass, 1e-6), ass

        inl, cond, assoc = anchor_health(poses[:, 0])
        # visibility guard: an anchor that left the frustum cannot alarm
        drifting = (assoc > 0.2) & (cond < self.anchor_below)

        def recover(p):
            # ONE robust KNN solve against the anchor, from the current
            # pose. KNN on purpose: the plane-residual objective shares the
            # solver's tangential blindness, but 3D nearest neighbours
            # re-anchor on surface relief — exactly the error component
            # slow drift accumulates. Tukey instead of the kidnap path's
            # plain LS: frame points with no anchor counterpart (newly seen
            # scene) would drag an unweighted solve off the optimum
            # entirely (measured: plain ungated 88 -> 753 mm; tukey
            # 88 -> 64 mm). No hypothesis grid — drift is a small
            # perturbation, the basin contains the current pose.
            live_p = live.with_poses(p)
            frames_pc = downsample_rgbdimages(live_p, self.dsratio)
            prov_cls = (
                GradICPOdometryProvider if self.odom == "gradicp"
                else ICPOdometryProvider
            )
            prov = prov_cls(
                numiters=self.relocalize_numiters,
                robust_loss="tukey",
                robust_scale=2.0 * self.robust_scale,
            )
            X = prov.provide(anchor_pc, frames_pc)
            rec = orthonormalize_rotations(
                compose_transformations(X[:, 0], p[:, 0])
            )[:, None]
            in2, _c2, _a2 = anchor_health(rec[:, 0])
            take = drifting & (in2 > inl)
            return jnp.where(take[:, None, None, None], rec, p)

        poses = jax.lax.cond(jnp.any(drifting), recover, lambda p: p, poses)
        return poses, drifting

    def _with_normal_pitch(self, frames: RGBDImages) -> RGBDImages:
        """Apply the pipeline's ``normal_pitch`` override (None = keep the
        frames' own pitch, default 1 = reference-parity normals)."""
        if (
            self.normal_pitch is None
            or frames.normal_pitch == self.normal_pitch
        ):
            return frames
        return dataclasses.replace(frames, normal_pitch=self.normal_pitch)

    def _localize_impl(self, pointclouds, live_frame, prev_frame, prev_transform=None):
        live_frame = self._with_normal_pitch(live_frame)
        if prev_transform is not None:
            # constant-velocity prior: solve from (and project the
            # association window at) the predicted camera. Re-projected onto
            # SO(3) exactly like the scanned forward (orthonormality error
            # otherwise compounds exponentially across step() calls).
            pred = orthonormalize_rotations(compose_transformations(
                jnp.asarray(prev_transform), prev_frame.poses[:, 0]
            ))
            prev_frame = prev_frame.with_poses(pred[:, None])
        return self._localize(pointclouds, live_frame, prev_frame)

    def _step_impl(self, pointclouds, live_frame, prev_frame, prev_transform=None):
        poses = self._localize_impl(
            pointclouds, live_frame, prev_frame, prev_transform
        )
        live_frame = self._with_normal_pitch(live_frame).with_poses(poses)
        pointclouds = self._map(pointclouds, live_frame)
        return pointclouds, poses

    def _forward_impl(self, frames: RGBDImages):
        frames = self._with_normal_pitch(frames)
        B, L, H, W = frames.shape
        schedule = self._capacity_schedule(frames)
        map_pc = self._empty_map(B, schedule[0][1])
        intrinsics = frames.intrinsics

        hf = frames.feature_image is not None
        if self.odom == "gt":
            # Pure mapping under ground-truth poses: scan appends each frame.
            rgb_l = jnp.moveaxis(frames.rgb_image, 1, 0)  # (L, B, H, W, 3)
            depth_l = jnp.moveaxis(frames.depth_image, 1, 0)
            poses_l = jnp.moveaxis(frames.poses, 1, 0)  # (L, B, 4, 4)
            feat_l = (
                jnp.moveaxis(frames.feature_image, 1, 0) if hf else None
            )

            def body(map_pc, xs):
                rgb, depth, pose, idx = xs[:4]
                live = RGBDImages(
                    rgb[:, None], depth[:, None], intrinsics, pose[:, None],
                    feature_image=xs[4][:, None] if hf else None,
                    normal_pitch=frames.normal_pitch,
                )
                return self._map(map_pc, live), pose

            if self.remat:
                body = jax.checkpoint(body)
            frame_ids = jnp.arange(L, dtype=jnp.int32)
            chunks = []
            start = 0
            for n, cap_seg in schedule:
                map_pc = map_pc.with_capacity(cap_seg)
                # prune_map runs BETWEEN sub-scans (see _prune_segments: a
                # lax.cond inside the body would block map-buffer aliasing)
                for sub_n, prune_after in self._prune_segments(start, n):
                    map_pc, poses_out = jax.lax.scan(
                        body,
                        map_pc,
                        (
                            rgb_l[start:start + sub_n],
                            depth_l[start:start + sub_n],
                            poses_l[start:start + sub_n],
                            frame_ids[start:start + sub_n],
                        ) + ((feat_l[start:start + sub_n],) if hf else ()),
                    )
                    if prune_after:
                        map_pc = prune_map(
                            map_pc, self.prune_min_confidence
                        )
                    chunks.append(poses_out)
                    start += sub_n
            poses_out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
            return map_pc, jnp.moveaxis(poses_out, 0, 1)

        # ICP / GradICP odometry: bootstrap frame 0 with the provided (or
        # identity) pose, then track frame-to-map.
        if frames.poses is not None:
            pose0 = frames.poses[:, 0]
        else:
            pose0 = jnp.broadcast_to(
                jnp.eye(4, dtype=frames.depth_image.dtype), (B, 4, 4)
            )
        live0 = frames[:, 0].with_poses(pose0[:, None])
        map_pc = self._map(map_pc, live0)
        if self.prune_every == 1:  # (0 + 1) % prune_every == 0 iff every frame
            map_pc = prune_map(map_pc, self.prune_min_confidence)

        rgb_l = jnp.moveaxis(frames.rgb_image[:, 1:], 1, 0)
        depth_l = jnp.moveaxis(frames.depth_image[:, 1:], 1, 0)
        feat_l = (
            jnp.moveaxis(frames.feature_image[:, 1:], 1, 0) if hf else None
        )

        cv = self.motion_model == "constant_velocity"

        anchored = self.anchor_every > 0

        def body(carry, xs):
            if anchored:
                map_pc, prev_pose, prev_delta, anchor = carry
            else:
                map_pc, prev_pose, prev_delta = carry
            rgb, depth, idx = xs[:3]
            # _localize reads only poses/intrinsics/shape from its
            # prev_frame argument (the active-map projection camera), so the
            # live frame — carrying the predicted pose until odometry
            # updates it — serves as both arguments. There is no
            # previous-frame imagery in the carry, unlike the reference's
            # frame pairs.
            # the CV composition chain pose @ inv(prev) @ pose DOUBLES f32
            # rotation orthonormality error per frame (det(R) reaches O(10)
            # by frame ~20, then overflows) — re-project onto SO(3)
            pred = (
                orthonormalize_rotations(
                    compose_transformations(prev_delta, prev_pose)
                )
                if cv else prev_pose
            )
            live = RGBDImages(
                rgb[:, None], depth[:, None], intrinsics, pred[:, None],
                feature_image=xs[3][:, None] if hf else None,
                normal_pitch=frames.normal_pitch,
            )
            if self.relocalize_below > 0:
                poses, window = self._localize(
                    map_pc, live, live, return_window=True
                )  # (B, 1, 4, 4)
                poses = self._maybe_relocalize(map_pc, live, poses, window)
                if anchored:
                    # slow-drift gate against the frozen keyframe (the
                    # self-consistent gate above cannot see drift)
                    poses, drifting = self._maybe_anchor_recover(
                        anchor, live, poses
                    )
            else:
                poses = self._localize(map_pc, live, live)  # (B, 1, 4, 4)
            live = live.with_poses(poses)
            map_pc = self._map(map_pc, live)
            # world-frame relative transform (poses compose as T @ prev):
            # delta_k = pose_k @ pose_{k-1}^-1, next frame's CV prediction
            delta = (
                compose_transformations(
                    poses[:, 0], inverse_transformation(prev_pose)
                )
                if cv else prev_delta
            )
            if anchored:
                # periodic refresh AT THE (possibly recovered) SOLVED pose,
                # but never while a batch element reads as drifting —
                # refreshing then would bake the drift into the reference.
                # The blind window is the refresh interval (health.py docs).
                refresh = ((idx % self.anchor_every) == 0) & ~drifting  # (B,)

                def _refresh_anchor(a):
                    # snapshot computed ONLY on refresh frames — the cond
                    # carries just the small anchor tuple, so the map-
                    # aliasing tax of an in-scan cond (split_prune_segments
                    # docs) does not apply here
                    snap = self._anchor_snapshot(live)
                    return tuple(
                        jnp.where(
                            refresh.reshape((-1,) + (1,) * (n.ndim - 1)),
                            n, o,
                        )
                        for n, o in zip(snap, a)
                    )

                anchor = jax.lax.cond(
                    jnp.any(refresh), _refresh_anchor, lambda a: a, anchor
                )
                return (map_pc, poses[:, 0], delta, anchor), poses[:, 0]
            return (map_pc, poses[:, 0], delta), poses[:, 0]

        if self.remat:
            body = jax.checkpoint(body)
        frame_ids = jnp.arange(1, L, dtype=jnp.int32)
        chunks = []
        start = 0
        prev_pose = pose0
        prev_delta = jnp.broadcast_to(jnp.eye(4, dtype=pose0.dtype), (B, 4, 4))
        # seed the drift anchor from the (trusted) bootstrap frame
        anchor = self._anchor_snapshot(live0) if anchored else None
        for i, (n, cap_seg) in enumerate(schedule):
            n_scan = n - 1 if i == 0 else n  # frame 0 was mapped above
            map_pc = map_pc.with_capacity(cap_seg)
            if n_scan == 0:
                continue
            # global frame of scan-local s is s + 1 (frame 0 is outside the
            # scan); prune_map runs BETWEEN sub-scans (see _prune_segments)
            for sub_n, prune_after in self._prune_segments(
                start + 1, n_scan
            ):
                carry0 = (
                    (map_pc, prev_pose, prev_delta, anchor) if anchored
                    else (map_pc, prev_pose, prev_delta)
                )
                carry1, poses_seg = jax.lax.scan(
                    body,
                    carry0,
                    (
                        rgb_l[start:start + sub_n],
                        depth_l[start:start + sub_n],
                        frame_ids[start:start + sub_n],
                    ) + ((feat_l[start:start + sub_n],) if hf else ()),
                )
                if anchored:
                    map_pc, prev_pose, prev_delta, anchor = carry1
                else:
                    map_pc, prev_pose, prev_delta = carry1
                if prune_after:
                    map_pc = prune_map(map_pc, self.prune_min_confidence)
                chunks.append(poses_seg)
                start += sub_n
        if not chunks:  # L == 1: only the bootstrap frame was mapped
            return map_pc, pose0[:, None]
        poses_rest = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
        poses_out = jnp.concatenate(
            [pose0[:, None], jnp.moveaxis(poses_rest, 0, 1)], axis=1
        )
        return map_pc, poses_out
