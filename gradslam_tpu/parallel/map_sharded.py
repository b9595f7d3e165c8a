r"""Map-axis-sharded SLAM — explicit multi-chip fusion + tracking via
``jax.shard_map`` (new capability; the reference is single-device,
SURVEY §2.3).

For maps too large for one chip's HBM, the fixed-capacity buffer's point axis
is sharded over a mesh axis: each of the K shards owns ``CAP/K`` rows of
points/normals/colors/ccounts plus its own live counter. One fusion step
(reference fusionutils.py:761-789 semantics) becomes:

1. **Local association** — each shard projects ITS map rows into the frame
   (streaming math), gates them against the (replicated) frame, and selects
   per-pixel winners among its own rows with the flat 4-key sort (the exact
   lexicographic criterion of fusionutils.py:509-544, tie-broken by GLOBAL
   row index).
2. **Cross-shard winner reduction** — each shard ``all_gather``s its three
   per-pixel winner tables (ccount, ray distance, global row index;
   ``3 * H*W * 4`` bytes) over the mesh axis and folds them
   lexicographically. These collectives ride ICI.
3. **Row-side merge + strided append** — the shard owning a pixel's winning
   row merges it in place (confidence-weighted average, gathering frame data
   at the row's own pixel); un-corresponded valid pixels are dealt
   round-robin across shards (pixel with append rank ``r`` goes to shard
   ``r % K``), so the map grows balanced with zero communication.

Tracked odometry (``odom='icp'|'gradicp'``) adds one more collective per
frame: each shard compacts its active, strided-downsampled map rows
(reference icputils.py:548-621 semantics) into a fixed window, the windows
are ``all_gather``-ed into the global ICP target, and every shard runs the
identical (replicated-compute) gradLM solve — the solver operates on the
small downsampled clouds, so duplicating it across shards is far cheaper
than sharding it.

Winner semantics match the single-device path exactly up to the global row
numbering: appends land at different global rows than a single-device run,
so ties in (ccount, ray distance) — i.e. exactly duplicated points — may
tie-break differently. Point sets and confidence mass are identical.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry.geometryutils import (
    compose_transformations,
    inverse_transformation,
    orthonormalize_rotations,
)
from ..geometry.se3utils import se3_exp
from ..odometry.icputils import (
    _ptp_system,
    _safe_sqrt,
    point_to_plane_ICP,
    point_to_plane_gradICP,
    validate_pyramid,
    validate_robust,
)
from ..odometry.projective import projective_associate
from ..ops import nn_points_auto
from ..utils.precision import einsum_hp, matmul_hp
from ..slam.fusionutils import (
    _project_map_points,
    get_alpha,
    pack_colors,
    unpack_colors,
)
from ..slam.icpslam import split_prune_segments
from ..structures.pointclouds import Pointclouds, compact_masked
from ..structures.rgbdimages import RGBDImages

__all__ = ["ShardedMap", "MapShardedPointFusion", "nn_points_map_sharded"]


def nn_points_map_sharded(src, tgt_local, tgt_mask_local=None, *, axis_name):
    r"""1-NN against a target cloud sharded along its point axis.

    Runs inside ``shard_map``: each shard solves 1-NN against its local
    target rows, then one ``all_gather`` of the (distance, global-index)
    pairs folds to the global winner. Exact same result as single-device
    ``nn_points`` on the concatenated target (ties resolve to the smallest
    global index). The result is bit-identical on every shard but JAX's
    varying-axes checker can't prove it — callers returning it replicated
    need ``check_vma=False`` on their ``shard_map``.
    """
    d, i = nn_points_auto(src, tgt_local, tgt_mask_local)
    C = tgt_local.shape[-2]
    base = jax.lax.axis_index(axis_name) * C
    gi = i + base
    ad = jax.lax.all_gather(d, axis_name, axis=0)  # (K, ..., N)
    ai = jax.lax.all_gather(gi, axis_name, axis=0)
    best_d, best_i = ad[0], ai[0]
    for k in range(1, ad.shape[0]):
        take = ad[k] < best_d  # strict: ties keep the earlier (smaller) index
        best_d = jnp.where(take, ad[k], best_d)
        best_i = jnp.where(take, ai[k], best_i)
    return best_d, best_i


class ShardedMap(NamedTuple):
    r"""Map buffers sharded along the capacity axis.

    ``points/normals/colors/features`` are global ``(B, CAP, ·)`` arrays
    placed with the point axis sharded; ``num_points`` is ``(K, B)`` — one
    live counter per shard (each shard's valid rows are a prefix of its own
    ``CAP/K``-row slice, NOT of the global buffer). ``colors`` is
    ``(B, CAP, 1)`` packed (see ``fusionutils.pack_colors``) when built with
    ``quantize_colors=True``. ``num_dropped (K, B)`` counts rows each shard
    had to drop because its slice was full (overflow accounting — see
    ``Pointclouds.num_dropped``).
    """

    points: jnp.ndarray  # (B, CAP, 3)
    normals: jnp.ndarray  # (B, CAP, 3)
    colors: jnp.ndarray  # (B, CAP, 3) float or (B, CAP, 1) packed
    features: jnp.ndarray  # (B, CAP, 1 + F) = [ccount, *user]
    num_points: jnp.ndarray  # (K, B) int32
    num_dropped: jnp.ndarray  # (K, B) int32

    def to_pointclouds(self) -> Pointclouds:
        """Host-side compaction into a standard (unsharded) Pointclouds.
        Packed colors (quantize_colors builds) are unpacked to float — AFTER
        the live-row compaction, host-side: unpacking the full (B, CAP)
        padded buffer on device would allocate 3x CAP extra HBM on maps that
        are sharded precisely because CAP is huge."""
        packed = self.colors.shape[-1] == 1
        pts = np.asarray(jax.device_get(self.points))
        nrm = np.asarray(jax.device_get(self.normals))
        col = np.asarray(jax.device_get(self.colors))
        feat = np.asarray(jax.device_get(self.features))
        nums = np.asarray(jax.device_get(self.num_points))  # (K, B)
        K, B = nums.shape
        C = pts.shape[1] // K
        pts_l, nrm_l, col_l, feat_l = [], [], [], []
        for b in range(B):
            keep = np.zeros(pts.shape[1], dtype=bool)
            for k in range(K):
                keep[k * C : k * C + nums[k, b]] = True
            pts_l.append(pts[b][keep])
            nrm_l.append(nrm[b][keep])
            cb = col[b][keep]
            if packed:  # same math as fusionutils.unpack_colors, in numpy
                v = cb[..., 0].astype(np.int64)
                cb = np.stack(
                    [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=-1
                ).astype(np.float32) / 255.0
            col_l.append(cb)
            feat_l.append(feat[b][keep])
        pc = Pointclouds.from_list(pts_l, normals=nrm_l, colors=col_l,
                                   features=feat_l)
        import dataclasses

        return dataclasses.replace(
            pc,
            num_dropped=jnp.asarray(
                np.asarray(jax.device_get(self.num_dropped)).sum(axis=0),
                dtype=jnp.int32,
            ),
        )


def _transform_pts(pts, pose):
    """Rigid transform of (B, N, 3) by (B, 4, 4) — explicit FMAs."""
    R = pose[:, :3, :3]
    t = pose[:, :3, 3]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]

    def row(i):
        return (R[:, i, 0][:, None] * x + R[:, i, 1][:, None] * y
                + R[:, i, 2][:, None] * z + t[:, i][:, None])

    return jnp.stack([row(0), row(1), row(2)], axis=-1)


def _rotate_pts(pts, pose):
    R = pose[:, :3, :3]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]

    def row(i):
        return (R[:, i, 0][:, None] * x + R[:, i, 1][:, None] * y
                + R[:, i, 2][:, None] * z)

    return jnp.stack([row(0), row(1), row(2)], axis=-1)


class MapShardedPointFusion:
    r"""PointFusion with the map's point axis sharded over a mesh axis — the
    whole frame scan runs inside one ``shard_map``-ed jit.

    Args:
        map_capacity: GLOBAL capacity; must be divisible by the map-axis
            mesh size.
        mesh: mesh to shard over (default: all devices on a 1-D axis
            'map'). A 2-D mesh composes batch (data) parallelism with map
            sharding: pass ``batch_axis`` naming the batch mesh axis and
            ``axis_name`` naming the map axis — each batch element's map
            lives sharded across that element's row of map-axis devices, and
            all fusion/odometry collectives stay within the row (fusion is
            independent per batch element, so no cross-batch communication
            exists).
        batch_axis: name of the mesh axis the batch dim is sharded over
            (2-D meshes only; None = map-only sharding).
        odom: 'gt' (poses given), 'icp' or 'gradicp' (frame-to-map tracking
            with the solver replicated across shards and the ICP target
            all-gathered from per-shard active windows).
        odom_assoc: ``'knn'`` (default; all-gathered window, per-iteration
            KNN) or ``'projective'`` — each shard builds point-to-plane rows
            for its OWN window by projection+gather against the replicated
            frame image and only the 6x6 normal equations are psum-folded
            (~230 bytes/iteration; no window collective at all). With a
            ``pyramid``, also a per-level list for hybrid schedules
            (``['projective', 'knn']`` — see :class:`gradslam_tpu.ICPSLAM`);
            trajectories match the single-device hybrid.
        odom_angle_gate: optional maximum angle (degrees) between the frame
            normal and the associated map normal, both association modes
            (on KNN levels the strided frame normals ride as 3 extra source
            channels and gate the nearest-neighbour rows; see
            :class:`gradslam_tpu.ICPSLAM`).
        odom_sym_normals: symmetric point-to-plane normals for the
            projective solver (``odom_assoc='projective'`` only; see
            :class:`gradslam_tpu.ICPSLAM` — the anti-drift fix for noisy
            depth). Matches the single-device pipeline's knob so sharded
            trajectories stay comparable config-for-config.
        odom_subpixel: bilinear (sub-pixel) projective association
            (``odom_assoc='projective'`` only; see
            :class:`gradslam_tpu.ICPSLAM`) — per-shard lookups, no extra
            collective traffic.
        pyramid: optional coarse-to-fine ``[(dsratio, numiters), ...]``
            schedule (see :class:`gradslam_tpu.ICPSLAM`) — each level
            all-gathers its own target window and warm-starts the next.
        icp_capacity: per-shard active-window size for the ICP target
            (default: the single-device window ``2*ceil(H/ds)*ceil(W/ds)`` —
            sized so even a maximally imbalanced shard fits its actives).
            Note the K shards therefore hold up to K× the single-device
            window: when the active set OVERFLOWS the single-device window,
            the sharded solve keeps rows the single-device solve truncates
            (a strictly larger association set). Exact single-device
            trajectory equality under overflow requires matching the TOTAL
            capacity (e.g. ``icp_capacity = single_device_capacity``
            on both).
        motion_model: ``'static'`` (default) or ``'constant_velocity'`` —
            same semantics as :class:`gradslam_tpu.ICPSLAM`.
        dist_th / angle_th / sigma and the solver parameters match
            :class:`gradslam_tpu.PointFusion` defaults.
    """

    def __init__(
        self,
        *,
        map_capacity: int,
        mesh: Optional[Mesh] = None,
        axis_name: str = "map",
        batch_axis: Optional[str] = None,
        odom: str = "gt",
        odom_assoc: str = "knn",
        odom_angle_gate: Optional[float] = None,
        odom_sym_normals: bool = False,
        odom_subpixel: bool = False,
        dsratio: int = 4,
        numiters: int = 20,
        pyramid: Optional[list] = None,
        damp: float = 1e-8,
        dist_thresh: Optional[float] = None,
        lambda_max: float = 2.0,
        B: float = 1.0,
        B2: float = 1.0,
        nu: float = 200.0,
        lookahead_assoc: str = "fresh",
        motion_model: str = "static",
        robust_loss: Optional[str] = None,
        robust_scale: float = 0.05,
        icp_capacity: Optional[int] = None,
        dist_th: float = 0.05,
        angle_th: float = 20.0,
        sigma: float = 0.6,
        quantize_colors: bool = False,
        feature_channels: int = 0,
        normal_pitch: Optional[int] = None,
        prune_every: int = 0,
        prune_min_confidence: float = 1.5,
        use_jit: bool = True,
    ):
        if odom not in ("gt", "icp", "gradicp"):
            raise ValueError(f"Odometry method ({odom}) not supported.")
        if isinstance(odom_assoc, (list, tuple)):
            # per-level association (hybrid pyramids; see ICPSLAM)
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
        self.odom_dot_gate = (
            None if odom_angle_gate is None
            else math.cos(math.radians(odom_angle_gate))
        )
        if odom_sym_normals and not any_projective:
            raise ValueError(
                "odom_sym_normals requires odom_assoc='projective'."
            )
        self.odom_sym_normals = bool(odom_sym_normals)
        if odom_subpixel and not any_projective:
            raise ValueError(
                "odom_subpixel requires odom_assoc='projective'."
            )
        self.odom_subpixel = bool(odom_subpixel)
        if normal_pitch is not None and (
            not isinstance(normal_pitch, int) or normal_pitch < 1
        ):
            raise ValueError(
                f"normal_pitch must be None or an int >= 1. Got {normal_pitch!r}."
            )
        self.normal_pitch = normal_pitch
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
        if axis_name not in mesh.axis_names:
            raise ValueError(
                f"mesh has no axis {axis_name!r} (axes: {mesh.axis_names})."
            )
        if batch_axis is None and len(mesh.axis_names) > 1:
            raise ValueError(
                "multi-axis mesh requires batch_axis naming the batch "
                f"(data-parallel) axis (mesh axes: {mesh.axis_names})."
            )
        if batch_axis is not None:
            if batch_axis not in mesh.axis_names:
                raise ValueError(
                    f"mesh has no axis {batch_axis!r} "
                    f"(axes: {mesh.axis_names})."
                )
            if batch_axis == axis_name:
                raise ValueError("batch_axis must differ from axis_name.")
        self.mesh = mesh
        self.axis_name = axis_name
        self.batch_axis = batch_axis
        self.K = int(mesh.shape[axis_name])
        self.dp = int(mesh.shape[batch_axis]) if batch_axis else 1
        if map_capacity % self.K != 0:
            raise ValueError(
                f"map_capacity ({map_capacity}) must be divisible by the "
                f"map-axis mesh size ({self.K})."
            )
        self.map_capacity = map_capacity
        self.odom = odom
        self.dsratio = dsratio
        self.numiters = numiters
        self.pyramid = validate_pyramid(pyramid)
        self.damp = damp
        self.dist_thresh = dist_thresh
        self.lambda_max = lambda_max
        self.B_lm = B
        self.B2 = B2
        self.nu = nu
        self.lookahead_assoc = lookahead_assoc
        if motion_model not in ("static", "constant_velocity"):
            raise ValueError(
                f"Unknown motion_model: {motion_model!r}. "
                "Expected 'static' or 'constant_velocity'."
            )
        self.motion_model = motion_model
        validate_robust(robust_loss, robust_scale)
        self.robust_loss = robust_loss
        self.robust_scale = robust_scale
        self.icp_capacity = icp_capacity
        self.dist_th = dist_th
        self.dot_th = math.cos(angle_th * math.pi / 180.0)
        self.sigma = sigma
        # Packed 8-bit colors (see fusionutils.pack_colors): each shard's
        # color slice shrinks 3x in HBM and the frame-color gather rides the
        # packed frame row instead of a separate 3-wide gather. Same
        # trade-off as PointFusion(quantize_colors=True).
        self.quantize_colors = bool(quantize_colors)
        # Semantic / user feature channels (same contract as
        # PointFusion(feature_channels=F)): the sharded feature slice widens
        # to [ccount, *user] and frames must carry a matching feature_image.
        if not isinstance(feature_channels, int) or feature_channels < 0:
            raise ValueError(
                f"feature_channels must be a non-negative int. "
                f"Got {feature_channels!r}."
            )
        self.feature_channels = feature_channels
        # Keller-style map maintenance (same contract as
        # PointFusion(prune_every=..., prune_min_confidence=...)): every
        # prune_every-th mapped frame, rows whose leading ccount feature is
        # below prune_min_confidence are compacted away PER SHARD — no
        # cross-device traffic, and (like the single-device pipelines) the
        # prune runs between scan segments, never as an in-scan lax.cond
        # (slam.icpslam.split_prune_segments documents the aliasing tax).
        if not isinstance(prune_every, int) or prune_every < 0:
            raise ValueError(
                f"prune_every must be a non-negative int. Got {prune_every!r}."
            )
        self.prune_every = prune_every
        self.prune_min_confidence = prune_min_confidence
        self._forward = jax.jit(self._forward_impl) if use_jit else self._forward_impl

    # ------------------------------------------------------------------ #

    def __call__(self, frames: RGBDImages) -> Tuple[ShardedMap, jnp.ndarray]:
        return self.forward(frames)

    def forward(self, frames: RGBDImages) -> Tuple[ShardedMap, jnp.ndarray]:
        r"""Run SLAM over the whole sequence; returns the sharded map and the
        trajectory ``(B, L, 4, 4)`` (pass-through for 'gt', tracked
        otherwise)."""
        if self.odom == "gt" and frames.poses is None:
            raise ValueError("MapShardedPointFusion(odom='gt') requires poses.")
        if frames.shape[0] % self.dp != 0:
            raise ValueError(
                f"batch size ({frames.shape[0]}) must be divisible by the "
                f"batch-axis mesh size ({self.dp})."
            )
        if frames.feature_channels != self.feature_channels:
            raise ValueError(
                f"frames carry {frames.feature_channels} feature channel(s) "
                f"but this pipeline fuses {self.feature_channels} — construct "
                "MapShardedPointFusion(feature_channels=...) to match."
            )
        # channels-first frames would reshape into scrambled (HW, C) rows
        return self._forward(frames.to_channels_last())

    # ------------------------------------------------------------------ #

    def _solve_one(self, src, src_mask, tgt, tgt_normals, tgt_mask,
                   init_T=None, numiters=None, src_normals=None):
        kw = dict(
            initial_transform=(
                jnp.eye(4, dtype=src.dtype) if init_T is None else init_T
            ),
            numiters=self.numiters if numiters is None else numiters,
            damp=self.damp,
            dist_thresh=self.dist_thresh,
            src_mask=src_mask,
            tgt_mask=tgt_mask,
            lookahead_assoc=self.lookahead_assoc,
            robust_loss=self.robust_loss,
            robust_scale=self.robust_scale,
            src_normals=src_normals,
            dot_gate=self.odom_dot_gate if src_normals is not None else None,
        )
        if self.odom == "icp":
            T, _ = point_to_plane_ICP(src, tgt, tgt_normals, **kw)
        else:
            T, _ = point_to_plane_gradICP(
                src, tgt, tgt_normals,
                lambda_max=self.lambda_max, B=self.B_lm, B2=self.B2, nu=self.nu,
                **kw,
            )
        return T

    def _forward_impl(self, frames: RGBDImages):
        # wider normal baseline on noisy sensors (same semantics as
        # ICPSLAM/PointFusion(normal_pitch=...); see docs/design.md §4)
        if (
            self.normal_pitch is not None
            and frames.normal_pitch != self.normal_pitch
        ):
            import dataclasses

            frames = dataclasses.replace(
                frames, normal_pitch=self.normal_pitch
            )
        B, L, H, W = frames.shape
        HW = H * W
        K = self.K
        C = self.map_capacity // K
        axis = self.axis_name
        # Batch (data-parallel) axis: None on a 1-D mesh — P(None, None)
        # degrades to fully replicated, so one spec set covers both layouts.
        ba = self.batch_axis
        ds = self.dsratio
        tracked = self.odom != "gt"

        # Replicated per-frame data (L leading). Vertex/normal maps are kept
        # in the CAMERA frame; the scan body applies the (possibly tracked)
        # pose with streaming math.
        lv = jnp.moveaxis(frames.vertex_map.reshape(B, L, HW, 3), 1, 0)
        ln = jnp.moveaxis(frames.normal_map.reshape(B, L, HW, 3), 1, 0)
        fc = jnp.moveaxis(frames.rgb_image.reshape(B, L, HW, 3), 1, 0)
        fa = jnp.moveaxis(
            get_alpha(frames.vertex_map, sigma=self.sigma, dim=4, keepdim=True)
            .reshape(B, L, HW, 1), 1, 0)
        fvalid = jnp.moveaxis(frames.valid_depth_mask.reshape(B, L, HW), 1, 0)
        # User feature plane; zero-width when none — one code path, XLA
        # elides every op on a 0-channel array.
        F = self.feature_channels
        fu = (
            jnp.moveaxis(frames.feature_image.reshape(B, L, HW, F), 1, 0)
            if F else jnp.zeros((L, B, HW, 0), jnp.float32)
        )
        intr = frames.intrinsics[:, 0]  # (B, 4, 4)

        if frames.poses is not None:
            poses_in = jnp.moveaxis(frames.poses, 1, 0)  # (L, B, 4, 4)
        else:
            poses_in = jnp.broadcast_to(
                jnp.eye(4, dtype=frames.depth_image.dtype), (L, B, 4, 4))

        if tracked:
            # one level per pyramid entry (single level = flat
            # dsratio/numiters); per-shard window capacities per level
            levels = self.pyramid or [(ds, self.numiters)]
            wins = [
                self.icp_capacity if self.icp_capacity is not None
                else 2 * math.ceil(H / ds_l) * math.ceil(W / ds_l)
                for ds_l, _n in levels
            ]
            assocs = (
                self.odom_assoc
                if isinstance(self.odom_assoc, tuple)
                else (self.odom_assoc,) * len(levels)
            )
        else:
            levels = []
            wins = []
            assocs = ()
        # all-projective / all-knn keep their dedicated (tested) paths;
        # a mixed per-level list dispatches per level (localize_mixed)
        projective = tracked and assocs != () and all(
            a == "projective" for a in assocs
        )
        mixed = tracked and len(set(assocs)) > 1
        # with an angle gate on a KNN level, the strided frame NORMALS ride
        # as 3 extra channels of the source cloud (vertex | normal) so the
        # scan plumbing/shard specs stay unchanged
        knn_gate = self.odom_dot_gate is not None
        src_w = 6 if knn_gate else 3
        if tracked and any(a == "knn" for a in assocs):
            # Strided local frame clouds for ICP (reference icputils.py:623),
            # one per pyramid level. The projective mode needs none of this —
            # its association target is the frame image already in lv/ln.
            # Projective levels of a mixed schedule get 1-point placeholders
            # so per-level indices stay aligned.
            sls, svs = [], []
            for (ds_l, _n), a_l in zip(levels, assocs):
                if a_l == "projective":
                    sls.append(jnp.zeros((L, B, 1, src_w), jnp.float32))
                    svs.append(jnp.zeros((L, B, 1), bool))
                    continue
                sl_l = frames.vertex_map[:, :, ::ds_l, ::ds_l].reshape(B, L, -1, 3)
                if knn_gate:
                    sn_l = frames.normal_map[:, :, ::ds_l, ::ds_l].reshape(
                        B, L, -1, 3)
                    sl_l = jnp.concatenate([sl_l, sn_l], axis=-1)
                sv_l = frames.valid_depth_mask[:, :, ::ds_l, ::ds_l].reshape(B, L, -1)
                sls.append(jnp.moveaxis(sl_l, 1, 0))  # (L, B, Nf_l, 3|6)
                svs.append(jnp.moveaxis(sv_l, 1, 0))
            sl, sv = tuple(sls), tuple(svs)
        else:
            sl = sv = None

        dist_th, dot_th = self.dist_th, self.dot_th
        GCAP = jnp.int32(K * C)
        quantized = self.quantize_colors

        def sharded_scan(lv, ln, fc, fa, fvalid, fu, poses_in, intr, sl, sv):
            # Local batch size: under a 2-D (batch x map) mesh each device
            # sees B / dp batch rows; every shape built below must use it.
            B = lv.shape[1]
            shard = jax.lax.axis_index(axis)
            base = shard * C
            bidx_c = jnp.broadcast_to(jnp.arange(B)[:, None], (B, C))
            bidx_p = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))
            lidx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B, C))
            pixel_ids = jnp.broadcast_to(
                jnp.arange(HW, dtype=jnp.int32)[None], (B, HW))

            def fuse(state, pose, v, n, c, a, vd, uf):
                """One fusion step at the given pose (global-frame v/n in)."""
                pts, nrm, col, feat, nloc, ndrop = state
                nonpad = lidx < nloc[:, None]
                valid, pix = _project_map_points(pts, nonpad, pose, intr, H, W)

                # In the quantized layout the frame's packed color fills the
                # 8th channel, so the merge needs no separate color gather.
                fgeom = jnp.concatenate(
                    [v, n, a,
                     pack_colors(c) if quantized
                     else jnp.zeros((B, HW, 1), v.dtype)],
                    axis=-1)
                safe_pix = jnp.minimum(pix, HW - 1)
                g = jnp.take_along_axis(fgeom, safe_pix[..., None], axis=1)
                fp, fnrm = g[..., :3], g[..., 3:6]
                is_close = jnp.linalg.norm(fp - pts, axis=-1) < dist_th
                is_similar = jnp.sum(fnrm * nrm, axis=-1) > dot_th
                eligible = valid & is_close & is_similar
                ray = jnp.sum((pts - fp) ** 2, axis=-1)

                cc = feat[..., 0]
                k_pix = jnp.where(eligible, pix, HW)
                k_negcc = jnp.where(eligible, -cc, jnp.inf)
                k_ray = jnp.where(eligible, ray, jnp.inf)
                k_idx = jnp.where(eligible, lidx, C)
                boff = jnp.arange(B, dtype=jnp.int32)[:, None] * (HW + 1)
                s_pix, s_negcc, s_ray, s_idx = jax.lax.sort(
                    ((k_pix + boff).reshape(-1), k_negcc.reshape(-1),
                     k_ray.reshape(-1), k_idx.reshape(-1)),
                    dimension=0, num_keys=4, is_stable=False)
                s_pix = s_pix.reshape(B, C) - boff
                s_negcc = s_negcc.reshape(B, C)
                s_ray = s_ray.reshape(B, C)
                s_idx = s_idx.reshape(B, C)
                first = jnp.concatenate(
                    [jnp.ones((B, 1), bool), s_pix[:, 1:] != s_pix[:, :-1]],
                    axis=1)
                s_winner = first & (s_pix < HW)
                table_pix = jnp.where(
                    s_winner, s_pix, HW + jnp.arange(C, dtype=jnp.int32)[None])
                t_negcc = (jnp.full((B, HW), jnp.inf)
                           .at[bidx_c, table_pix]
                           .set(s_negcc, mode="drop", unique_indices=True))
                t_ray = (jnp.full((B, HW), jnp.inf)
                         .at[bidx_c, table_pix]
                         .set(s_ray, mode="drop", unique_indices=True))
                t_gidx = (jnp.full((B, HW), GCAP, dtype=jnp.int32)
                          .at[bidx_c, table_pix]
                          .set(s_idx + base, mode="drop", unique_indices=True))

                a_negcc = jax.lax.all_gather(t_negcc, axis, axis=0)  # (K,B,HW)
                a_ray = jax.lax.all_gather(t_ray, axis, axis=0)
                a_gidx = jax.lax.all_gather(t_gidx, axis, axis=0)
                b_negcc, b_ray, b_gidx = a_negcc[0], a_ray[0], a_gidx[0]
                for k in range(1, K):
                    lt = (a_negcc[k] < b_negcc) | (
                        (a_negcc[k] == b_negcc)
                        & ((a_ray[k] < b_ray)
                           | ((a_ray[k] == b_ray) & (a_gidx[k] < b_gidx))))
                    b_negcc = jnp.where(lt, a_negcc[k], b_negcc)
                    b_ray = jnp.where(lt, a_ray[k], b_ray)
                    b_gidx = jnp.where(lt, a_gidx[k], b_gidx)
                corresponded = b_gidx < GCAP

                local_win = corresponded & (b_gidx >= base) & (b_gidx < base + C)
                new_mask = vd & ~corresponded
                new_rank = jnp.cumsum(new_mask.astype(jnp.int32), axis=-1) - 1
                mine = new_mask & (new_rank % K == shard)
                tail = nloc[:, None] + new_rank // K
                oob = C + pixel_ids
                dest = jnp.where(
                    local_win, b_gidx - base,
                    jnp.where(mine & (tail < C), tail, oob))
                row_src = (jnp.full((B, C), HW, dtype=jnp.int32)
                           .at[bidx_p, dest]
                           .set(pixel_ids, mode="drop", unique_indices=True))
                touched = row_src < HW
                safe_src = jnp.where(touched, row_src, 0)

                g8 = jnp.take_along_axis(fgeom, safe_src[..., None], axis=1)
                alpha = g8[..., 6:7]
                # fresh tail rows have feat == 0 (never written), so one
                # uniform weighted-average formula covers merge AND append
                cc_old = feat[..., :1]
                new_cc = cc_old + alpha
                inv = 1.0 / jnp.where(new_cc == 0, 1.0, new_cc)
                t = touched[..., None]
                pts2 = jnp.where(t, (cc_old * pts + alpha * g8[..., :3]) * inv, pts)
                nrm2 = jnp.where(t, (cc_old * nrm + alpha * g8[..., 3:6]) * inv, nrm)
                if quantized:
                    # unpack-average-repack is elementwise (fused by XLA)
                    merged = (cc_old * unpack_colors(col)
                              + alpha * unpack_colors(g8[..., 7:8])) * inv
                    col2 = jnp.where(t, pack_colors(merged), col)
                else:
                    gc = jnp.take_along_axis(c, safe_src[..., None], axis=1)
                    col2 = jnp.where(t, (cc_old * col + alpha * gc) * inv, col)
                # user feature channels fuse like colors (one extra gather;
                # zero-width when feature_channels == 0 — XLA elides it)
                guf = jnp.take_along_axis(uf, safe_src[..., None], axis=1)
                user2 = (cc_old * feat[..., 1:] + alpha * guf) * inv
                feat2 = jnp.where(
                    t, jnp.concatenate([new_cc, user2], axis=-1), feat
                )
                appended = jnp.sum((mine & (tail < C)).astype(jnp.int32), axis=-1)
                # overflow accounting: rounds dealt to this shard that found
                # its slice full (see ShardedMap.num_dropped)
                dropped = jnp.sum(mine.astype(jnp.int32), axis=-1) - appended
                return (pts2, nrm2, col2, feat2, nloc + appended,
                        ndrop + dropped)

            def globalize(pose, v_loc, n_loc, vd):
                gv = _transform_pts(v_loc, pose)
                gn = _rotate_pts(n_loc, pose)
                m = vd[..., None]
                return jnp.where(m, gv, 0.0), jnp.where(m, gn, 0.0)

            def localize(state, pose_prev, s_locs, s_valids):
                """Frame-to-map odometry (reference icpslam.py:180-247),
                coarse-to-fine over ``levels`` (each level's all-gathered
                target window warm-starts the next solve)."""
                pts, nrm, _col, _feat, nloc, _nd = state
                nonpad = lidx < nloc[:, None]
                valid, pix = _project_map_points(
                    pts, nonpad, pose_prev, intr, H, W)
                ph, pw = pix // W, pix % W
                packed = jnp.concatenate(
                    [pts, nrm, jnp.zeros((B, C, 2), pts.dtype)], axis=-1)
                T = jnp.broadcast_to(
                    jnp.eye(4, dtype=pts.dtype), (B, 4, 4))
                for li, (ds_l, n_l) in enumerate(levels):
                    win = wins[li]
                    keep = valid & (ph % ds_l == 0) & (pw % ds_l == 0)
                    window, counts = compact_masked(packed, keep, win)
                    aw = jax.lax.all_gather(window, axis, axis=0)  # (K,B,win,8)
                    ac = jax.lax.all_gather(counts, axis, axis=0)  # (K,B)
                    tgt = jnp.moveaxis(aw, 0, 1).reshape(B, K * win, 8)
                    tmask = (jnp.arange(win, dtype=jnp.int32)[None, None]
                             < ac[..., None])  # (K,B,win)
                    tmask = jnp.moveaxis(tmask, 0, 1).reshape(B, K * win)
                    src = _transform_pts(s_locs[li][..., :3], pose_prev)

                    if knn_gate:
                        src_n = _rotate_pts(s_locs[li][..., 3:6], pose_prev)

                        def solve(s, m, t, tn, tm, i, sn, _n=n_l):
                            return self._solve_one(s, m, t, tn, tm, i, _n, sn)

                        T = jax.vmap(solve)(
                            src, s_valids[li], tgt[..., :3], tgt[..., 3:6],
                            tmask, T, src_n)
                    else:
                        def solve(s, m, t, tn, tm, i, _n=n_l):
                            return self._solve_one(s, m, t, tn, tm, i, _n)

                        T = jax.vmap(solve)(
                            src, s_valids[li], tgt[..., :3], tgt[..., 3:6],
                            tmask, T)
                return compose_transformations(T, pose_prev)

            # ---- projective frame-to-map odometry, map-sharded ----------
            # Each shard builds point-to-plane rows for ITS OWN window rows
            # (one streaming projection + one packed row gather against the
            # replicated frame image per iteration) and the 6x6 normal
            # equations are psum-folded — ~230 bytes of collective per
            # iteration instead of the KNN path's all-gathered windows
            # (K * win * 32 bytes per level). The solver state stays
            # replicated because every shard folds identical psum results.
            rb_loss, rb_scale = self.robust_loss, self.robust_scale
            dthr = self.dist_thresh
            dgate = self.odom_dot_gate
            lam_max = self.lambda_max
            lam_min = 1.0 / self.lambda_max
            B_lm, B2_lm, nu_lm = self.B_lm, self.B2, self.nu
            reuse_la = self.lookahead_assoc == "reuse"
            is_lm = self.odom == "icp"

            sym_nrm = self.odom_sym_normals
            subpix = self.odom_subpixel

            def _proj_rows(m_pts, m_nrm, m_mask, fgeo, pose):
                """Batched association + masked point-to-plane rows.
                Returns the row normals too (symmetric normals when
                ``odom_sym_normals``; see ProjectiveOdometryProvider) so the
                reuse-lookahead residual reuses the same rows."""
                def one(mp, mn, mm, fg, Kmat, po):
                    s, val, nf = projective_associate(
                        mp, mn, mm, fg, Kmat, po, H, W, dthr, dgate,
                        subpix)
                    n = mn
                    if sym_nrm:
                        nsum = mn + nf
                        nn = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
                        n = nsum / jnp.maximum(nn, 1e-12)
                    A, b = _ptp_system(s, mp, n, val, rb_loss, rb_scale)
                    return s, val, n, A, b

                return jax.vmap(one)(m_pts, m_nrm, m_mask, fgeo, intr, pose)

            def _psum_err(b):
                return jax.lax.psum(jnp.sum(b * b, axis=(1, 2)), axis)

            def _guard_global(xi, A, s, val):
                """Global robust-step guard (icputils._guard_robust_step
                semantics with the cloud statistics psum/pmax-folded so every
                shard scales the step identically)."""
                wmass = jax.lax.psum(
                    jnp.sum(A[..., :3] ** 2, axis=(1, 2)), axis)  # (B,)
                n_rows = jax.lax.psum(
                    jnp.full((), val.shape[-1], jnp.float32), axis)
                mass_floor = jnp.minimum(12.0, 0.5 * n_rows)
                fade = jnp.minimum(1.0, wmass / mass_floor)
                m = val.astype(s.dtype)[..., None]
                cnt = jax.lax.psum(jnp.sum(m, axis=1), axis)  # (B, 1)
                c = jax.lax.psum(jnp.sum(s * m, axis=1), axis) / jnp.maximum(
                    cnt, 1.0)  # (B, 3)
                r2 = jax.lax.pmax(
                    jnp.max(jnp.sum(((s - c[:, None]) * m) ** 2, -1), axis=1),
                    axis)  # (B,)
                radius = 10.0 * rb_scale  # icputils._TRUST_RADIUS_SCALES
                v_t, w_t = xi[:, :3, 0], xi[:, 3:, 0]
                disp = (
                    _safe_sqrt(jnp.sum((v_t + jnp.cross(w_t, c)) ** 2, -1))
                    + _safe_sqrt(jnp.sum(w_t * w_t, -1)) * _safe_sqrt(r2)
                )
                trust = radius / jnp.maximum(disp, radius)
                return xi * (fade * trust)[:, None, None]

            def _solve_level_projective(m_pts, m_nrm, m_mask, fgeo,
                                        pose_prev, X0, n_iters):
                eye6 = jnp.eye(6, dtype=m_pts.dtype)

                def body(carry, _):
                    X, dampv = carry
                    pose = matmul_hp(X, pose_prev)
                    s, val, rown, A, b = _proj_rows(
                        m_pts, m_nrm, m_mask, fgeo, pose)
                    At = jnp.swapaxes(A, -1, -2)
                    AtA = jax.lax.psum(matmul_hp(At, A), axis)
                    Atb = jax.lax.psum(matmul_hp(At, b), axis)
                    err = _psum_err(b)
                    xi = jnp.linalg.solve(
                        AtA + dampv[:, None, None] * eye6[None], Atb)
                    if rb_loss is not None:
                        xi = _guard_global(xi, A, s, val)
                    rT = se3_exp(xi[:, :, 0])  # (B, 4, 4), batched
                    one_step = matmul_hp(rT, X)
                    if reuse_la:
                        s1 = einsum_hp(
                            "bij,bnj->bni", rT[:, :3, :3], s
                        ) + rT[:, None, :3, 3]
                        val1 = val
                        if dthr is not None:
                            val1 = val1 & (
                                jnp.sum((s1 - m_pts) ** 2, -1) < dthr)
                        _, b1 = jax.vmap(
                            lambda ss, mp, mn, vv: _ptp_system(
                                ss, mp, mn, vv, rb_loss, rb_scale)
                        )(s1, m_pts, rown, val1)
                    else:
                        pose1 = matmul_hp(one_step, pose_prev)
                        _, _, _, _, b1 = _proj_rows(
                            m_pts, m_nrm, m_mask, fgeo, pose1)
                    err1 = _psum_err(b1)
                    if is_lm:  # classic LM accept/reject
                        accept = err1 < err
                        X_new = jnp.where(accept[:, None, None], one_step, X)
                        damp_new = jnp.where(accept, dampv / 2.0, dampv * 2.0)
                    else:  # gradLM smooth blending (reference :496-543)
                        errdiff = jnp.clip(err1 - err, -70.0, 70.0)
                        dmul = lam_min + (lam_max - lam_min) / (
                            1.0 + jnp.exp(-B_lm * errdiff))
                        sig = 1.0 / (
                            1.0 + jnp.exp(-B2_lm * errdiff)) ** (1.0 / nu_lm)
                        scaled = se3_exp(sig[:, None] * xi[:, :, 0])
                        X_new = matmul_hp(scaled, X)
                        damp_new = dampv * dmul
                    return (X_new, damp_new), None

                damp0 = jnp.full((X0.shape[0],), self.damp, m_pts.dtype)
                (X, _), _ = jax.lax.scan(body, (X0, damp0), None,
                                         length=n_iters)
                return X

            def localize_projective(state, pose_prev, v, n, vd):
                pts, nrm, _col, _feat, nloc, _nd = state
                nonpad = lidx < nloc[:, None]
                vdf = vd[..., None].astype(v.dtype)
                fgeo = jnp.concatenate(
                    [v, n, vdf, jnp.zeros_like(vdf)], axis=-1)  # (B, HW, 8)
                packed6 = jnp.concatenate([pts, nrm], axis=-1)  # (B, C, 6)
                valid0, pix0 = _project_map_points(
                    pts, nonpad, pose_prev, intr, H, W)
                ph0, pw0 = pix0 // W, pix0 % W
                X = jnp.broadcast_to(
                    jnp.eye(4, dtype=pts.dtype), pose_prev.shape)
                for li, (ds_l, n_l) in enumerate(levels):
                    keep = valid0 & (ph0 % ds_l == 0) & (pw0 % ds_l == 0)
                    window, counts = compact_masked(packed6, keep, wins[li])
                    wmask = (
                        jnp.arange(wins[li], dtype=jnp.int32)[None]
                        < counts[:, None]
                    )
                    X = _solve_level_projective(
                        window[..., :3], window[..., 3:6], wmask, fgeo,
                        pose_prev, X, n_l)
                return compose_transformations(X, pose_prev)

            def localize_mixed(state, pose_prev, v, n, vd, s_locs, s_valids):
                """Hybrid per-level schedule: each level dispatches to the
                projective or KNN machinery, threading the same world-frame
                correction X (both solvers include their warm start in the
                returned transform, so chaining composes identically to the
                single-device hybrid pyramid)."""
                pts, nrm, _col, _feat, nloc, _nd = state
                nonpad = lidx < nloc[:, None]
                vdf = vd[..., None].astype(v.dtype)
                fgeo = jnp.concatenate(
                    [v, n, vdf, jnp.zeros_like(vdf)], axis=-1)  # (B, HW, 8)
                packed8 = jnp.concatenate(
                    [pts, nrm, jnp.zeros((B, C, 2), pts.dtype)], axis=-1)
                valid0, pix0 = _project_map_points(
                    pts, nonpad, pose_prev, intr, H, W)
                ph0, pw0 = pix0 // W, pix0 % W
                X = jnp.broadcast_to(
                    jnp.eye(4, dtype=pts.dtype), pose_prev.shape)
                for li, ((ds_l, n_l), a_l) in enumerate(zip(levels, assocs)):
                    win = wins[li]
                    keep = valid0 & (ph0 % ds_l == 0) & (pw0 % ds_l == 0)
                    if a_l == "projective":
                        window, counts = compact_masked(
                            packed8[..., :6], keep, win)
                        wmask = (
                            jnp.arange(win, dtype=jnp.int32)[None]
                            < counts[:, None]
                        )
                        X = _solve_level_projective(
                            window[..., :3], window[..., 3:6], wmask, fgeo,
                            pose_prev, X, n_l)
                    else:
                        window, counts = compact_masked(packed8, keep, win)
                        aw = jax.lax.all_gather(window, axis, axis=0)
                        ac = jax.lax.all_gather(counts, axis, axis=0)
                        tgt = jnp.moveaxis(aw, 0, 1).reshape(B, K * win, 8)
                        tmask = (
                            jnp.arange(win, dtype=jnp.int32)[None, None]
                            < ac[..., None]
                        )
                        tmask = jnp.moveaxis(tmask, 0, 1).reshape(B, K * win)
                        src = _transform_pts(s_locs[li][..., :3], pose_prev)

                        if knn_gate:
                            src_n = _rotate_pts(
                                s_locs[li][..., 3:6], pose_prev)

                            def solve(s, m, t, tn, tm, i, sn, _n=n_l):
                                return self._solve_one(
                                    s, m, t, tn, tm, i, _n, sn)

                            X = jax.vmap(solve)(
                                src, s_valids[li], tgt[..., :3],
                                tgt[..., 3:6], tmask, X, src_n)
                        else:
                            def solve(s, m, t, tn, tm, i, _n=n_l):
                                return self._solve_one(s, m, t, tn, tm, i, _n)

                            X = jax.vmap(solve)(
                                src, s_valids[li], tgt[..., :3],
                                tgt[..., 3:6], tmask, X)
                return compose_transformations(X, pose_prev)

            # ---- frame 0: fuse at the bootstrap pose ----
            zeros3 = jnp.zeros((B, C, 3), jnp.float32)
            state0 = (zeros3, zeros3,
                      jnp.zeros((B, C, 1), jnp.float32) if quantized else zeros3,
                      jnp.zeros((B, C, 1 + F), jnp.float32),
                      jnp.zeros((B,), jnp.int32),
                      jnp.zeros((B,), jnp.int32))
            vary_axes = (axis,) if ba is None else (axis, ba)
            state0 = jax.tree.map(
                lambda x: jax.lax.pcast(x, vary_axes, to="varying"), state0)

            def prune_state(state):
                # per-shard Keller prune: compact away local rows whose
                # ccount is below the threshold (no cross-device traffic —
                # each shard compacts its own slice and its own live count)
                pts, nrm, col, feat, nloc, ndrop = state
                rows = jnp.arange(pts.shape[1], dtype=jnp.int32)
                keep = (rows[None, :] < nloc[:, None]) & (
                    feat[..., 0] >= self.prune_min_confidence
                )
                cap_l = pts.shape[1]
                pts2, cnt = compact_masked(pts, keep, cap_l)
                nrm2, _ = compact_masked(nrm, keep, cap_l)
                col2, _ = compact_masked(col, keep, cap_l)
                feat2, _ = compact_masked(feat, keep, cap_l)
                return (pts2, nrm2, col2, feat2, cnt, ndrop)

            pose0 = poses_in[0]
            gv0, gn0 = globalize(pose0, lv[0], ln[0], fvalid[0])
            state = fuse(state0, pose0, gv0, gn0, fc[0], fa[0], fvalid[0], fu[0])
            if self.prune_every == 1:  # (0 + 1) % k == 0 iff every frame
                state = prune_state(state)
            segments = split_prune_segments(1, L - 1, self.prune_every)

            if not tracked:
                def body(carry, frame):
                    st = carry
                    v, n, c, a, vd, uf, pose = frame
                    gv, gn = globalize(pose, v, n, vd)
                    return fuse(st, pose, gv, gn, c, a, vd, uf), pose

                xs_all = (lv[1:], ln[1:], fc[1:], fa[1:], fvalid[1:],
                          fu[1:], poses_in[1:])
                start = 0
                for sub_n, prune_after in segments:
                    xs = jax.tree.map(
                        lambda x, s=start, m=sub_n: x[s:s + m], xs_all
                    )
                    state, _ = jax.lax.scan(body, state, xs)
                    if prune_after:
                        state = prune_state(state)
                    start += sub_n
                poses_out = poses_in
            else:
                cv = self.motion_model == "constant_velocity"

                def body(carry, frame):
                    st, prev_pose, prev_delta = carry
                    v, n, c, a, vd, uf, s_loc, s_valid = frame
                    # constant-velocity prior (see ICPSLAM.motion_model):
                    # solve from — and project the association window at —
                    # the predicted camera; SO(3) re-projection for the same
                    # reason as ICPSLAM (orthonormality error compounds
                    # exponentially through the delta feedback chain)
                    pred = (
                        orthonormalize_rotations(
                            compose_transformations(prev_delta, prev_pose)
                        )
                        if cv else prev_pose
                    )
                    if projective:
                        pose = localize_projective(st, pred, v, n, vd)
                    elif mixed:
                        pose = localize_mixed(
                            st, pred, v, n, vd, s_loc, s_valid)
                    else:
                        pose = localize(st, pred, s_loc, s_valid)
                    gv, gn = globalize(pose, v, n, vd)
                    st = fuse(st, pose, gv, gn, c, a, vd, uf)
                    delta = (
                        compose_transformations(
                            pose, inverse_transformation(prev_pose)
                        )
                        if cv else prev_delta
                    )
                    return (st, pose, delta), pose

                delta0 = jnp.broadcast_to(
                    jnp.eye(4, dtype=pose0.dtype), pose0.shape
                )
                xs_all = (lv[1:], ln[1:], fc[1:], fa[1:], fvalid[1:],
                          fu[1:], tuple(x[1:] for x in sl),
                          tuple(x[1:] for x in sv))
                carry = (state, pose0, delta0)
                rest_chunks = []
                start = 0
                for sub_n, prune_after in segments:
                    xs = jax.tree.map(
                        lambda x, s=start, m=sub_n: x[s:s + m], xs_all
                    )
                    carry, rest_seg = jax.lax.scan(body, carry, xs)
                    if prune_after:
                        st, pp, pd = carry
                        carry = (prune_state(st), pp, pd)
                    rest_chunks.append(rest_seg)
                    start += sub_n
                state = carry[0]
                rest = (
                    rest_chunks[0] if len(rest_chunks) == 1
                    else jnp.concatenate(rest_chunks)
                ) if rest_chunks else jnp.zeros(
                    (0,) + pose0.shape, pose0.dtype
                )
                poses_out = jnp.concatenate([pose0[None], rest], axis=0)

            pts, nrm, col, feat, nloc, ndrop = state
            return pts, nrm, col, feat, nloc[None], ndrop[None], poses_out

        bspec = P(None, ba)  # (L, B, ...) frame-sequence arrays
        out_map = P(ba, axis)  # (B, CAP, ...) map buffers
        fused = jax.shard_map(
            sharded_scan,
            mesh=self.mesh,
            in_specs=(bspec, bspec, bspec, bspec, bspec, bspec, bspec,
                      P(ba), bspec, bspec),
            out_specs=(out_map, out_map, out_map, out_map,
                       P(axis, ba), P(axis, ba), bspec),
            # the tracked pose / solver results are bit-identical on every
            # map shard (replicated compute on all-gathered inputs), but the
            # static varying-axes checker can't prove it
            check_vma=not tracked,
        )(lv, ln, fc, fa, fvalid, fu, poses_in, intr,
          sl if sl is not None else (jnp.zeros((L, B, 1, 3), jnp.float32),),
          sv if sv is not None else (jnp.zeros((L, B, 1), bool),))
        pts, nrm, col, feat, nums, ndrops, poses_out = fused
        return (ShardedMap(pts, nrm, col, feat, nums, ndrops),
                jnp.moveaxis(poses_out, 0, 1))
