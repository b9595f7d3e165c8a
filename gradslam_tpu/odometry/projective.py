r"""Projective data association odometry (frame-to-model, KNN-free).

The reference's odometry is welded to chamferdist's KNN: every solver
iteration re-associates source and target clouds with an O(N·M) nearest
neighbour search (``/root/reference/gradslam/odometry/icputils.py:3,200``).
On TPU that KNN — even as an MXU matmul — is ~16x the cost of the entire
fusion step at 640x480 (measured round 3: tracked 6.08 fps vs 105.5 fps with
ground-truth odometry).

This module implements the classic frame-to-model alternative the reference
never had (Keller et al. / KinectFusion-style projective association): the
map window is *projected into the live camera* at the current pose estimate
and each map point reads the frame vertex/normal at the pixel it lands on —
the same projection machinery the fusion stage already uses
(``/root/reference/gradslam/slam/fusionutils.py:198-288``), feeding the same
point-to-plane rows (``icputils.py:227-230``). Per solver iteration this is

- one streaming elementwise projection over the map window (HBM-bandwidth
  bound, the shape TPUs love), and
- one packed 8-wide row gather of the frame's vertex/normal/validity image,

instead of an O(N·M) KNN — association cost drops from quadratic to linear
and the iteration count stops mattering. Accuracy is comparable because the
optimum is the same point-to-plane objective; only the correspondence rule
differs (pixel-of-projection vs nearest-Euclidean), and near convergence the
two agree.

Extra capability over the KNN mode: a *normal-compatibility gate*
(``dot_gate``) — the frame normal at the landed pixel must agree with the
map normal — which rejects wrong-surface associations that pass a pure
distance gate (the failure mode that forced coarse ds8 sampling on noisy
640x480 clips; docs/design.md §4).

All functions operate on a single batch element and are ``vmap``-ed by the
provider. Gradients flow through every gathered *value* (frame maps, map
points/normals, poses); the pixel *indices* are integral association
plumbing, exactly like a KNN argmin.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.geometryutils import (
    compose_transformations,
    inverse_transformation,
)
from ..geometry.se3utils import se3_exp
from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages
from ..utils.precision import einsum_hp, matmul_hp
from .base import OdometryProvider
from .icputils import (
    _guard_robust_step,
    _normal_gate,
    _ptp_system,
    robust_weights,
    solve_linear_system,  # noqa: F401  (re-exported for the equality oracle)
    validate_robust,
)

__all__ = [
    "projective_associate",
    "point_to_plane_ICP_projective",
    "point_to_plane_gradICP_projective",
    "ProjectiveOdometryProvider",
]


def projective_associate(
    map_pts: jnp.ndarray,  # (N, 3) world frame
    map_normals: jnp.ndarray,  # (N, 3) world frame
    map_mask: jnp.ndarray,  # (N,) bool
    frame_geom: jnp.ndarray,  # (H*W, 8): vertex(3) | normal(3) | valid | 0
    intrinsics: jnp.ndarray,  # (4, 4) or (3, 3)
    pose: jnp.ndarray,  # (4, 4) camera-to-world
    H: int,
    W: int,
    dist_thresh: Optional[float] = None,
    dot_gate: Optional[float] = None,
    subpixel: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    r"""Associate map points with live-frame points by projection.

    Transforms the map window into the camera at ``pose``, pinhole-projects
    (identical bounds/rounding semantics to
    :func:`~gradslam_tpu.slam.fusionutils.find_active_map_points` /
    reference fusionutils.py:259-274), and gathers the frame's packed
    vertex/normal/validity row at the landed pixel.

    ``subpixel=True`` replaces the nearest-pixel gather with a
    validity-weighted BILINEAR interpolation of the frame vertex/normal at
    the continuous ``(u, v)`` (4 row gathers + lerp — standard KinectFusion
    practice). The reference rounds to the nearest pixel
    (fusionutils.py:267-274), which quantizes the in-plane association to a
    half-pixel (~``z/(2 fx)`` meters of tangential noise floor — the drift
    pressure ``sym_normals``/``point_weight`` exist to fight; design.md §4).
    Corners with invalid depth are dropped from the blend (weights
    renormalized); the association is valid only if at least half the
    interpolation mass is valid, so depth-discontinuity borders degrade to
    one-sided interpolation instead of smearing across the edge. The blend
    weights depend smoothly on the pose, so the lookahead residual — and the
    end-to-end gradient — also sees the sub-pixel motion.

    Returns ``(s, valid, n_frame)``: ``s (N, 3)`` — the associated frame
    point in WORLD coordinates (at ``pose``); ``valid (N,)`` — in-frustum,
    valid-depth, within ``dist_thresh`` (squared meters, same convention as
    the KNN mode's gate) and within the normal gate (``dot_gate`` = minimum
    cosine between frame and map normals; None disables); ``n_frame (N, 3)``
    — the frame normal at the landed pixel, rotated to world coordinates
    (consumed by the gate and by ``sym_normals``).
    """
    tinv = inverse_transformation(pose)
    R, t = tinv[:3, :3], tinv[:3, 3]
    # HIGHEST-precision contractions throughout: on TPU a plain ``@`` runs
    # bf16 MXU passes — at world coordinates of ~meters that is ~mm of
    # association error, a measured 20x ATE regression vs the KNN mode
    # (CPU f32 runs were identical; utils/precision.py).
    cam = matmul_hp(map_pts, R.T) + t  # (N, 3) — camera-frame map points
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    zg = jnp.where(z == 0, jnp.ones_like(z), z)
    u = fx * (x / zg) + cx
    v = fy * (y / zg) + cy
    valid = (
        (u > -1e-3)
        & (u < W - 0.999)
        & (v > -1e-3)
        & (v < H - 0.999)
        & (z > 0)
        & map_mask
    )
    if subpixel:
        uc = jnp.clip(u, 0.0, W - 1.0)
        vc = jnp.clip(v, 0.0, H - 1.0)
        u0 = jnp.clip(jnp.floor(uc), 0, max(W - 2, 0)).astype(jnp.int32)
        v0 = jnp.clip(jnp.floor(vc), 0, max(H - 2, 0)).astype(jnp.int32)
        fu = uc - u0.astype(uc.dtype)
        fv = vc - v0.astype(vc.dtype)
        base = v0 * W + u0
        du = 1 if W > 1 else 0
        dv = W if H > 1 else 0
        corners = (
            (base, (1.0 - fu) * (1.0 - fv)),
            (base + du, fu * (1.0 - fv)),
            (base + dv, (1.0 - fu) * fv),
            (base + du + dv, fu * fv),
        )
        acc = jnp.zeros(map_pts.shape[:-1] + (6,), dtype=frame_geom.dtype)
        wsum = jnp.zeros(map_pts.shape[:-1], dtype=frame_geom.dtype)
        for idx_c, w_c in corners:
            gc = jnp.take(frame_geom, idx_c, axis=0)  # (N, 8)
            wv = w_c * gc[..., 6]  # validity-masked bilinear weight
            acc = acc + wv[..., None] * gc[..., :6]
            wsum = wsum + wv
        g6 = acc / jnp.maximum(wsum, 1e-12)[..., None]
        s_cam = g6[..., :3]
        # renormalize the blended normal (a blend of unit normals shrinks)
        n_cam = g6[..., 3:6]
        n_cam = n_cam / jnp.maximum(
            jnp.linalg.norm(n_cam, axis=-1, keepdims=True), 1e-12
        )
        valid = valid & (wsum > 0.5)
    else:
        pix_w = jnp.clip(jnp.round(u), 0, W - 1).astype(jnp.int32)
        pix_h = jnp.clip(jnp.round(v), 0, H - 1).astype(jnp.int32)
        g = jnp.take(frame_geom, pix_h * W + pix_w, axis=0)  # (N, 8)
        s_cam = g[..., :3]
        n_cam = g[..., 3:6]
        valid = valid & (g[..., 6] > 0.5)
    # world-frame frame point: s = R_pose @ s_cam + t_pose
    Rp, tp = pose[:3, :3], pose[:3, 3]
    s = matmul_hp(s_cam, Rp.T) + tp
    if dist_thresh is not None:
        valid = valid & (jnp.sum((s - map_pts) ** 2, axis=-1) < dist_thresh)
    n_world = matmul_hp(n_cam, Rp.T)  # rotate-only for normals
    if dot_gate is not None:
        valid = valid & _normal_gate(n_world, map_normals, dot_gate)
    return s, valid, n_world


def _point_block_normal_eq(s, map_pts, valid, point_weight, robust_loss,
                           robust_scale):
    r"""Analytic normal-equation contribution of the point-to-point block.

    The three point rows per association have fixed structure — scaled
    identity residual rows ``sigma_k [e_k | s x e_k]`` with residual
    ``sigma_k (d_k - s_k)`` — so their ``A^T A`` / ``A^T b`` contributions are
    accumulated directly instead of concatenating a ``(3N, 6)`` block onto
    the plane rows and paying 4x the matmul/materialization work per
    iteration (VERDICT r4 #5; the concatenating formulation is kept as the
    equality oracle in ``tests/odometry/test_projective.py``).

    Returns ``(AtA (6, 6), Atb (6, 1), errsq, wmass)`` where ``errsq`` is the
    block's squared-residual sum (the solver's LM merit term) and ``wmass``
    its contribution to the robust-step guard's inlier mass
    (``sum A[:, :3]^2 = sum sigma^2`` — the point rows' first three columns
    are ``sigma_k e_k``).
    """
    w = float(point_weight) ** 0.5
    diff = map_pts - s  # (N, 3)
    # sigma must be materialized at (N, 3): the guard-mass sum below counts
    # one unit per ROW (3 per association), not one per point
    sigma = jnp.broadcast_to(
        valid.astype(s.dtype)[:, None] * w, diff.shape
    )
    if robust_loss is not None:
        # same robust kernel on the (scaled) component residual: scaling
        # both the residual and the scale keeps the weight a function of
        # the unscaled component (matches the row formulation exactly).
        sigma = sigma * robust_weights(w * diff, robust_loss,
                                       robust_scale * w)
    # J (N, 3, 6): row k = [e_k | s x e_k]; s x e_k is column k of skew(s)
    N = s.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=s.dtype), (N, 3, 3))
    zer = jnp.zeros_like(s[..., 0])
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    cross = jnp.stack(
        [
            jnp.stack([zer, sz, -sy], axis=-1),  # s x e_0
            jnp.stack([-sz, zer, sx], axis=-1),  # s x e_1
            jnp.stack([sy, -sx, zer], axis=-1),  # s x e_2
        ],
        axis=-2,
    )  # (N, 3, 3)
    J = jnp.concatenate([eye, cross], axis=-1)  # (N, 3, 6)
    Jw = J * sigma[..., None]
    bw = sigma * diff  # (N, 3) — the weighted residual rows
    AtA = einsum_hp("nki,nkj->ij", Jw, Jw)
    Atb = einsum_hp("nki,nk->i", Jw, bw)[:, None]
    return AtA, Atb, jnp.sum(bw * bw), jnp.sum(sigma * sigma)


class _ProjState(NamedTuple):
    transform: jnp.ndarray  # (4, 4) world-space correction X (pose = X @ P)
    damp: jnp.ndarray


def _projective_icp_core(
    mode: str,  # 'lm' (classic accept/reject) or 'gradlm'
    map_pts,
    map_normals,
    map_mask,
    frame_geom,
    intrinsics,
    init_pose,  # (4, 4) predicted camera pose P
    initial_transform,  # (4, 4) warm-start correction X0 or None
    H: int,
    W: int,
    numiters: int,
    damp: float,
    dist_thresh: Optional[float],
    dot_gate: Optional[float],
    lambda_max: float,
    B: float,
    B2: float,
    nu: float,
    lookahead_assoc: str,
    robust_loss: Optional[str],
    robust_scale: float,
    sym_normals: bool = False,
    point_weight: float = 0.0,
    subpixel: bool = False,
) -> jnp.ndarray:
    if lookahead_assoc not in ("fresh", "reuse"):
        raise ValueError(f"Unknown lookahead_assoc mode: {lookahead_assoc}")
    if numiters < 1:
        raise ValueError(f"numiters must be >= 1. Got {numiters}.")
    map_pts = jnp.asarray(map_pts)
    init_pose = jnp.asarray(init_pose)
    X0 = (
        jnp.eye(4, dtype=map_pts.dtype)
        if initial_transform is None
        else jnp.asarray(initial_transform)
    )
    lambda_min = 1.0 / lambda_max
    eye6 = jnp.eye(6, dtype=map_pts.dtype)

    def associate(X):
        pose = matmul_hp(X, init_pose)
        s, valid, n_frame = projective_associate(
            map_pts, map_normals, map_mask, frame_geom, intrinsics, pose,
            H, W, dist_thresh, dot_gate, subpixel,
        )
        return s, valid, n_frame

    def system_ne(s, valid, n_frame):
        """Normal-equation form of the point-to-plane system, optionally
        with symmetric normals and an (analytically folded) point-to-point
        block (see the ``ProjectiveOdometryProvider`` docs: pure plane rows
        cannot observe in-plane drift through a pixel-of-projection
        association, so depth noise walks the pose). Returns
        ``(AtA, Atb, errsq, wmass)``; the lookahead consumes only ``errsq``
        and XLA dead-code-eliminates the matmuls there."""
        n = map_normals
        if sym_normals:
            nsum = map_normals + n_frame
            nn = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
            n = nsum / jnp.maximum(nn, 1e-12)
        A, b = _ptp_system(s, map_pts, n, valid, robust_loss, robust_scale)
        AtA = matmul_hp(A.T, A)
        Atb = matmul_hp(A.T, b)
        errsq = jnp.sum(b * b)
        wmass = jnp.sum(A[:, :3] ** 2)
        if point_weight > 0.0:
            pAtA, pAtb, perr, pmass = _point_block_normal_eq(
                s, map_pts, valid, point_weight, robust_loss, robust_scale
            )
            AtA = AtA + pAtA
            Atb = Atb + pAtb
            errsq = errsq + perr
            wmass = wmass + pmass
        return AtA, Atb, errsq, wmass

    def err_at(X):
        s, valid, n_frame = associate(X)
        return system_ne(s, valid, n_frame)[2]

    def body(state: _ProjState, _):
        s, valid, n_frame = associate(state.transform)
        AtA, Atb, err, wmass = system_ne(s, valid, n_frame)
        damp = state.damp.astype(AtA.dtype)
        xi = jnp.linalg.solve(AtA + damp * eye6, Atb)
        if robust_loss is not None:  # see icputils._guard_robust_step
            xi = _guard_robust_step(xi, None, robust_scale, s, valid,
                                    wmass=wmass)
        residual_transform = se3_exp(xi)
        one_step = matmul_hp(residual_transform, state.transform)
        if lookahead_assoc == "reuse":
            # keep the association, move the frame points with the step
            s1 = (
                matmul_hp(s, residual_transform[:3, :3].T)
                + residual_transform[:3, 3]
            )
            valid1 = valid
            if dist_thresh is not None:
                valid1 = valid1 & (
                    jnp.sum((s1 - map_pts) ** 2, axis=-1) < dist_thresh
                )
            new_err = system_ne(s1, valid1, n_frame)[2]
        else:
            new_err = err_at(one_step)
        if mode == "lm":
            accept = new_err < err
            new_state = _ProjState(
                transform=jnp.where(accept, one_step, state.transform),
                damp=jnp.where(accept, state.damp / 2.0, state.damp * 2.0),
            )
        else:  # gradLM: smooth damping/step blending, no reject branch
            errdiff = jnp.clip(new_err - err, -70.0, 70.0)
            damp_new = lambda_min + (lambda_max - lambda_min) / (
                1.0 + jnp.exp(-B * errdiff)
            )
            sigmoid = 1.0 / (1.0 + jnp.exp(-B2 * errdiff)) ** (1.0 / nu)
            scaled_transform = se3_exp(sigmoid * xi[:, 0])
            new_state = _ProjState(
                transform=matmul_hp(scaled_transform, state.transform),
                damp=state.damp * damp_new,
            )
        return new_state, None

    init = _ProjState(
        transform=X0, damp=jnp.asarray(damp, dtype=map_pts.dtype)
    )
    final, _ = jax.lax.scan(body, init, None, length=numiters)
    return final.transform


def point_to_plane_ICP_projective(
    map_pts,
    map_normals,
    map_mask,
    frame_geom,
    intrinsics,
    init_pose,
    H: int,
    W: int,
    initial_transform=None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    dot_gate: Optional[float] = None,
    lookahead_assoc: str = "fresh",
    robust_loss: Optional[str] = None,
    robust_scale: float = 0.05,
    sym_normals: bool = False,
    point_weight: float = 0.0,
    subpixel: bool = False,
) -> jnp.ndarray:
    r"""Projective-association point-to-plane ICP with the classic LM
    accept/reject loop (the KNN-mode :func:`~gradslam_tpu.odometry.icputils.
    point_to_plane_ICP` with projection+gather replacing the per-iteration
    KNN). Returns the world-space correction ``X (4, 4)``: the solved camera
    pose is ``X @ init_pose``."""
    return _projective_icp_core(
        "lm", map_pts, map_normals, map_mask, frame_geom, intrinsics,
        init_pose, initial_transform, H, W, numiters, damp, dist_thresh,
        dot_gate, 2.0, 1.0, 1.0, 200.0, lookahead_assoc, robust_loss,
        robust_scale, sym_normals, point_weight, subpixel,
    )


def point_to_plane_gradICP_projective(
    map_pts,
    map_normals,
    map_mask,
    frame_geom,
    intrinsics,
    init_pose,
    H: int,
    W: int,
    initial_transform=None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    dot_gate: Optional[float] = None,
    lambda_max: float = 2.0,
    B: float = 1.0,
    B2: float = 1.0,
    nu: float = 200.0,
    lookahead_assoc: str = "fresh",
    robust_loss: Optional[str] = None,
    robust_scale: float = 0.05,
    sym_normals: bool = False,
    point_weight: float = 0.0,
    subpixel: bool = False,
) -> jnp.ndarray:
    r"""Projective-association gradLM ICP (differentiable; the smooth
    damping/step blending of the reference's gradLM, icputils.py:496-543,
    with projection+gather association). Returns the world-space correction
    ``X (4, 4)``: the solved camera pose is ``X @ init_pose``."""
    return _projective_icp_core(
        "gradlm", map_pts, map_normals, map_mask, frame_geom, intrinsics,
        init_pose, initial_transform, H, W, numiters, damp, dist_thresh,
        dot_gate, lambda_max, B, B2, nu, lookahead_assoc, robust_loss,
        robust_scale, sym_normals, point_weight, subpixel,
    )


class ProjectiveOdometryProvider(OdometryProvider):
    r"""Frame-to-model odometry with projective data association.

    Drop-in alternative to the KNN providers for the SLAM pipelines
    (``ICPSLAM(odom_assoc='projective')``); per solver iteration it costs one
    streaming projection + one row gather instead of an O(N·M) KNN.

    Args:
        solver: ``'gradicp'`` (gradLM, differentiable, default) or ``'icp'``
            (classic LM accept/reject).
        numiters / damp / dist_thresh: as in the KNN providers
            (``dist_thresh`` in squared meters, same convention).
        dot_gate: optional minimum cosine between the frame normal at the
            landed pixel and the map normal — rejects wrong-surface
            associations a pure distance gate admits. None disables.
        lambda_max / B / B2 / nu: gradLM parameters (solver='gradicp').
        lookahead_assoc: 'fresh' re-associates for the lookahead residual;
            'reuse' keeps the iteration's association (cheaper, near
            identical — and here even 'fresh' is cheap).
        robust_loss / robust_scale: IRLS robust kernel, as in the KNN mode.
        sym_normals: use the symmetric normal ``(n_map + n_frame)/2``
            (Rusinkiewicz's symmetric objective) in the point-to-plane rows
            instead of the map normal alone — halves the per-side normal
            noise and removes the one-sided linearization bias.
        point_weight: if > 0, augment each association with three
            point-to-POINT rows weighted ``sqrt(point_weight)`` (relative to
            the plane rows). Pure plane rows measure only the normal
            component of the error, and with a pixel-of-projection
            association the in-plane (tangential) drift component is
            *invisible to the objective to first order* — per-frame depth
            noise then walks the pose without any restoring force (measured:
            monotone ~5 mm/frame drift -> runaway on a noisy clip where the
            KNN mode self-corrects, because a 3D nearest-neighbour search
            re-anchors onto surface relief). The point rows restore the
            tangential constraint wherever the scene has ANY relief. 0
            disables (classic KinectFusion objective).
        subpixel: bilinearly interpolate the frame vertex/normal at the
            continuous projected ``(u, v)`` instead of rounding to the
            nearest pixel (see :func:`projective_associate`) — removes the
            half-pixel in-plane quantization floor of the reference's
            rounding convention (fusionutils.py:267-274) at the cost of 4
            row gathers per iteration instead of 1.
    """

    def __init__(
        self,
        solver: str = "gradicp",
        numiters: int = 20,
        damp: float = 1e-8,
        dist_thresh=None,
        dot_gate: Optional[float] = None,
        lambda_max: float = 2.0,
        B: float = 1.0,
        B2: float = 1.0,
        nu: float = 200.0,
        lookahead_assoc: str = "fresh",
        robust_loss: Optional[str] = None,
        robust_scale: float = 0.05,
        sym_normals: bool = False,
        point_weight: float = 0.0,
        subpixel: bool = False,
    ):
        if solver not in ("icp", "gradicp"):
            raise ValueError(
                f"Unknown solver: {solver!r}. Expected 'icp' or 'gradicp'."
            )
        validate_robust(robust_loss, robust_scale)
        if dot_gate is not None and not (-1.0 <= dot_gate <= 1.0):
            raise ValueError(
                f"dot_gate must be a cosine in [-1, 1] or None. Got {dot_gate}."
            )
        self.solver = solver
        self.numiters = numiters
        self.damp = damp
        self.dist_thresh = dist_thresh
        self.dot_gate = dot_gate
        self.lambda_max = lambda_max
        self.B = B
        self.B2 = B2
        self.nu = nu
        self.lookahead_assoc = lookahead_assoc
        self.robust_loss = robust_loss
        self.robust_scale = robust_scale
        if point_weight < 0:
            raise ValueError(
                f"point_weight must be >= 0. Got {point_weight}."
            )
        self.sym_normals = bool(sym_normals)
        self.point_weight = float(point_weight)
        self.subpixel = bool(subpixel)

    def provide(
        self,
        maps_pointclouds: Pointclouds,
        live_frame: RGBDImages,
        initial_transform: jnp.ndarray = None,
    ) -> jnp.ndarray:
        r"""World-space corrections ``(B, 1, 4, 4)`` aligning the live frame
        to the map: the solved camera pose is ``transform @ live_frame.poses``
        (same composition contract as the KNN providers — ``live_frame`` must
        carry the predicted poses the solve starts from).

        Args:
            maps_pointclouds: the (downsampled) map window — points +
                normals in world coordinates.
            live_frame: sequence-length-1 frame; its ``poses`` are the
                initialization, its vertex/normal maps are the association
                target image.
            initial_transform: optional ``(B, 4, 4)`` warm-start correction
                (e.g. from a coarser pyramid level); the returned transform
                includes it.
        """
        if maps_pointclouds.normals is None:
            raise ValueError(
                "maps_pointclouds missing normals. Map normals must be "
                "provided if using ProjectiveOdometryProvider."
            )
        if not isinstance(live_frame, RGBDImages):
            raise TypeError(
                f"Expected live_frame to be of type RGBDImages. "
                f"Got {type(live_frame)}."
            )
        if live_frame.poses is None:
            raise ValueError(
                "live_frame must carry poses (the initialization the "
                "projective solve starts from)."
            )
        if len(maps_pointclouds) != len(live_frame):
            raise ValueError(
                "Batch size of maps_pointclouds and live_frame should be "
                f"equal ({len(maps_pointclouds)} != {len(live_frame)})."
            )
        live_frame = live_frame.to_channels_last()
        Bn, _, H, W = live_frame.shape
        HW = H * W
        # Packed association image: vertex | normal | valid | pad — one
        # 8-wide row gather per iteration serves the whole association
        # (row gathers are flat-cost up to 32-byte rows; design.md §2).
        vert = live_frame.vertex_map.reshape(Bn, HW, 3)
        nrm = live_frame.normal_map.reshape(Bn, HW, 3)
        valid = live_frame.valid_depth_mask.reshape(Bn, HW, 1)
        frame_geom = jnp.concatenate(
            [vert, nrm, valid.astype(vert.dtype), jnp.zeros_like(valid,
             dtype=vert.dtype)],
            axis=-1,
        )
        if initial_transform is None:
            initial_transform = jnp.broadcast_to(
                jnp.eye(4, dtype=maps_pointclouds.points.dtype), (Bn, 4, 4)
            )

        fn = (
            point_to_plane_gradICP_projective
            if self.solver == "gradicp"
            else point_to_plane_ICP_projective
        )
        kw = dict(
            numiters=self.numiters,
            damp=self.damp,
            dist_thresh=self.dist_thresh,
            dot_gate=self.dot_gate,
            lookahead_assoc=self.lookahead_assoc,
            robust_loss=self.robust_loss,
            robust_scale=self.robust_scale,
            sym_normals=self.sym_normals,
            point_weight=self.point_weight,
            subpixel=self.subpixel,
        )
        if self.solver == "gradicp":
            kw.update(lambda_max=self.lambda_max, B=self.B, B2=self.B2,
                      nu=self.nu)

        def solve_one(m_pts, m_nrm, m_mask, fgeom, K, pose, init_T):
            return fn(m_pts, m_nrm, m_mask, fgeom, K, pose, H, W,
                      initial_transform=init_T, **kw)

        transforms = jax.vmap(solve_one)(
            maps_pointclouds.points,
            maps_pointclouds.normals,
            maps_pointclouds.nonpad_mask,
            frame_geom,
            live_frame.intrinsics[:, 0],
            live_frame.poses[:, 0],
            initial_transform,
        )
        return transforms[:, None]
