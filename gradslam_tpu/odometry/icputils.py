r"""Point-to-plane ICP / GradICP solver toolbox (TPU-native).

Re-design of ``/root/reference/gradslam/odometry/icputils.py`` for XLA's
trace-once model:

- KNN association uses the TPU :mod:`gradslam_tpu.ops.knn` kernel instead of
  the chamferdist CUDA extension (reference :3, :200).
- The reference filters source rows by distance threshold into dynamic-length
  ``A``/``b`` systems (:203-230); here rows stay static-shaped and invalid rows
  are *zeroed*, so they contribute nothing to the ``A^T A`` normal equations.
- The normal equations are solved with a batched 6x6 ``jnp.linalg.solve``
  rather than an explicit inverse (reference :90).
- The LM accept/reject branch (:356-365) becomes ``jnp.where`` selects; the
  gradLM update (:496-543) is already branch-free and maps directly.
- The iteration loop is a ``lax.scan`` — one trace, ``numiters`` iterations.
- Downsampling keeps static shapes: strided slicing for frames (:654-667) and
  masked compaction into a fixed-capacity buffer for maps (:596-597).

All solvers operate on a single cloud pair ``(N, 3)`` with validity masks and
are designed to be ``vmap``-ed over the batch (the reference serialises over
batch in Python — odometry/icp.py:84-95).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.geometryutils import transform_pointcloud
from ..geometry.se3utils import se3_exp
from ..ops import nn_points_auto
from ..ops import knn_points  # noqa: F401  (reference parity: the reference
# re-exports chamferdist's knn_points from this namespace, icputils.py:3)
from ..structures.pointclouds import Pointclouds, compact_masked
from ..structures.rgbdimages import RGBDImages
from ..utils.precision import matmul_hp

__all__ = [
    "solve_linear_system",
    "robust_weights",
    "validate_robust",
    "validate_pyramid",
    "gauss_newton_solve",
    "point_to_plane_ICP",
    "point_to_plane_gradICP",
    "downsample_pointclouds",
    "downsample_rgbdimages",
]


def solve_linear_system(A: jnp.ndarray, b: jnp.ndarray, damp=1e-8) -> jnp.ndarray:
    r"""Solve the damped normal equations ``(A^T A + damp I) x = A^T b``.

    ``A (N, 6)``, ``b (N, 1)`` — invalid rows must be zeroed by the caller so
    they contribute nothing. Uses a 6x6 linear solve instead of the reference's
    explicit inverse (icputils.py:90).
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    if A.ndim != 2:
        raise ValueError(f"A should have ndim=2, but had ndim={A.ndim}")
    if b.ndim != 2 or b.shape[1] != 1:
        raise ValueError(f"b should have shape (N, 1), but had {b.shape}")
    if A.shape[0] != b.shape[0]:
        raise ValueError(
            f"A.shape[0] and b.shape[0] should be equal ({A.shape[0]} != {b.shape[0]})"
        )
    damp = jnp.asarray(damp, dtype=A.dtype)
    AtA = matmul_hp(A.T, A) + damp * jnp.eye(A.shape[1], dtype=A.dtype)
    Atb = matmul_hp(A.T, b)
    return jnp.linalg.solve(AtA, Atb)


def robust_weights(r: jnp.ndarray, loss: Optional[str], scale: float) -> jnp.ndarray:
    r"""IRLS sqrt-weights for a robust loss at residuals ``r``.

    Scaling a row of the linear system by ``sqrt(w(r))`` makes the normal
    equations minimise ``sum w(r) r^2`` — the standard IRLS approximation of
    the robust objective. All kernels are continuous in ``r`` so gradients
    flow end-to-end (no stop_gradient).

    loss: ``None`` (all-ones — plain least squares), ``'huber'``
    (``w = min(1, scale/|r|)``) or ``'tukey'`` (``w = (1-(r/scale)^2)^2``
    inside ``|r| <= scale``, 0 outside — hard outlier rejection).
    """
    if loss is None:
        return jnp.ones_like(r)
    # Both kernels' SQRT-weights have closed forms, so no sqrt (and no
    # sqrt-at-zero gradient guard) is needed:
    #   huber: sqrt(min(1, scale/|r|)) = min(1, sqrt(scale/|r|))
    #   tukey: sqrt((1-u^2)^2) = 1 - u^2   (u clipped to [-1, 1])
    if loss == "huber":
        a = jnp.abs(r)
        return jnp.minimum(1.0, jnp.sqrt(scale / jnp.maximum(a, 1e-12)))
    if loss == "tukey":
        u = jnp.clip(r / scale, -1.0, 1.0)
        return 1.0 - u * u
    raise ValueError(
        f"Unknown robust loss: {loss!r}. Expected None, 'huber' or 'tukey'."
    )


def _normal_gate(src_n, assoc_n, dot_gate):
    r"""Cosine compatibility gate between two normal fields.

    Robust to non-unit inputs: fused map normals are confidence-weighted
    AVERAGES and are never renormalized (fusionutils ``fuse_with_map``), so
    their norm is < 1 on blended surfaces — a raw dot against them would make
    the effective gate tighter than ``cos(angle)`` exactly where the map is
    well-observed. Comparing ``dot >= gate * |n1||n2|`` is the normalized
    cosine test without a division (padding rows with zero normals get
    ``0 >= gate * eps`` — rejected for positive gates, admitted for
    non-positive ones, same as the normalized-cosine convention).

    ``>=`` (not ``>``) so ``dot_gate=-1.0`` admits every row, including
    exactly anti-parallel normals — equivalent to no gate at all.
    """
    dot = jnp.sum(src_n * assoc_n, axis=-1)
    nn = jnp.linalg.norm(src_n, axis=-1) * jnp.linalg.norm(assoc_n, axis=-1)
    return dot >= dot_gate * jnp.maximum(nn, 1e-12)


def validate_robust(robust_loss, robust_scale) -> None:
    """Constructor-time validation of robust-kernel parameters (shared by the
    single-device and map-sharded pipelines)."""
    if robust_loss not in (None, "huber", "tukey"):
        raise ValueError(
            f"Unknown robust_loss: {robust_loss!r}. "
            "Expected None, 'huber' or 'tukey'."
        )
    if robust_loss is not None and not robust_scale > 0:
        # scale == 0 zeroes every IRLS weight: A and b become all-zero and
        # the solver silently becomes a no-op — fail loudly instead.
        raise ValueError(
            f"robust_scale must be > 0. Got {robust_scale}."
        )


def validate_pyramid(pyramid):
    """Normalize/validate a coarse-to-fine ``[(dsratio, numiters), ...]``
    schedule (shared by the single-device and map-sharded pipelines).
    Returns the normalized list (or None)."""
    if pyramid is None:
        return None
    try:
        pyramid = [(int(d), int(n)) for d, n in pyramid]
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"pyramid must be a list of (dsratio, numiters) pairs. "
            f"Got {pyramid!r}."
        ) from e
    if not pyramid or any(d < 1 or n < 1 for d, n in pyramid):
        raise ValueError(
            f"pyramid levels must have dsratio >= 1 and numiters >= 1. "
            f"Got {pyramid!r}."
        )
    ds = [d for d, _ in pyramid]
    if any(d2 > d1 for d1, d2 in zip(ds, ds[1:])):
        # the LAST level's transform is the result; a fine-to-coarse order
        # would silently discard the fine refinement as a mere warm start
        raise ValueError(
            f"pyramid must be coarse-to-fine (non-increasing dsratio). "
            f"Got dsratios {ds}."
        )
    return pyramid


def gauss_newton_solve(
    src_pc: jnp.ndarray,  # (N, 3)
    tgt_pc: jnp.ndarray,  # (M, 3)
    tgt_normals: jnp.ndarray,  # (M, 3)
    src_mask: Optional[jnp.ndarray] = None,  # (N,) bool
    tgt_mask: Optional[jnp.ndarray] = None,  # (M,) bool
    dist_thresh: Optional[float] = None,
    robust_loss: Optional[str] = None,
    robust_scale: float = 0.05,
    src_normals: Optional[jnp.ndarray] = None,  # (N, 3), same frame as tgt
    dot_gate: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    r"""Linearise the point-to-plane error around the current source cloud.

    Returns ``(A, b, chamfer_idx)`` with ``A (N, 6)``, ``b (N, 1)``; rows for
    masked-out or distance-filtered source points are zero (the reference
    instead drops them into a dynamic-length system, icputils.py:203-230).
    ``A = [n | s x n]``, ``b = n . (d - s)`` (icputils.py:227-230).
    ``robust_loss`` IRLS-weights the rows (see :func:`robust_weights`) —
    a capability the reference lacks (plain least squares only).

    ``dot_gate`` (with ``src_normals``, rotated to the same world frame as
    the current ``src_pc`` iterate) additionally rejects rows whose source
    and associated target normals disagree beyond the cosine gate — the
    wrong-surface matches a pure distance gate admits when candidate spacing
    is finer than the depth noise (docs/design.md §4; the same gate the
    projective mode carries as ``dot_gate``).
    """
    _validate_gate_args(dot_gate, src_normals)
    dists, idx = nn_points_auto(src_pc, tgt_pc, tgt_mask)
    valid = jnp.ones(src_pc.shape[0], dtype=bool) if src_mask is None else src_mask
    if dist_thresh is not None:
        valid = valid & (dists < dist_thresh)
    assoc_normals = jnp.take(tgt_normals, idx, axis=0)
    if dot_gate is not None:
        valid = valid & _normal_gate(src_normals, assoc_normals, dot_gate)
    A, b = _ptp_system(src_pc, jnp.take(tgt_pc, idx, axis=0),
                       assoc_normals, valid,
                       robust_loss, robust_scale)
    return A, b, idx


def _ptp_system(s, assoc_pts, assoc_normals, valid, robust_loss=None,
                robust_scale=0.05):
    """Masked point-to-plane linear system rows for a fixed association."""
    n = assoc_normals
    sxn = jnp.cross(s, n)  # rows [nz*sy - ny*sz, nx*sz - nz*sx, ny*sx - nx*sy]
    A = jnp.concatenate([n, sxn], axis=-1)  # (N, 6)
    b = jnp.sum(n * (assoc_pts - s), axis=-1, keepdims=True)  # (N, 1)
    validf = valid[:, None].astype(A.dtype)
    if robust_loss is not None:
        validf = validf * robust_weights(b, robust_loss, robust_scale)
    return A * validf, b * validf


_MIN_INLIER_MASS = 12.0  # two constraints per DOF of the 6-vector solve
_TRUST_RADIUS_SCALES = 10.0  # max |xi| per iteration, in robust_scale units


def _safe_sqrt(sq):
    """sqrt with a zero-safe GRADIENT: ``d sqrt/dx -> inf`` at exactly 0, so
    a plain sqrt NaN-poisons the backward whenever the guard's target
    scenario (all weights zero => xi == 0) occurs inside a differentiated
    program. Double-``where`` keeps the gradient 0 there (design.md §5)."""
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def _guard_robust_step(xi, A, robust_scale, src_pc, src_mask, wmass=None):
    r"""Step guard for robust solves: bound + fade the solved update.

    A hard-rejecting kernel (tukey) can zero (or nearly zero) EVERY row of
    the weighted system when the initialization drifts outside the inlier
    band — e.g. a constant-velocity prior feeding back one bad solve. The
    damped normal equations then invert a near-singular 6x6 whose "solution"
    is unbounded garbage (1e6+ twists observed); gradICP applies it
    unconditionally (no reject branch, reference icputils.py:527-543), the
    next prediction amplifies it, and the pose diverges super-exponentially
    to overflow/NaN within ~5 frames (observed on the hard benchmark clip).

    Two composable guards, both exactly 1.0 for healthy solves so
    trajectories are bit-identical away from the failure regime:

    - displacement trust region: the worst-case POINT MOTION of the step is
      capped at ``_TRUST_RADIUS_SCALES * robust_scale``. The twist acts
      about the origin of the cloud's coordinate frame, so clamping the raw
      twist norm would NOT bound the motion (the rotation lever arm is the
      cloud's distance from the origin). Decomposing about the cloud
      centroid ``c`` makes the bound origin-independent:
      ``v + w x p = (v + w x c) + w x (p - c)``, so
      ``max_p |dp| <= |v + w x c| + |w| * r_spread`` with ``r_spread`` the
      cloud's radius about its own centroid (scene-scale, NOT distance from
      the world origin — a tracked camera far from the origin still gets
      full-size rotation corrections). Surviving rows have residuals
      ``<= robust_scale`` by construction, so a step orders of magnitude
      beyond the band is inconsistent with the data that produced it;
    - inlier-mass fade: each surviving row's first three columns are
      ``w * n``, so ``sum(A[:, :3]**2) = sum(w^2 |n|^2)`` — a
      SQUARED-weight mass, intentionally conservative: a partial-weight
      row (IRLS weight w < 1) contributes w^2 < w units, so the fade
      requires close to ``_MIN_INLIER_MASS`` near-full-weight rows, not
      merely that many half-trusted ones. Below
      ``min(_MIN_INLIER_MASS, N/2)`` units (relative floor so
      legitimately small clouds keep their full step) the step fades
      linearly to zero — a lost tracker coasts on its prior instead of
      chasing noise.
    """
    mass_floor = min(_MIN_INLIER_MASS, 0.5 * src_pc.shape[0])
    if wmass is None:
        wmass = jnp.sum(A[:, :3] ** 2)
    fade = jnp.minimum(1.0, wmass / mass_floor)
    radius = _TRUST_RADIUS_SCALES * robust_scale
    xi_flat = xi.reshape(-1)
    v, omega = xi_flat[:3], xi_flat[3:]
    if src_mask is None:
        c = jnp.mean(src_pc, axis=0)
        r2 = jnp.max(jnp.sum((src_pc - c) ** 2, axis=-1))
    else:
        m = src_mask.astype(src_pc.dtype)[:, None]
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        c = jnp.sum(src_pc * m, axis=0) / cnt
        r2 = jnp.max(jnp.sum(((src_pc - c) * m) ** 2, axis=-1))
    disp = (_safe_sqrt(jnp.sum((v + jnp.cross(omega, c)) ** 2))
            + _safe_sqrt(jnp.sum(omega * omega)) * _safe_sqrt(r2))
    # == min(1, radius/disp), but with the divisor bounded below by radius:
    # dividing by a tiny clamp makes the division's BACKWARD (-radius/x^2)
    # overflow to inf, and 0 * inf = NaN poisons the whole grad
    trust = radius / jnp.maximum(disp, radius)
    return xi * (fade * trust)


def _reused_residual(pc, idx, tgt_pc, tgt_normals, src_mask, dist_thresh,
                     robust_loss=None, robust_scale=0.05,
                     src_normals=None, dot_gate=None):
    """Lookahead residual with the PREVIOUS association reused: recompute only
    distances/residuals at the moved source positions (no second KNN).
    ``src_normals`` must be rotated to the moved source frame when
    ``dot_gate`` is set (same gating as :func:`gauss_newton_solve`)."""
    assoc_pts = jnp.take(tgt_pc, idx, axis=0)
    assoc_normals = jnp.take(tgt_normals, idx, axis=0)
    valid = jnp.ones(pc.shape[0], dtype=bool) if src_mask is None else src_mask
    if dist_thresh is not None:
        dists = jnp.sum((pc - assoc_pts) ** 2, axis=-1)
        valid = valid & (dists < dist_thresh)
    if dot_gate is not None:
        valid = valid & _normal_gate(src_normals, assoc_normals, dot_gate)
    _, b = _ptp_system(pc, assoc_pts, assoc_normals, valid, robust_loss,
                       robust_scale)
    return b


class _ICPState(NamedTuple):
    src_pc: jnp.ndarray
    transform: jnp.ndarray
    damp: jnp.ndarray


def _icp_common_setup(src_pc, tgt_pc, tgt_normals, initial_transform, damp):
    src_pc = jnp.asarray(src_pc)
    tgt_pc = jnp.asarray(tgt_pc)
    tgt_normals = jnp.asarray(tgt_normals)
    if src_pc.ndim == 3:  # accept the reference's (1, N, 3) convention
        src_pc = src_pc[0]
    if tgt_pc.ndim == 3:
        tgt_pc = tgt_pc[0]
    if tgt_normals.ndim == 3:
        tgt_normals = tgt_normals[0]
    if initial_transform is None:
        initial_transform = jnp.eye(4, dtype=src_pc.dtype)
    initial_transform = jnp.asarray(initial_transform)
    src0 = transform_pointcloud(src_pc, initial_transform)
    damp = jnp.asarray(damp, dtype=src_pc.dtype)
    return src0, tgt_pc, tgt_normals, initial_transform, damp


def _validate_gate_args(dot_gate, src_normals):
    """The gate needs both halves: reject either one alone loudly (a lone
    ``src_normals`` used to be a silent no-op — asymmetric API, ADVICE r4)."""
    if dot_gate is not None and src_normals is None:
        raise ValueError("dot_gate requires src_normals.")
    if src_normals is not None and dot_gate is None:
        raise ValueError(
            "src_normals were provided but dot_gate is None — the gate is "
            "the only consumer of source normals, so they would be silently "
            "ignored. Pass dot_gate (e.g. -1.0 to admit everything) or drop "
            "src_normals."
        )


def _setup_src_normals(src_normals, dot_gate, src0):
    """Normalize the optional source-normal input for the dot gate: accept
    the reference's (1, N, 3) convention and match the source dtype."""
    if dot_gate is None or src_normals is None:
        return None
    src_normals = jnp.asarray(src_normals, dtype=src0.dtype)
    if src_normals.ndim == 3:
        src_normals = src_normals[0]
    return src_normals


def point_to_plane_ICP(
    src_pc,
    tgt_pc,
    tgt_normals,
    initial_transform=None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    lookahead_assoc: str = "fresh",
    robust_loss: Optional[str] = None,
    robust_scale: float = 0.05,
    src_normals: Optional[jnp.ndarray] = None,
    dot_gate: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Point-to-plane ICP with the classic LM accept/reject loop
    (reference icputils.py:235-366), trust-region branch as ``where`` selects.

    ``lookahead_assoc``: the LM lookahead error evaluation re-associates by
    default ('fresh', reference semantics — a second KNN per iteration);
    'reuse' keeps the iteration's association and only recomputes residuals
    at the moved positions, halving KNN cost per iteration at slightly
    different trust-region decisions (not an approximation of the error —
    both are valid LM merit functions).

    ``dot_gate`` (a minimum cosine, with ``src_normals`` in the SOURCE
    cloud's frame — rotated to each iterate internally) rejects
    normal-incompatible associations; see :func:`gauss_newton_solve`.

    Returns ``(transform (4, 4), chamfer_idx (N,))``.
    """
    if lookahead_assoc not in ("fresh", "reuse"):
        raise ValueError(f"Unknown lookahead_assoc mode: {lookahead_assoc}")
    if numiters < 1:
        raise ValueError(f"numiters must be >= 1. Got {numiters}.")
    _validate_gate_args(dot_gate, src_normals)
    src0, tgt_pc, tgt_normals, init_T, damp0 = _icp_common_setup(
        src_pc, tgt_pc, tgt_normals, initial_transform, damp
    )
    src_n = _setup_src_normals(src_normals, dot_gate, src0)

    def gn(pc, nrm):
        return gauss_newton_solve(pc, tgt_pc, tgt_normals, src_mask, tgt_mask,
                                  dist_thresh, robust_loss, robust_scale,
                                  nrm, dot_gate)

    def body(state: _ICPState, _):
        # current-iterate source normals: the accumulated transform includes
        # initial_transform, and the cloud evolves as transform(src), so the
        # normals are R(transform) @ n_src (rotation-only)
        n_cur = (
            None if src_n is None
            else matmul_hp(src_n, state.transform[:3, :3].T)
        )
        A, b, idx = gn(state.src_pc, n_cur)
        xi = solve_linear_system(A, b, state.damp)
        if robust_loss is not None:  # see _guard_robust_step
            xi = _guard_robust_step(xi, A, robust_scale, state.src_pc,
                                     src_mask)
        residual_transform = se3_exp(xi)
        err = jnp.sum(b * b)
        one_step_pc = transform_pointcloud(state.src_pc, residual_transform)
        n_step = (
            None if n_cur is None
            else matmul_hp(n_cur, residual_transform[:3, :3].T)
        )
        if lookahead_assoc == "reuse":
            b1 = _reused_residual(
                one_step_pc, idx, tgt_pc, tgt_normals, src_mask, dist_thresh,
                robust_loss, robust_scale, n_step, dot_gate,
            )
        else:
            _, b1, _ = gn(one_step_pc, n_step)
        new_err = jnp.sum(b1 * b1)
        accept = new_err < err
        new_state = _ICPState(
            src_pc=jnp.where(accept, one_step_pc, state.src_pc),
            transform=jnp.where(
                accept, matmul_hp(residual_transform, state.transform), state.transform
            ),
            damp=jnp.where(accept, state.damp / 2.0, state.damp * 2.0),
        )
        return new_state, idx

    init = _ICPState(src_pc=src0, transform=init_T, damp=damp0)
    final, idx_hist = jax.lax.scan(body, init, None, length=numiters)
    return final.transform, idx_hist[-1]


def point_to_plane_gradICP(
    src_pc,
    tgt_pc,
    tgt_normals,
    initial_transform=None,
    numiters: int = 20,
    damp: float = 1e-8,
    dist_thresh: Optional[float] = None,
    lambda_max: float = 2.0,
    B: float = 1.0,
    B2: float = 1.0,
    nu: float = 200.0,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    lookahead_assoc: str = "fresh",
    robust_loss: Optional[str] = None,
    robust_scale: float = 0.05,
    src_normals: Optional[jnp.ndarray] = None,
    dot_gate: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Differentiable gradLM ICP (gradSLAM paper sec. gradLM; reference
    icputils.py:370-545). Smooth sigmoid-blended damping and step scaling;
    always applies the scaled step (no reject branch), with the errdiff
    clamped to +-70 for gradient flow (reference :530).

    ``lookahead_assoc='reuse'`` skips the lookahead's second KNN (see
    :func:`point_to_plane_ICP`) — it only modulates the smooth damping/step
    blending here, so trajectories stay close to 'fresh'.

    ``dot_gate`` / ``src_normals``: normal-compatibility association gate,
    as in :func:`point_to_plane_ICP`.

    Returns ``(transform (4, 4), chamfer_idx (N,))``.
    """
    if lookahead_assoc not in ("fresh", "reuse"):
        raise ValueError(f"Unknown lookahead_assoc mode: {lookahead_assoc}")
    if numiters < 1:
        # A length-0 solver scan would die later on idx_hist[-1] with an
        # opaque IndexError deep in the trace (the pyramid path already
        # validates its per-level iteration counts).
        raise ValueError(f"numiters must be >= 1. Got {numiters}.")
    _validate_gate_args(dot_gate, src_normals)
    src0, tgt_pc, tgt_normals, init_T, damp0 = _icp_common_setup(
        src_pc, tgt_pc, tgt_normals, initial_transform, damp
    )
    src_n = _setup_src_normals(src_normals, dot_gate, src0)
    lambda_min = 1.0 / lambda_max

    def gn(pc, nrm):
        return gauss_newton_solve(pc, tgt_pc, tgt_normals, src_mask, tgt_mask,
                                  dist_thresh, robust_loss, robust_scale,
                                  nrm, dot_gate)

    def body(state: _ICPState, _):
        n_cur = (
            None if src_n is None
            else matmul_hp(src_n, state.transform[:3, :3].T)
        )
        A, b, idx = gn(state.src_pc, n_cur)
        xi = solve_linear_system(A, b, state.damp)
        if robust_loss is not None:  # see _guard_robust_step
            xi = _guard_robust_step(xi, A, robust_scale, state.src_pc,
                                     src_mask)
        residual_transform = se3_exp(xi)
        err = jnp.sum(b * b)
        one_step_pc = transform_pointcloud(state.src_pc, residual_transform)
        n_step = (
            None if n_cur is None
            else matmul_hp(n_cur, residual_transform[:3, :3].T)
        )
        if lookahead_assoc == "reuse":
            b1 = _reused_residual(
                one_step_pc, idx, tgt_pc, tgt_normals, src_mask, dist_thresh,
                robust_loss, robust_scale, n_step, dot_gate,
            )
        else:
            _, b1, _ = gn(one_step_pc, n_step)
        new_err = jnp.sum(b1 * b1)

        errdiff = jnp.clip(new_err - err, -70.0, 70.0)
        damp_new = lambda_min + (lambda_max - lambda_min) / (1.0 + jnp.exp(-B * errdiff))
        new_damp = state.damp * damp_new
        sigmoid = 1.0 / (1.0 + jnp.exp(-B2 * errdiff)) ** (1.0 / nu)
        scaled_transform = se3_exp(sigmoid * xi[:, 0])
        new_state = _ICPState(
            src_pc=transform_pointcloud(state.src_pc, scaled_transform),
            transform=matmul_hp(scaled_transform, state.transform),
            damp=new_damp,
        )
        return new_state, idx

    init = _ICPState(src_pc=src0, transform=init_T, damp=damp0)
    final, idx_hist = jax.lax.scan(body, init, None, length=numiters)
    return final.transform, idx_hist[-1]


def downsample_pointclouds(
    pointclouds: Pointclouds,
    active_mask: jnp.ndarray,  # (B, CAP) bool
    pix_h: jnp.ndarray,  # (B, CAP) int32
    pix_w: jnp.ndarray,  # (B, CAP) int32
    ds_ratio: int,
    capacity: int,
) -> Pointclouds:
    r"""Keep active map points whose projected pixel is ``(0 mod ds)`` in both
    axes (reference icputils.py:548-621), compacted into a fixed ``capacity``
    buffer instead of ragged per-batch lists.

    If more points survive the stride filter than ``capacity`` (possible on
    append-ordered maps where many frames of a revisited surface stack on the
    same pixels), the buffer keeps a buffer-order prefix and the overflow is
    recorded in the returned cloud's ``num_dropped`` counters — raise the
    pipeline's ``icp_capacity`` (or set ``icp_window_frames``) if it is
    nonzero.
    """
    if not isinstance(ds_ratio, int):
        raise TypeError(f"Expected ds_ratio to be of type int. Got {type(ds_ratio)}.")
    keep = active_mask & (pix_h % ds_ratio == 0) & (pix_w % ds_ratio == 0)
    points, counts = compact_masked(pointclouds.points, keep, capacity)
    normals = None
    colors = None
    if pointclouds.normals is not None:
        normals, _ = compact_masked(pointclouds.normals, keep, capacity)
    if pointclouds.colors is not None:
        colors, _ = compact_masked(pointclouds.colors, keep, capacity)
    dropped = jnp.sum(keep.astype(jnp.int32), axis=-1) - counts
    return Pointclouds(points=points, num_points=counts, normals=normals,
                       colors=colors, num_dropped=dropped)


def downsample_rgbdimages(rgbdimages: RGBDImages, ds_ratio: int) -> Pointclouds:
    r"""Strided-subsample a sequence-length-1 frame into a Pointclouds
    (reference icputils.py:623-669). Invalid-depth points are compacted out.
    """
    if not isinstance(rgbdimages, RGBDImages):
        raise TypeError(
            f"Expected rgbdimages to be of type RGBDImages. Got {type(rgbdimages)}."
        )
    rgbdimages = rgbdimages.to_channels_last()
    if not isinstance(ds_ratio, int):
        raise TypeError(f"Expected ds_ratio to be of type int. Got {type(ds_ratio)}.")
    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"Sequence length of rgbdimages must be 1, but was {rgbdimages.shape[1]}."
        )
    B = len(rgbdimages)
    mask = rgbdimages.valid_depth_mask[:, 0, ::ds_ratio, ::ds_ratio, 0]
    pts = rgbdimages.global_vertex_map[:, 0, ::ds_ratio, ::ds_ratio]
    nrm = rgbdimages.global_normal_map[:, 0, ::ds_ratio, ::ds_ratio]
    col = rgbdimages.rgb_image[:, 0, ::ds_ratio, ::ds_ratio]
    N = pts.shape[1] * pts.shape[2]
    maskf = mask.reshape(B, N)
    points, counts = compact_masked(pts.reshape(B, N, 3), maskf, N)
    normals, _ = compact_masked(nrm.reshape(B, N, 3), maskf, N)
    colors, _ = compact_masked(col.reshape(B, N, 3), maskf, N)
    return Pointclouds(points=points, num_points=counts, normals=normals, colors=colors)
