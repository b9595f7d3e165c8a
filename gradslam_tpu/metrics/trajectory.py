r"""Trajectory metrics: ATE-RMSE and RPE.

The reference ships an empty ``gradslam/metrics`` module (0 LoC, SURVEY §5) —
the gradSLAM paper's evaluation metrics were never vendored. This module
implements them for real (they are the north-star accuracy measures, see
BASELINE.md): absolute trajectory error after Umeyama/Horn alignment, and
relative pose error over a fixed frame delta — following the standard TUM
benchmark definitions (Sturm et al., IROS 2012).

JAX implementations; differentiable (so ATE can be a training loss, which the
reference could never do).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils.precision import matmul_hp

__all__ = ["ate_rmse", "align_trajectories", "rpe"]


def _as_positions(poses) -> jnp.ndarray:
    poses = jnp.asarray(poses)
    if poses.ndim == 3 and poses.shape[-2:] == (4, 4):
        return poses[:, :3, 3]
    if poses.ndim == 2 and poses.shape[-1] == 3:
        return poses
    raise ValueError(
        f"poses must have shape (L, 4, 4) or (L, 3). Got {poses.shape}."
    )


def align_trajectories(
    est: jnp.ndarray, gt: jnp.ndarray, with_scale: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    r"""Umeyama closed-form alignment of estimated positions to ground truth.

    Returns ``(R (3, 3), t (3,), s scalar)`` minimising
    ``||gt - (s R est + t)||``.
    """
    est_p = _as_positions(est)
    gt_p = _as_positions(gt)
    mu_e = est_p.mean(axis=0)
    mu_g = gt_p.mean(axis=0)
    xe = est_p - mu_e
    xg = gt_p - mu_g
    cov = matmul_hp(xg.T, xe) / est_p.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=est_p.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = matmul_hp(matmul_hp(U, S), Vt)
    if with_scale:
        var_e = (xe**2).sum() / est_p.shape[0]
        s = (D * jnp.diag(S)).sum() / var_e
    else:
        s = jnp.asarray(1.0, dtype=est_p.dtype)
    t = mu_g - s * matmul_hp(R, mu_e[:, None])[:, 0]
    return R, t, s


def ate_rmse(est_poses, gt_poses, align: bool = True) -> jnp.ndarray:
    r"""Absolute trajectory error (RMSE over translational residuals), with
    optional rigid alignment. Shapes: ``(L, 4, 4)`` (or ``(L, 3)`` positions).
    """
    est_p = _as_positions(est_poses)
    gt_p = _as_positions(gt_poses)
    if est_p.shape != gt_p.shape:
        raise ValueError(
            f"est and gt trajectories must have the same shape. Got "
            f"{est_p.shape} and {gt_p.shape}."
        )
    if align:
        R, t, s = align_trajectories(est_p, gt_p)
        est_p = s * matmul_hp(est_p, R.T) + t
    err = jnp.linalg.norm(est_p - gt_p, axis=-1)
    return jnp.sqrt(jnp.mean(err**2))


def rpe(
    est_poses, gt_poses, delta: int = 1, reduce: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Relative pose error over frame pairs ``(i, i + delta)``.

    Returns ``(trans_rmse, rot_rmse_rad)``; with ``reduce=False``, the
    per-pair error arrays ``(trans (L - delta,), rot_rad (L - delta,))``
    instead (the TUM benchmark's evaluate_rpe.py reports mean/median/max
    over these).
    """
    est_poses = jnp.asarray(est_poses)
    gt_poses = jnp.asarray(gt_poses)
    if est_poses.shape != gt_poses.shape or est_poses.shape[-2:] != (4, 4):
        raise ValueError(
            f"expected matching (L, 4, 4) pose arrays. Got {est_poses.shape} "
            f"and {gt_poses.shape}."
        )
    if delta < 1:
        raise ValueError(f"delta must be >= 1. Got {delta}.")
    if est_poses.shape[0] <= delta:
        raise ValueError(
            f"delta ({delta}) must be smaller than trajectory length "
            f"({est_poses.shape[0]})."
        )

    def rel(poses):
        a = poses[:-delta] if delta > 0 else poses
        b = poses[delta:]
        return matmul_hp(jnp.linalg.inv(a), b)

    e = matmul_hp(jnp.linalg.inv(rel(gt_poses)), rel(est_poses))
    trans = jnp.linalg.norm(e[:, :3, 3], axis=-1)
    cos_angle = jnp.clip((jnp.trace(e[:, :3, :3], axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    rot = jnp.arccos(cos_angle)
    if not reduce:
        return trans, rot
    return jnp.sqrt(jnp.mean(trans**2)), jnp.sqrt(jnp.mean(rot**2))
