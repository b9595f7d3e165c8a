r"""Projective geometry utilities (TPU-native JAX implementation).

Functional, batched re-design of the reference API
(``/root/reference/gradslam/geometry/projutils.py``): ``homogenize_points`` (:10),
``unhomogenize_points`` (:46), ``project_points`` (:92), ``unproject_points`` (:241),
``inverse_intrinsics`` (:405). All functions are pure, broadcast over arbitrary
leading dimensions, and are safe to ``jax.jit`` / ``jax.vmap`` / differentiate.
"""

from __future__ import annotations

import jax.numpy as jnp
from ..utils.precision import einsum_hp, matmul_hp

__all__ = [
    "homogenize_points",
    "unhomogenize_points",
    "project_points",
    "unproject_points",
    "inverse_intrinsics",
]


def _as_array(x, name: str) -> jnp.ndarray:
    if isinstance(x, (str, bytes)) or x is None:
        raise TypeError(f"Expected {name} to be an array. Got {type(x)} instead.")
    return jnp.asarray(x)


def homogenize_points(pts) -> jnp.ndarray:
    r"""Convert points to homogeneous coordinates by appending a trailing 1.

    Shape: ``(*, K) -> (*, K+1)``.
    """
    pts = _as_array(pts, "pts")
    if pts.ndim < 2:
        raise ValueError(
            f"Input tensor must have at least 2 dimensions. Got {pts.ndim} instead."
        )
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def unhomogenize_points(pts, eps: float = 1e-6) -> jnp.ndarray:
    r"""Convert homogeneous points to Euclidean coordinates.

    Points at infinity (``|w| <= eps``) use a scale factor of 1, matching the
    OpenCV convention used by the reference (projutils.py:87-89).

    Shape: ``(*, K) -> (*, K-1)``.
    """
    pts = _as_array(pts, "pts")
    if pts.ndim < 2:
        raise ValueError(
            f"Input tensor must have at least 2 dimensions. Got {pts.ndim} instead."
        )
    w = pts[..., -1:]
    scale = jnp.where(jnp.abs(w) > eps, 1.0 / jnp.where(w == 0, 1.0, w), 1.0)
    return scale * pts[..., :-1]


def _zdiv(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Divide by z with the z==0 -> divide-by-1 guard (projutils.py:234-236)."""
    return x / jnp.where(z == 0, jnp.ones_like(z), z)


def project_points(cam_coords, proj_mat, eps: float = 1e-6) -> jnp.ndarray:
    r"""Project 3D points in the camera frame onto the image plane.

    Args:
        cam_coords: points, shape ``(*, 3)`` or ``(*, 4)`` (homogeneous).
        proj_mat: ``(*, 4, 4)`` (or unbatched ``(4, 4)``) projection matrix.

    Returns:
        ``(*, 2)`` pixel coordinates ``(u, v)`` with the z-divide zero-guard of
        the reference (projutils.py:216-238).
    """
    cam_coords = _as_array(cam_coords, "cam_coords")
    proj_mat = _as_array(proj_mat, "proj_mat")
    if cam_coords.ndim < 2:
        raise ValueError(
            f"Input cam_coords must have at least 2 dims. Got {cam_coords.ndim}."
        )
    if cam_coords.shape[-1] not in (3, 4):
        raise ValueError(
            f"Input cam_coords must have shape (*, 3) or (*, 4). Got {cam_coords.shape}."
        )
    if proj_mat.ndim < 2 or proj_mat.shape[-1] != 4 or proj_mat.shape[-2] != 4:
        raise ValueError(
            f"Input proj_mat must have shape (*, 4, 4). Got {proj_mat.shape}."
        )
    if proj_mat.ndim > 2 and proj_mat.ndim != cam_coords.ndim:
        raise ValueError(
            "Batched proj_mat must have ndim equal to cam_coords.ndim (one "
            f"(4, 4) matrix per batch of points). Got {proj_mat.ndim} and "
            f"{cam_coords.ndim}."
        )
    if cam_coords.shape[-1] == 3:
        cam_coords = homogenize_points(cam_coords)
    # (*, 4, 4) @ (*, 4) -> (*, 4), broadcasting proj_mat over point dims.
    if proj_mat.ndim == 2:
        pts = einsum_hp("ij,...j->...i", proj_mat, cam_coords)
    else:
        # proj_mat (B, ..., 4, 4) applies to cam_coords (B, N, ..., 4): the
        # reference inserts the matrix at dim -3 (projutils.py:227).
        pts = matmul_hp(proj_mat[..., None, :, :], cam_coords[..., None])[..., 0]
    z = pts[..., 2]
    u = _zdiv(pts[..., 0], z)
    v = _zdiv(pts[..., 1], z)
    return jnp.stack([u, v], axis=-1)


def unproject_points(pixel_coords, intrinsics_inv, depths) -> jnp.ndarray:
    r"""Unproject pixels (with depth) into the camera coordinate frame.

    Args:
        pixel_coords: ``(*, 2)`` or homogeneous ``(*, 3)`` pixel coordinates.
        intrinsics_inv: ``(*, 3, 3)`` (or unbatched ``(3, 3)``) inverse intrinsics.
        depths: ``(*,)`` per-pixel depths.

    Returns:
        ``(*, 3)`` camera-frame points (reference projutils.py:241-403).
    """
    pixel_coords = _as_array(pixel_coords, "pixel_coords")
    intrinsics_inv = _as_array(intrinsics_inv, "intrinsics_inv")
    depths = _as_array(depths, "depths")
    if pixel_coords.ndim < 2:
        raise ValueError(
            f"Input pixel_coords must have at least 2 dims. Got {pixel_coords.ndim}."
        )
    if pixel_coords.shape[-1] not in (2, 3):
        raise ValueError(
            f"Input pixel_coords must have shape (*, 2) or (*, 3). Got {pixel_coords.shape}."
        )
    if intrinsics_inv.shape[-2:] != (3, 3):
        raise ValueError(
            f"intrinsics_inv must have shape (*, 3, 3). Got {intrinsics_inv.shape}."
        )
    if depths.ndim != pixel_coords.ndim - 1:
        raise ValueError(
            "depths must have one fewer dimension than pixel_coords. "
            f"Got {depths.ndim} and {pixel_coords.ndim}."
        )
    if pixel_coords.shape[-1] == 2:
        pixel_coords = homogenize_points(pixel_coords)
    if intrinsics_inv.ndim == 2:
        pts = einsum_hp("ij,...j->...i", intrinsics_inv, pixel_coords)
    else:
        pts = matmul_hp(intrinsics_inv[..., None, :, :], pixel_coords[..., None])[..., 0]
    return pts * depths[..., None]


def inverse_intrinsics(K, eps: float = 1e-6) -> jnp.ndarray:
    r"""Closed-form inverse of a (zero-skew) pinhole intrinsics matrix.

    Matches the reference exactly, including the ``1/(f + eps)`` regularisation
    (projutils.py:405-450). Accepts ``(*, 3, 3)`` or ``(*, 4, 4)``.
    """
    K = _as_array(K, "K")
    if K.ndim < 2:
        raise ValueError(f"Input K must have at least 2 dims. Got {K.ndim}.")
    if K.shape[-2:] not in ((3, 3), (4, 4)):
        raise ValueError(
            f"Input K must have shape (*, 3, 3) or (*, 4, 4). Got {K.shape}."
        )
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    Kinv = jnp.zeros_like(K)
    Kinv = Kinv.at[..., 0, 0].set(1.0 / (fx + eps))
    Kinv = Kinv.at[..., 1, 1].set(1.0 / (fy + eps))
    Kinv = Kinv.at[..., 0, 2].set(-cx / (fx + eps))
    Kinv = Kinv.at[..., 1, 2].set(-cy / (fy + eps))
    Kinv = Kinv.at[..., 2, 2].set(1.0)
    Kinv = Kinv.at[..., -1, -1].set(1.0)
    return Kinv
