r"""General 3D geometry utilities (TPU-native JAX implementation).

Covers the used surface of the reference ``geometryutils``
(``/root/reference/gradslam/geometry/geometryutils.py``): ``create_meshgrid``
(:576), ``relative_transformation`` (:413), ``transform_pointcloud`` (:737),
``transform_normals`` (:797), quaternion helpers (:100-204), plus JAX-native
replacements for the two kornia functions the reference imports
(``compose_transformations``, ``inverse_transformation`` — see SURVEY §2.4).

All functions are pure and batched: transforms broadcast over arbitrary
leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp
from ..utils.precision import einsum_hp, matmul_hp

# Reference parity: the reference duplicates homogenize/unhomogenize in this
# module (geometryutils.py, SURVEY §2.1 "Duplicated homogenize/unhomogenize");
# here they are canonical in projutils and re-exported so both import paths
# work.
from .projutils import homogenize_points, unhomogenize_points  # noqa: F401

__all__ = [
    "homogenize_points",
    "unhomogenize_points",
    "create_meshgrid",
    "compose_transformations",
    "inverse_transformation",
    "orthonormalize_rotations",
    "relative_transformation",
    "transform_pointcloud",
    "transform_normals",
    "normalize_quaternion",
    "quaternion_to_rotation_matrix",
    "quaternion_to_axisangle",
    "transform_pts_3d",
    "transform_pts_nd",
    "normalize_pixel_coords",
    "unnormalize_pixel_coords",
    "cam2pixel",
    "cam2pixel_KF",
    "pixel2cam",
    "inverse_transfom_3d",
    "compose_transforms_3d",
    "relative_transform_3d",
]


def create_meshgrid(
    height: int, width: int, normalized_coords: bool = True, dtype=jnp.float32
) -> jnp.ndarray:
    r"""Generate a pixel coordinate grid of shape ``(1, H, W, 2)``.

    ``grid[..., 0]`` is the row coordinate, ``grid[..., 1]`` the column
    coordinate — matching the reference convention (geometryutils.py:576-608)
    where ``xs`` ranges over the height. With ``normalized_coords=True`` the
    ranges are ``[-1, 1]``; otherwise ``[0, H-1] x [0, W-1]``.
    """
    if not isinstance(height, int):
        raise TypeError(f"Height must be an integer. Got {type(height)}.")
    if not isinstance(width, int):
        raise TypeError(f"Width must be an integer. Got {type(width)}.")
    if normalized_coords:
        xs = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    else:
        xs = jnp.arange(height, dtype=dtype)
        ys = jnp.arange(width, dtype=dtype)
    rows, cols = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([rows, cols], axis=-1)[None]


def compose_transformations(trans_01, trans_12) -> jnp.ndarray:
    r"""Compose two homogeneous transformations: ``T_02 = T_01 @ T_12``.

    JAX-native replacement for ``kornia.geometry.linalg.compose_transformations``
    (used by the reference at icpslam.py:6,245). Shapes: ``(*, 4, 4)``.
    """
    trans_01 = jnp.asarray(trans_01)
    trans_12 = jnp.asarray(trans_12)
    if trans_01.shape[-2:] != (4, 4) or trans_12.shape[-2:] != (4, 4):
        raise ValueError(
            f"Expected (*, 4, 4) transforms. Got {trans_01.shape} and {trans_12.shape}."
        )
    return matmul_hp(trans_01, trans_12)


def inverse_transformation(trans) -> jnp.ndarray:
    r"""Invert a rigid-body transformation: ``T^-1 = [R^T | -R^T t]``.

    JAX-native replacement for ``kornia.geometry.linalg.inverse_transformation``
    (used by the reference at fusionutils.py:5,250). Shape: ``(*, 4, 4)``.
    """
    trans = jnp.asarray(trans)
    if trans.shape[-2:] != (4, 4):
        raise ValueError(f"Expected (*, 4, 4) transform. Got {trans.shape}.")
    rmat = trans[..., :3, :3]
    tvec = trans[..., :3, 3]
    rmat_t = jnp.swapaxes(rmat, -1, -2)
    tvec_inv = -matmul_hp(rmat_t, tvec[..., None])[..., 0]
    out = jnp.zeros_like(trans)
    out = out.at[..., :3, :3].set(rmat_t)
    out = out.at[..., :3, 3].set(tvec_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def orthonormalize_rotations(trans) -> jnp.ndarray:
    r"""Project the rotation blocks of ``(*, 4, 4)`` transforms onto SO(3).

    One Newton step of the polar decomposition, ``R <- R (3I - R^T R) / 2``
    — quadratically convergent for nearly-orthonormal inputs (an ``eps``
    orthonormality error becomes ``O(eps^2)``), differentiable, and three
    3x3 matmuls per transform (no SVD).

    Why this exists: a motion-model carry that composes
    ``pose_k @ pose_{k-1}^{-1} @ pose_k`` every frame DOUBLES the f32
    rotation orthonormality error per frame (``~2.4^k`` growth from 1e-7):
    ``det(R)`` measurably drifts by frame ~13, reaches O(10) by frame ~20
    and overflows to NaN within a few more frames — even when tracking is
    perfect. Re-projecting the predicted pose each frame keeps the error at
    the f32 noise floor. (No reference equivalent; the reference has no
    motion model, and its per-frame composition chain grows errors only
    linearly.)
    """
    trans = jnp.asarray(trans)
    if trans.shape[-2:] != (4, 4):
        raise ValueError(f"Expected (*, 4, 4) transform. Got {trans.shape}.")
    R = trans[..., :3, :3]
    RtR = matmul_hp(jnp.swapaxes(R, -1, -2), R)
    eye = jnp.eye(3, dtype=trans.dtype)
    R_new = matmul_hp(R, 1.5 * eye - 0.5 * RtR)
    return trans.at[..., :3, :3].set(R_new)


def relative_transformation(trans_01, trans_02) -> jnp.ndarray:
    r"""Relative transform ``T_12 = T_01^-1 @ T_02``.

    Matches the reference (geometryutils.py:413-478); used by all datasets and
    the ground-truth odometry provider.
    """
    return matmul_hp(inverse_transformation(trans_01), jnp.asarray(trans_02))


def transform_pointcloud(pointcloud, transform) -> jnp.ndarray:
    r"""Apply rigid-body transform(s) to pointcloud(s): ``p' = R p + t``.

    Generalises the reference (geometryutils.py:737-795) to batched inputs:
    ``pointcloud (*, N, 3)``, ``transform (*, 4, 4)`` (or unbatched ``(4, 4)``).
    """
    pointcloud = jnp.asarray(pointcloud)
    transform = jnp.asarray(transform)
    if pointcloud.shape[-1] != 3:
        raise ValueError(f"pointcloud must have shape (*, 3). Got {pointcloud.shape}.")
    if transform.shape[-2:] != (4, 4):
        raise ValueError(f"transform must have shape (*, 4, 4). Got {transform.shape}.")
    rmat = transform[..., :3, :3]
    tvec = transform[..., :3, 3]
    if transform.ndim == 2:
        return einsum_hp("ij,...j->...i", rmat, pointcloud) + tvec
    # Batched: rmat (*, 3, 3) applied over the points axis.
    return einsum_hp("...ij,...nj->...ni", rmat, pointcloud) + tvec[..., None, :]


def transform_normals(normals, transform) -> jnp.ndarray:
    r"""Rotate normal vectors by the rotation part of the transform(s).

    Matches the reference (geometryutils.py:797-872); no translation applied.
    """
    normals = jnp.asarray(normals)
    transform = jnp.asarray(transform)
    if normals.shape[-1] != 3:
        raise ValueError(f"normals must have shape (*, 3). Got {normals.shape}.")
    if transform.shape[-2:] != (4, 4):
        raise ValueError(f"transform must have shape (*, 4, 4). Got {transform.shape}.")
    rmat = transform[..., :3, :3]
    if transform.ndim == 2:
        return einsum_hp("ij,...j->...i", rmat, normals)
    return einsum_hp("...ij,...nj->...ni", rmat, normals)


def transform_pts_3d(pts, transform) -> jnp.ndarray:
    r"""Apply a homogeneous ``(4, 4)`` transform to points of shape
    ``(*, 3)`` — grid-shaped inputs like ``(H, W, 3)`` included. A batched
    ``(B, ..., 4, 4)`` transform broadcasts over the point dims that follow
    its batch prefix, e.g. ``(B, 4, 4)`` over ``(B, H, W, 3)`` (reference
    geometryutils.py:304-359 documents exactly these batched grid shapes)."""
    pts = jnp.asarray(pts)
    transform = jnp.asarray(transform)
    if transform.shape[-2:] != (4, 4):
        raise ValueError(f"transform must have shape (*, 4, 4). Got {transform.shape}.")
    rmat = transform[..., :3, :3]
    tvec = transform[..., :3, 3]
    if transform.ndim == 2:
        return einsum_hp("ij,...j->...i", rmat, pts) + tvec
    # Batched: the matrix batch prefix aligns with the LEADING point dims;
    # insert broadcast axes for every remaining point dim (one axis is not
    # enough for grids — (B, 4, 4) over (B, H, W, 3) needs two).
    nb = transform.ndim - 2
    extra = pts.ndim - 1 - nb
    if extra < 0:
        raise ValueError(
            f"transform batch dims ({transform.shape[:-2]}) exceed point "
            f"dims ({pts.shape[:-1]})."
        )
    rmat = rmat.reshape(transform.shape[:nb] + (1,) * extra + (3, 3))
    tvec = tvec.reshape(transform.shape[:nb] + (1,) * extra + (3,))
    return matmul_hp(rmat, pts[..., None])[..., 0] + tvec


def transform_pts_nd(pts, transform) -> jnp.ndarray:
    r"""Batched homogeneous transform of ``(*, 3)`` points by ``(*, 4, 4)``
    matrices broadcast over the point dims (reference ``transform_pts_nd_KF``
    geometryutils.py:361-411). Same broadcasting as :func:`transform_pts_3d`."""
    return transform_pts_3d(pts, transform)


# Reference alias (geometryutils.py:361) — "KF" for KinectFusion-style usage.
transform_pts_nd_KF = transform_pts_nd


def normalize_pixel_coords(pixel_coords, height: int, width: int) -> jnp.ndarray:
    r"""Map pixel coordinates (x=col, y=row order) from ``[0, W-1] x [0, H-1]``
    to ``[-1, 1]`` (reference geometryutils.py:481-529)."""
    pixel_coords = jnp.asarray(pixel_coords)
    if pixel_coords.shape[-1] != 2:
        raise ValueError(
            f"pixel_coords must have shape (*, 2). Got {pixel_coords.shape}."
        )
    wh = jnp.asarray([width - 1, height - 1], dtype=pixel_coords.dtype)
    return 2.0 * pixel_coords / wh - 1.0


def unnormalize_pixel_coords(pixel_coords_norm, height: int, width: int) -> jnp.ndarray:
    r"""Inverse of :func:`normalize_pixel_coords`
    (reference geometryutils.py:531-574)."""
    pixel_coords_norm = jnp.asarray(pixel_coords_norm)
    if pixel_coords_norm.shape[-1] != 2:
        raise ValueError(
            f"pixel_coords_norm must have shape (*, 2). Got {pixel_coords_norm.shape}."
        )
    wh = jnp.asarray([width - 1, height - 1], dtype=pixel_coords_norm.dtype)
    return (pixel_coords_norm + 1.0) * wh / 2.0


def cam2pixel(cam_coords_src, dst_proj_src, eps: float = 1e-6) -> jnp.ndarray:
    r"""Transform camera-frame coordinates to pixel coordinates ``(u, v)``
    with the z != 0 divide guard (reference geometryutils.py:611-653)."""
    cam_coords_src = jnp.asarray(cam_coords_src)
    if cam_coords_src.shape[-1] != 3:
        raise ValueError(
            f"cam_coords_src must have shape (*, 3). Got {cam_coords_src.shape}."
        )
    pts = transform_pts_3d(cam_coords_src, dst_proj_src)
    z = pts[..., 2]
    zg = jnp.where(z == 0, jnp.ones_like(z), z)
    return jnp.stack([pts[..., 0] / zg, pts[..., 1] / zg], axis=-1)


def pixel2cam(depth, intrinsics_inv, pixel_coords) -> jnp.ndarray:
    r"""Unproject a grid of homogeneous pixel coordinates with per-pixel depth
    into the camera frame (reference geometryutils.py:655-735)."""
    depth = jnp.asarray(depth)
    pixel_coords = jnp.asarray(pixel_coords)
    cam = transform_pts_3d(pixel_coords, intrinsics_inv)
    return cam * depth[..., None]


def normalize_quaternion(quaternion, eps: float = 1e-12) -> jnp.ndarray:
    r"""Normalize a quaternion ``(*, 4)`` to unit norm."""
    quaternion = jnp.asarray(quaternion)
    if quaternion.shape[-1] != 4:
        raise ValueError(f"quaternion must have shape (*, 4). Got {quaternion.shape}.")
    norm = jnp.linalg.norm(quaternion, axis=-1, keepdims=True)
    return quaternion / jnp.maximum(norm, eps)


def quaternion_to_rotation_matrix(quaternion) -> jnp.ndarray:
    r"""Convert quaternion(s) ``(*, 4)`` in (x, y, z, w) order to rotation
    matrices ``(*, 3, 3)``.

    Matches the reference convention (geometryutils.py:148-204).
    """
    q = normalize_quaternion(jnp.asarray(quaternion))
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    row0 = jnp.stack([1.0 - (tyy + tzz), txy - twz, txz + twy], axis=-1)
    row1 = jnp.stack([txy + twz, 1.0 - (txx + tzz), tyz - twx], axis=-1)
    row2 = jnp.stack([txz - twy, tyz + twx, 1.0 - (txx + tyy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quaternion_to_axisangle(quaternion, eps: float = 1e-12) -> jnp.ndarray:
    r"""Convert quaternion(s) ``(*, 4)`` in (x, y, z, w) order to axis-angle
    vectors ``(*, 3)`` (reference geometryutils.py:100-146)."""
    q = normalize_quaternion(jnp.asarray(quaternion), eps)
    xyz = q[..., :3]
    w = q[..., 3]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    # numerically safe atan2-based angle
    half_angle = jnp.arctan2(sin_half, w)
    safe_sin = jnp.where(sin_half < eps, jnp.ones_like(sin_half), sin_half)
    scale = jnp.where(sin_half < eps, 2.0, 2.0 * half_angle / safe_sin)
    return xyz * scale[..., None]


def inverse_transfom_3d(trans) -> jnp.ndarray:
    r"""Invert homogeneous ``(*, 4, 4)`` transform(s)
    (reference geometryutils.py:205-242 — the reference's misspelled name is
    kept for drop-in parity; :func:`inverse_transformation` is the
    correctly-named equivalent)."""
    return inverse_transformation(trans)


def compose_transforms_3d(trans1, trans2) -> jnp.ndarray:
    r"""Compose two homogeneous transforms: ``trans1 @ trans2`` on the
    rotation/translation blocks (reference geometryutils.py:244-302)."""
    trans1, trans2 = jnp.asarray(trans1), jnp.asarray(trans2)
    if trans1.shape != trans2.shape:
        raise ValueError(
            "Both input transformations must have the same shape. "
            f"Got {trans1.shape} and {trans2.shape}."
        )
    return compose_transformations(trans1, trans2)


def relative_transform_3d(trans_01, trans_02) -> jnp.ndarray:
    r"""Relative transform ``trans_12 = trans_01^{-1} @ trans_02``
    (reference geometryutils.py:413-436 wrapper over compose/inverse)."""
    return compose_transforms_3d(inverse_transfom_3d(trans_01), jnp.asarray(trans_02))


def cam2pixel_KF(cam_coords_src, P, eps: float = 1e-6) -> jnp.ndarray:
    r"""Project camera coordinates ``(*, 3)`` through a ``(4, 4)`` projection
    matrix with the z != 0 divide guard, KinectFusion-style grid variant
    (reference geometryutils.py:703-734). Identical math to :func:`cam2pixel`
    but routed through the batched ``transform_pts_nd`` path when ``P`` is
    batched."""
    cam_coords_src = jnp.asarray(cam_coords_src)
    if cam_coords_src.shape[-1] != 3:
        raise ValueError(
            f"cam_coords_src must have shape (*, 3). Got {cam_coords_src.shape}."
        )
    P = jnp.asarray(P)
    if P.ndim < 2 or P.shape[-2:] != (4, 4):
        raise ValueError(f"P must have shape (*, 4, 4). Got {P.shape}.")
    pts = transform_pts_3d(cam_coords_src, P) if P.ndim == 2 else transform_pts_nd(
        cam_coords_src, P
    )
    z = pts[..., 2]
    zg = jnp.where(z != 0, z, jnp.ones_like(z))
    return jnp.stack([pts[..., 0] / zg, pts[..., 1] / zg], axis=-1)
