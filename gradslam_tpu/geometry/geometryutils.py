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

__all__ = [
    "create_meshgrid",
    "compose_transformations",
    "inverse_transformation",
    "relative_transformation",
    "transform_pointcloud",
    "transform_normals",
    "normalize_quaternion",
    "quaternion_to_rotation_matrix",
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
