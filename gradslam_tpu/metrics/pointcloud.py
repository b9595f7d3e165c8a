r"""Pointcloud metrics (fills the reference's empty metrics stub).

Chamfer distance between padded pointclouds, using the TPU KNN kernel — the
map-quality measure for BASELINE.md parity checks.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.knn import nn_points

__all__ = ["chamfer_distance"]


def chamfer_distance(
    points_a,
    points_b,
    mask_a: Optional[jnp.ndarray] = None,
    mask_b: Optional[jnp.ndarray] = None,
    squared: bool = False,
) -> jnp.ndarray:
    r"""Symmetric chamfer distance between two (optionally masked/padded)
    pointclouds ``(N, 3)`` / ``(M, 3)`` or batched ``(B, N, 3)`` / ``(B, M, 3)``.

    Returns ``mean_a min_b d(a, b) + mean_b min_a d(a, b)`` (euclidean unless
    ``squared=True``), with masked points excluded from both directions.
    """
    points_a = jnp.asarray(points_a)
    points_b = jnp.asarray(points_b)
    d_ab, _ = nn_points(points_a, points_b, mask_b)
    d_ba, _ = nn_points(points_b, points_a, mask_a)
    if not squared:
        d_ab = jnp.sqrt(jnp.maximum(d_ab, 0.0))
        d_ba = jnp.sqrt(jnp.maximum(d_ba, 0.0))

    def masked_mean(d, mask):
        if mask is None:
            return jnp.mean(d, axis=-1)
        m = mask.astype(d.dtype)
        return jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)

    return masked_mean(d_ab, mask_a) + masked_mean(d_ba, mask_b)
