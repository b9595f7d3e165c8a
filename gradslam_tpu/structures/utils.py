r"""Structure conversion helpers (TPU-native).

Re-design of ``/root/reference/gradslam/structures/utils.py:7``
(``pointclouds_from_rgbdimages``). The reference boolean-masks each batch
element into ragged lists (utils.py:47-51) — dynamic shapes. Here invalid
points are compacted into the front of a fixed-capacity padded buffer with a
masked scatter, keeping everything static-shaped and differentiable.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .pointclouds import Pointclouds, compact_masked
from .rgbdimages import RGBDImages

__all__ = ["pointclouds_from_rgbdimages"]


def pointclouds_from_rgbdimages(
    rgbdimages: RGBDImages,
    global_coordinates: bool = True,
    filter_missing_depths: bool = True,
    capacity: Optional[int] = None,
    sigma: Optional[float] = None,
) -> Pointclouds:
    r"""Convert sequence-length-1 RGBDImages into Pointclouds.

    Args:
        rgbdimages: batch of frames with ``L == 1``.
        global_coordinates: use the pose-transformed maps (reference default).
        filter_missing_depths: drop points with invalid depth (compacted to the
            buffer front rather than ragged-masked).
        capacity: buffer capacity; defaults to ``H * W``.
        sigma: if given, also attach per-point confidence features
            ``alpha = exp(-||v_local||^2 / (2 sigma^2))`` (used by PointFusion).
    """
    if not isinstance(rgbdimages, RGBDImages):
        raise TypeError(
            f"Expected rgbdimages to be of type RGBDImages. Got {type(rgbdimages)}."
        )
    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"Expected rgbdimages to have sequence length of 1. Got {rgbdimages.shape[1]}."
        )
    rgbdimages = rgbdimages.to_channels_last()  # reference utils.py:39
    B, _, H, W = rgbdimages.shape
    cap = capacity if capacity is not None else H * W

    if global_coordinates:
        vertex = rgbdimages.global_vertex_map
        normal = rgbdimages.global_normal_map
    else:
        vertex = rgbdimages.vertex_map
        normal = rgbdimages.normal_map

    pts = vertex.reshape(B, H * W, 3)
    nrm = normal.reshape(B, H * W, 3)
    col = rgbdimages.rgb_image.reshape(B, H * W, 3)
    if filter_missing_depths:
        mask = rgbdimages.valid_depth_mask.reshape(B, H * W)
    else:
        mask = jnp.ones((B, H * W), dtype=bool)

    points, counts = compact_masked(pts, mask, cap)
    normals, _ = compact_masked(nrm, mask, cap)
    colors, _ = compact_masked(col, mask, cap)
    features = None
    if sigma is not None:
        local = rgbdimages.vertex_map.reshape(B, H * W, 3)
        alpha = jnp.exp(-jnp.sum(local**2, -1, keepdims=True) / (2.0 * sigma**2))
        alpha = jnp.clip(alpha, 1e-7, 1.01)
        features, _ = compact_masked(alpha, mask, cap)
    if rgbdimages.feature_image is not None:
        # Per-pixel user features (semantic one-hots, descriptors, ...) ride
        # into per-point features, after the confidence channel when both
        # are requested.
        F = rgbdimages.feature_image.shape[-1]
        ufeat, _ = compact_masked(
            rgbdimages.feature_image.reshape(B, H * W, F), mask, cap
        )
        features = (
            ufeat if features is None
            else jnp.concatenate([features, ufeat], axis=-1)
        )
    return Pointclouds(
        points=points, num_points=counts, normals=normals, colors=colors,
        features=features,
        # Overflow accounting: rows lost when capacity < number of valid
        # depths (never silent — see Pointclouds.num_dropped).
        num_dropped=jnp.sum(mask, axis=-1).astype(jnp.int32) - counts,
    )
