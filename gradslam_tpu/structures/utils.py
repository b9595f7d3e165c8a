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

from ..utils.precision import einsum_hp
from .pointclouds import Pointclouds, compact_masked
from .rgbdimages import RGBDImages

__all__ = ["pointclouds_from_rgbdimages", "estimate_normals"]


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


def estimate_normals(
    pointclouds: Pointclouds,
    k: int = 16,
    viewpoints=None,
) -> Pointclouds:
    r"""Estimate per-point normals by local plane fitting (the open3d
    ``estimate_normals`` operation; no reference equivalent — reference maps
    only ever get normals from RGBD normal maps).

    For each point, the ``k`` nearest neighbours (TPU KNN kernel) define a
    covariance whose smallest eigenvector is the normal; normals are oriented
    toward ``viewpoints`` (``(B, 3)``, default the origin — the first camera
    center for maps built by this library's pipelines, whose frame-0 pose is
    identity). Padded rows get zero normals. Jit/vmap-safe; differentiable
    w.r.t. point positions (eigh gradients are well-defined while the plane
    fit is non-degenerate).

    Typical use: a map loaded from a plain-geometry PLY needs normals before
    it can serve as a PointFusion map or a point-to-plane ICP target.

    Args:
        k: neighbourhood size (excluding the point itself; must be >= 2).
        viewpoints: optional ``(B, 3)`` orientation targets.

    Returns:
        A new ``Pointclouds`` with the ``normals`` buffer replaced.
    """
    import dataclasses

    from ..ops.knn import knn_points

    if not isinstance(pointclouds, Pointclouds):
        raise TypeError(
            f"Expected pointclouds to be of type Pointclouds. "
            f"Got {type(pointclouds)}."
        )
    if not isinstance(k, int) or k < 2:
        raise ValueError(f"k must be an int >= 2. Got {k}.")
    pts = pointclouds.points  # (B, CAP, 3)
    B, CAP, _ = pts.shape
    if k + 1 > CAP:
        raise ValueError(f"k + 1 ({k + 1}) cannot exceed capacity ({CAP}).")
    mask = pointclouds.nonpad_mask  # (B, CAP)
    num = pointclouds.num_points  # (B,)

    # K+1 nearest including the query itself (distance 0, ties to the
    # smallest index — the self row is always among them for exact
    # duplicates too, and duplicates are fine for a covariance).
    out = knn_points(pts, pts, K=k + 1, return_nn=True, tgt_mask=mask)
    nbrs = out.knn  # (B, CAP, K+1, 3)
    # Slots past the number of valid targets are zero-padded by knn_points;
    # weight them out of the fit.
    w = (
        jnp.arange(k + 1, dtype=jnp.int32)[None, None, :]
        < jnp.minimum(num, k + 1)[:, None, None]
    ).astype(pts.dtype)[..., None]  # (B, CAP, K+1, 1)
    wsum = jnp.maximum(jnp.sum(w, axis=2), 1.0)  # (B, CAP, 1)
    mean = jnp.sum(nbrs * w, axis=2) / wsum
    centered = (nbrs - mean[:, :, None, :]) * w
    cov = einsum_hp("bnki,bnkj->bnij", centered, centered)
    # smallest-eigenvalue eigenvector of the symmetric 3x3 (eigh: ascending)
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]  # (B, CAP, 3)

    if viewpoints is None:
        viewpoints = jnp.zeros((B, 3), pts.dtype)
    else:
        viewpoints = jnp.asarray(viewpoints)
        if viewpoints.shape != (B, 3):
            raise ValueError(
                f"viewpoints must have shape (B, 3) = ({B}, 3). "
                f"Got {viewpoints.shape}."
            )
    to_view = viewpoints[:, None, :] - pts
    flip = jnp.sum(normals * to_view, axis=-1, keepdims=True) < 0
    normals = jnp.where(flip, -normals, normals)
    normals = jnp.where(mask[..., None], normals, 0.0)
    return dataclasses.replace(pointclouds, normals=normals)
