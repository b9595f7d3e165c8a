r"""Point-based map fusion (Keller et al. "PointFusion") — TPU-native.

Re-design of ``/root/reference/gradslam/slam/fusionutils.py`` for static
shapes. The reference builds dynamic-length ``pc2im_bnhw (K, 4)`` lookup tables
(:198-288), filters them (:290-411), deduplicates winners with a
``torch.unique`` row sort (:414-544), and grows the map with ragged per-batch
appends (:702-720). Here every stage is a dense masked computation over the
fixed-capacity map buffer:

- *active*: per-map-point ``(valid, h, w)`` arrays ``(B, CAP)`` instead of a
  ragged row table;
- *unique winner selection*: the reference's lexicographic sort criterion
  ``[b, h, w, 1/ccount, raydist, n] -> first per pixel`` (max ccount, then min
  ray distance, then min point index — fusionutils.py:509-544) is reproduced
  exactly with three deterministic scatter-max/min passes into per-pixel
  tables;
- *fusion*: each winning map point pulls its pixel's frame data and takes a
  confidence-weighted average (fusionutils.py:660-699) via a masked ``where``
  (each map point is the winner of at most one pixel — its own projection);
- *append*: un-corresponded valid-depth pixels are scattered into the free
  region of the padded buffer (see ``Pointclouds.append_masked``).

Everything is jittable, vmap-safe and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.geometryutils import inverse_transformation
from ..geometry.projutils import project_points
from ..geometry.geometryutils import transform_pointcloud
# Reference parity: these names are importable from the reference's
# fusionutils namespace (fusionutils.py:7-8).
from ..geometry.geometryutils import create_meshgrid  # noqa: F401
from ..structures.pointclouds import Pointclouds, compact_masked
from ..structures.rgbdimages import RGBDImages
from ..structures.utils import pointclouds_from_rgbdimages  # noqa: F401

__all__ = [
    "update_map_fusion",
    "update_map_aggregate",
    "prune_map",
    "voxel_downsample",
    "pack_colors",
    "unpack_colors",
]

# Host-side numpy scalar (see ops/knn.py:_INF): a module-level jnp scalar is a
# device constant whose lowering read can stall on a remote-TPU tunnel.
_INT_SENTINEL = np.int32(2**30)


def pack_colors(colors: jnp.ndarray) -> jnp.ndarray:
    r"""Quantize float colors ``(..., 3)`` in [0, 1] to 8 bits/channel and
    pack into one float32 channel ``(..., 1)`` holding the exact integer
    ``r << 16 | g << 8 | b`` (max 2^24 - 1 — exactly representable in
    float32). Used by the opt-in quantized-color map layout
    (``PointFusion(quantize_colors=True)``): colors then ride inside the
    packed 8-wide map row, saving the separate color gather/scatter passes
    per frame. Lossy (8-bit, re-quantized after each merge: exported uchar
    colors land within one step of the exact path's) and non-differentiable
    in color."""
    q = jnp.clip(jnp.round(colors * 255.0), 0, 255).astype(jnp.int32)
    packed = (q[..., 0] << 16) | (q[..., 1] << 8) | q[..., 2]
    return packed.astype(jnp.float32)[..., None]


def unpack_colors(packed: jnp.ndarray) -> jnp.ndarray:
    r"""Inverse of :func:`pack_colors`: ``(..., 1)`` packed channel back to
    float colors ``(..., 3)`` in [0, 1] (exact on packed values)."""
    p = packed[..., 0].astype(jnp.int32)
    r = (p >> 16) & 0xFF
    g = (p >> 8) & 0xFF
    b = p & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32) / 255.0


def get_alpha(
    points: jnp.ndarray,
    sigma: Union[float, int, jnp.ndarray],
    dim: int = -1,
    keepdim: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    r"""Sample confidence ``alpha = exp(-||p||^2 / (2 sigma^2))``, clamped to
    ``[eps, 1.01]`` (reference fusionutils.py:16-74 — the 1.01 clamp is
    behavioural and kept for parity)."""
    points = jnp.asarray(points)
    if points.shape[dim] != 3:
        raise ValueError(
            f"Expected length of dim-th ({dim}th) dimension to be 3. "
            f"Got {points.shape[dim]} instead."
        )
    alpha = jnp.exp(-jnp.sum(points**2, axis=dim, keepdims=keepdim) / (2 * sigma**2))
    return jnp.clip(alpha, eps, 1.01)


def are_points_close(tensor1, tensor2, dist_th, dim: int = -1) -> jnp.ndarray:
    r"""Euclidean proximity predicate (reference fusionutils.py:76-131)."""
    tensor1, tensor2 = jnp.asarray(tensor1), jnp.asarray(tensor2)
    if tensor1.shape != tensor2.shape:
        raise ValueError(
            f"tensor1 and tensor2 should have the same shape, but had shapes "
            f"{tensor1.shape} and {tensor2.shape} respectively."
        )
    return jnp.linalg.norm(tensor1 - tensor2, axis=dim) < dist_th


def are_normals_similar(tensor1, tensor2, dot_th, dim: int = -1) -> jnp.ndarray:
    r"""Normal-similarity predicate ``n1 . n2 > dot_th``
    (reference fusionutils.py:133-196)."""
    tensor1, tensor2 = jnp.asarray(tensor1), jnp.asarray(tensor2)
    if tensor1.shape != tensor2.shape:
        raise ValueError(
            f"tensor1 and tensor2 should have the same shape, but had shapes "
            f"{tensor1.shape} and {tensor2.shape} respectively."
        )
    return jnp.sum(tensor1 * tensor2, axis=dim) > dot_th


class ActiveMapPoints(NamedTuple):
    r"""Static-shape replacement for the reference's ragged ``pc2im_bnhw``
    lookup table (fusionutils.py:198-288): per-map-point projection results.
    """

    valid: jnp.ndarray  # (B, CAP) bool — projects inside the live frame
    pix_h: jnp.ndarray  # (B, CAP) int32 — row after projection (clamped)
    pix_w: jnp.ndarray  # (B, CAP) int32 — column after projection (clamped)


def find_active_map_points(
    pointclouds: Pointclouds, rgbdimages: RGBDImages
) -> ActiveMapPoints:
    r"""Project all map points into the live frame and mark the ones landing
    inside it (front of plane, in bounds, non-padding) — reference
    fusionutils.py:198-288 with identical bounds/rounding semantics.
    """
    if not isinstance(pointclouds, Pointclouds):
        raise TypeError(
            f"Expected pointclouds to be of type Pointclouds. Got {type(pointclouds)}."
        )
    if not isinstance(rgbdimages, RGBDImages):
        raise TypeError(
            f"Expected rgbdimages to be of type RGBDImages. Got {type(rgbdimages)}."
        )
    rgbdimages = rgbdimages.to_channels_last()
    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"Expected rgbdimages to have sequence length of 1. Got {rgbdimages.shape[1]}."
        )
    if len(rgbdimages) != len(pointclouds):
        raise ValueError(
            "Expected equal batch sizes for pointclouds and rgbdimages. "
            f"Got {len(pointclouds)} and {len(rgbdimages)} respectively."
        )
    B, _, H, W = rgbdimages.shape

    tinv = inverse_transformation(rgbdimages.poses[:, 0])  # (B, 4, 4)
    cam_pts = transform_pointcloud(pointclouds.points, tinv)  # (B, CAP, 3)
    is_front_of_plane = cam_pts[..., 2] > 0
    img_pts = project_points(cam_pts, rgbdimages.intrinsics[:, 0])  # (B, CAP, 2) u,v
    u, v = img_pts[..., 0], img_pts[..., 1]
    is_in_frame = (
        (u > -1e-3)
        & (u < W - 0.999)
        & (v > -1e-3)
        & (v < H - 0.999)
        & is_front_of_plane
        & pointclouds.nonpad_mask
    )
    pix_w = jnp.clip(jnp.round(u), 0, W - 1).astype(jnp.int32)
    pix_h = jnp.clip(jnp.round(v), 0, H - 1).astype(jnp.int32)
    return ActiveMapPoints(valid=is_in_frame, pix_h=pix_h, pix_w=pix_w)


def _gather_pixels(image: jnp.ndarray, pix: jnp.ndarray) -> jnp.ndarray:
    """Gather ``image (B, H*W, C)`` at per-point pixel indices ``pix (B, CAP)``."""
    return jnp.take_along_axis(image, pix[..., None], axis=1)


def find_similar_map_points(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    active: ActiveMapPoints,
    dist_th: Union[float, int],
    dot_th: Union[float, int],
) -> jnp.ndarray:
    r"""Filter active points to those close to — and with a normal similar to —
    the live-frame point occupying their projected pixel
    (reference fusionutils.py:290-411). Returns an updated validity mask
    ``(B, CAP)``.
    """
    if pointclouds.normals is None:
        raise ValueError(
            "Pointclouds must have normals for finding similar map points, but did not."
        )
    rgbdimages = rgbdimages.to_channels_last()
    B, _, H, W = rgbdimages.shape
    pix = active.pix_h * W + active.pix_w  # (B, CAP)
    frame_points = _gather_pixels(
        rgbdimages.global_vertex_map.reshape(B, H * W, 3), pix
    )
    frame_normals = _gather_pixels(
        rgbdimages.global_normal_map.reshape(B, H * W, 3), pix
    )
    is_close = are_points_close(frame_points, pointclouds.points, dist_th)
    is_similar = are_normals_similar(frame_normals, pointclouds.normals, dot_th)
    return active.valid & is_close & is_similar


def find_best_unique_correspondences(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    active: ActiveMapPoints,
    similar_mask: Optional[jnp.ndarray] = None,
):
    r"""Among map points projecting to the same pixel, keep the one with the
    highest confidence count, then smallest (squared) ray distance, then
    smallest point index — exactly the reference's lexicographic-sort winner
    (fusionutils.py:414-544), implemented as three deterministic scatter
    passes.

    Returns ``(winner_mask (B, CAP), pixel_corresponded (B, H*W))``.
    """
    if pointclouds.features is None:
        raise ValueError(
            "Pointclouds must have features for finding best unique "
            "correspondences, but did not."
        )
    rgbdimages = rgbdimages.to_channels_last()
    B, _, H, W = rgbdimages.shape
    cap = pointclouds.capacity
    mask = active.valid if similar_mask is None else similar_mask
    pix = active.pix_h * W + active.pix_w  # (B, CAP)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, cap))

    ccounts = pointclouds.features[..., 0]  # (B, CAP)
    frame_points = _gather_pixels(
        rgbdimages.global_vertex_map.reshape(B, H * W, 3), pix
    )
    ray_dists = jnp.sum((pointclouds.points - frame_points) ** 2, axis=-1)

    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)

    # Pass 1: per-pixel max ccount.
    cc = jnp.where(mask, ccounts, neg_inf)
    max_cc = jnp.full((B, H * W), neg_inf).at[bidx, pix].max(cc)
    elig = mask & (cc == max_cc[bidx, pix])
    # Pass 2: per-pixel min ray distance among ccount winners.
    rd = jnp.where(elig, ray_dists, pos_inf)
    min_rd = jnp.full((B, H * W), pos_inf).at[bidx, pix].min(rd)
    elig = elig & (rd == min_rd[bidx, pix])
    # Pass 3: per-pixel min point index — fully deterministic tie-break.
    pidx = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[None], (B, cap))
    pi = jnp.where(elig, pidx, _INT_SENTINEL)
    min_pi = jnp.full((B, H * W), _INT_SENTINEL, dtype=jnp.int32).at[bidx, pix].min(pi)
    winner = elig & (pidx == min_pi[bidx, pix])

    pixel_corresponded = min_pi < _INT_SENTINEL  # (B, H*W)
    return winner, pixel_corresponded


def find_correspondences(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    dist_th: Union[float, int],
    dot_th: Union[float, int],
):
    r"""Full correspondence chain (reference fusionutils.py:549-578):
    active -> similar -> best unique. Returns
    ``(active, winner_mask (B, CAP), pixel_corresponded (B, H*W))``."""
    active = find_active_map_points(pointclouds, rgbdimages)
    similar = find_similar_map_points(pointclouds, rgbdimages, active, dist_th, dot_th)
    winner, pixel_corresponded = find_best_unique_correspondences(
        pointclouds, rgbdimages, active, similar
    )
    return active, winner, pixel_corresponded


def fuse_with_map(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    active: ActiveMapPoints,
    winner_mask: jnp.ndarray,
    pixel_corresponded: jnp.ndarray,
    sigma: Union[float, int, jnp.ndarray],
) -> Pointclouds:
    r"""Confidence-weighted merge of corresponded points plus append of
    un-corresponded live points (reference fusionutils.py:580-723).

    Dense reference-parity path: the map must carry float colors and a
    single ccount feature channel. Quantized-layout maps
    (``PointFusion(quantize_colors=True)``) are only supported by the fast
    path (:func:`update_map_fusion`) — here the confidence-weighted average
    would silently broadcast into the packed-color channel.
    """
    if (
        pointclouds.colors is None
        or pointclouds.normals is None
        or pointclouds.features is None
        or pointclouds.features.shape[-1] != 1
    ):
        raise ValueError(
            "fuse_with_map (dense path) requires normals, float colors and a "
            "single ccount feature channel; quantized-layout maps are "
            "supported by update_map_fusion only."
        )
    rgbdimages = rgbdimages.to_channels_last()
    B, _, H, W = rgbdimages.shape
    vertex_flat = rgbdimages.global_vertex_map.reshape(B, H * W, 3)
    normal_flat = rgbdimages.global_normal_map.reshape(B, H * W, 3)
    color_flat = rgbdimages.rgb_image.reshape(B, H * W, 3)
    alpha_image = get_alpha(rgbdimages.vertex_map, sigma=sigma, dim=4, keepdim=True)
    alpha_flat = alpha_image.reshape(B, H * W, 1)

    pix = active.pix_h * W + active.pix_w

    # --- Merge: each winning map point pulls its pixel's frame data. ---
    frame_points = _gather_pixels(vertex_flat, pix)
    frame_normals = _gather_pixels(normal_flat, pix)
    frame_colors = _gather_pixels(color_flat, pix)
    frame_alphas = _gather_pixels(alpha_flat, pix)

    cc = pointclouds.features  # (B, CAP, 1)
    wm = winner_mask[..., None]
    fa = jnp.where(wm, frame_alphas, 0.0)
    updated_cc = cc + fa
    inv_cc = 1.0 / jnp.where(updated_cc == 0, 1.0, updated_cc)
    new_points = (cc * pointclouds.points + fa * frame_points) * inv_cc
    new_normals = (cc * pointclouds.normals + fa * frame_normals) * inv_cc
    new_colors = (cc * pointclouds.colors + fa * frame_colors) * inv_cc

    merged = dataclasses.replace(
        pointclouds,
        points=jnp.where(wm, new_points, pointclouds.points),
        normals=jnp.where(wm, new_normals, pointclouds.normals),
        colors=jnp.where(wm, new_colors, pointclouds.colors),
        features=jnp.where(wm, updated_cc, cc),
    )

    # --- Append: valid-depth pixels that received no correspondence. ---
    valid_depth = rgbdimages.valid_depth_mask.reshape(B, H * W)
    new_mask = valid_depth & ~pixel_corresponded
    return merged.append_masked(
        vertex_flat,
        new_mask,
        normals=normal_flat,
        colors=color_flat,
        features=alpha_flat,
    )


def _project_map_points(points, nonpad_mask, pose, intrinsics, H: int, W: int):
    r"""Fused elementwise projection of all map points into a frame.

    Streaming math only — no gathers/scatters — so the O(capacity) pass runs
    at HBM bandwidth. Semantics identical to ``find_active_map_points``
    (camera transform, pinhole projection with the z != 0 guard, the
    reference's bounds test and round-half-to-even pixel snap).

    Returns ``(valid (B, CAP), pix (B, CAP) int32 flattened h * W + w)``.
    """
    R = pose[:, :3, :3]  # (B, 3, 3)
    t = pose[:, :3, 3]  # (B, 3)
    rx = points[..., 0] - t[:, None, 0]
    ry = points[..., 1] - t[:, None, 1]
    rz = points[..., 2] - t[:, None, 2]
    # cam = R^T (p - t), written as explicit scalar-vector FMAs: einsum here
    # makes XLA emit column-major gathers/copies around the point arrays,
    # several times more expensive than the projection itself.
    def col(j):
        c0 = R[:, 0, j][:, None]
        c1 = R[:, 1, j][:, None]
        c2 = R[:, 2, j][:, None]
        return c0 * rx + c1 * ry + c2 * rz

    x, y, z = col(0), col(1), col(2)
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    zg = jnp.where(z == 0, jnp.ones_like(z), z)
    u = fx * (x / zg) + cx
    v = fy * (y / zg) + cy
    valid = (
        (u > -1e-3)
        & (u < W - 0.999)
        & (v > -1e-3)
        & (v < H - 0.999)
        & (z > 0)
        & nonpad_mask
    )
    pix_w = jnp.clip(jnp.round(u), 0, W - 1).astype(jnp.int32)
    pix_h = jnp.clip(jnp.round(v), 0, H - 1).astype(jnp.int32)
    return valid, pix_h * W + pix_w


def update_map_fusion(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    dist_th: Union[float, int],
    dot_th: Union[float, int],
    sigma: Union[float, int, jnp.ndarray],
    active_capacity: Optional[int] = None,
    association: str = "auto",
    merge: str = "auto",
) -> Pointclouds:
    r"""One PointFusion map update from a live frame
    (reference fusionutils.py:761-789) — TPU fast path.

    TPU scatters with colliding indices serialise, so instead of the dense
    scatter-max winner selection (``find_best_unique_correspondences``), this
    path projects all map points with a streaming elementwise pass, gates
    candidates against the frame, selects per-pixel winners with one flat
    multi-key ``lax.sort`` by ``(pixel, -ccount, raydist, index)`` — exactly
    the reference's lexicographic criterion (fusionutils.py:509-544) — and
    applies one pixel-driven scatter set that both merges winner rows and
    appends un-corresponded points.

    ``association`` picks how candidates are formed:

    - ``'windowed'``: compact active points into an ``active_capacity`` window
      first (default ``2 * H * W``); overflow points are left un-merged for
      the frame. Measured ~2x faster than 'sort_full' at capacity ~3 x H*W
      (the window bounds every downstream sort/gather/scatter).
    - ``'sort_full'``: gate and sort ALL map rows directly — exact (no window
      overflow), but every stage is O(capacity).
    - ``'auto'`` (default): 'windowed' only when capacity exceeds ~3 * H*W —
      below that, sorting the whole map beats paying the compaction scatter
      (measured crossover on v5e at the 640x480 workload: sort_full wins by
      14% at capacity 2.1 * H*W, loses by 4% at 3.3 * H*W).

    ``merge`` picks how the final map write-back happens (identical results):

    - ``'scatter'``: pixel-space rows are scattered into the map buffers
      column-at-a-time (10 single-column scatters of H*W rows).
    - ``'gather'``: the map is REBUILT by gather — one scatter inverts the
      pixel->row destination table into a row->pixel table, then every map row
      gathers its new value from pixel space (two row gathers of `capacity`
      rows) and a streaming ``where`` keeps untouched rows. TPU row gathers
      are ~8x cheaper than scatters, so this wins until capacity outgrows
      ~6 * H*W rows (measured: 41.9 -> 38.8 ms/frame end-to-end on the
      640x480 1M-capacity headline workload).
    - ``'auto'`` (default): 'gather' when ``capacity <= 6 * H * W``.
    """
    rgbdimages = rgbdimages.to_channels_last()
    if rgbdimages.shape[1] != 1:
        raise ValueError(
            f"Expected rgbdimages to have sequence length of 1. "
            f"Got {rgbdimages.shape[1]}."
        )
    if rgbdimages.poses is None:
        raise ValueError("rgbdimages must have poses for map fusion.")
    if pointclouds.normals is None or pointclouds.features is None:
        raise ValueError(
            "update_map_fusion needs a map with normals and features "
            "(ccounts) — use the pipeline's empty_map() to build one."
        )
    B, _, H, W = rgbdimages.shape
    cap = pointclouds.capacity
    HW = H * W
    # Quantized-color map layout (PointFusion(quantize_colors=True)): colors
    # live packed in the features' second channel (see pack_colors) — the
    # whole map row is then exactly 8 wide and the merge needs no separate
    # color gathers/scatters.
    quantized = pointclouds.colors is None
    if quantized and pointclouds.features.shape[-1] < 2:
        raise ValueError(
            "update_map_fusion needs either float colors or the "
            "quantized layout (colors=None, features (B, CAP, 2+) = "
            "[ccount, packed_color, *user])."
        )
    # User feature channels (PointFusion(feature_channels=F)): everything in
    # the map's feature buffer past the bookkeeping channels ([ccount] or
    # [ccount, packed_color]) is fused like colors — confidence-weighted
    # running average against the frame's feature_image plane.
    base = 2 if quantized else 1
    n_user = pointclouds.features.shape[-1] - base
    if n_user > 0:
        if rgbdimages.feature_image is None:
            raise ValueError(
                f"The map carries {n_user} user feature channel(s) but the "
                "live frame has no feature_image — attach RGBDImages."
                "feature_image (B, L, H, W, F) to fuse features."
            )
        if rgbdimages.feature_image.shape[-1] != n_user:
            raise ValueError(
                f"feature_image has {rgbdimages.feature_image.shape[-1]} "
                f"channels but the map carries {n_user} user feature "
                "channel(s) — widths must match."
            )
    base_feats = pointclouds.features[..., :base]
    user_feats = pointclouds.features[..., base:]  # (B, CAP, n_user)
    if association == "auto":
        window = min(active_capacity if active_capacity is not None else 2 * HW, cap)
        association = "sort_full" if cap <= max(3 * HW, window) else "windowed"
    if association not in ("sort_full", "windowed"):
        raise ValueError(f"Unknown association mode: {association}")
    if merge == "auto":
        merge = "gather" if cap <= 6 * HW else "scatter"
    if merge not in ("scatter", "gather"):
        raise ValueError(f"Unknown merge mode: {merge}")

    # --- 1. streaming projection over the full map -----------------------
    pose = rgbdimages.poses[:, 0]
    K = rgbdimages.intrinsics[:, 0]
    valid, pix = _project_map_points(
        pointclouds.points, pointclouds.nonpad_mask, pose, K, H, W
    )

    # Packed map geometry (points | normals | ccount | pad-or-packed-color):
    # one 8-wide row gather costs the same as a single 3-wide one on TPU, so
    # packing turns three gathers into one (the concat itself streams at HBM
    # bandwidth). In the quantized layout the features channel pair is
    # [ccount, packed_color] and fills the row with no pad.
    map_geom = jnp.concatenate(
        [pointclouds.points, pointclouds.normals, base_feats]
        + ([] if quantized else [jnp.zeros_like(base_feats)]),
        axis=-1,
    )  # (B, CAP, 8) — user feature channels ride a separate plane so the
    # hot row stays within the 32-byte row-gather fast path

    vertex_flat = rgbdimages.global_vertex_map.reshape(B, HW, 3)
    normal_flat = rgbdimages.global_normal_map.reshape(B, HW, 3)
    # One packed 8-wide gather instead of two 3-wide ones (row gathers cost
    # ~the same up to 32-byte rows; two gathers cost double).
    frame_geom = jnp.concatenate(
        [vertex_flat, normal_flat, jnp.zeros((B, HW, 2), vertex_flat.dtype)],
        axis=-1,
    )

    # --- 2. form candidate arrays (width N): pixel, map row, geometry -----
    if association == "sort_full":
        # Every map row is a candidate — no compaction scatter, no window
        # overflow; the map arrays are read in place.
        N = cap
        cand_valid = valid
        cand_pix = pix
        cand_idx = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32)[None, :], (B, cap)
        )
        c_pts = pointclouds.points
        c_nrm = pointclouds.normals
        c_cc = pointclouds.features[..., 0]
    else:
        # Compact active rows into a fixed window.
        N = min(active_capacity if active_capacity is not None else 2 * HW, cap)
        dest = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
        oob = N + jnp.arange(cap, dtype=jnp.int32)[None, :]
        dest = jnp.where(valid & (dest < N), dest, oob)
        bidx_cap = jnp.broadcast_to(jnp.arange(B)[:, None], (B, cap))
        row_ids = jnp.broadcast_to(
            jnp.arange(cap, dtype=jnp.int32)[None, :], (B, cap)
        )
        cand_idx = (
            jnp.zeros((B, N), dtype=jnp.int32)
            .at[bidx_cap, dest]
            .set(row_ids, mode="drop", unique_indices=True)
        )
        num_active = jnp.minimum(jnp.sum(valid, axis=-1), N)
        cand_valid = jnp.arange(N, dtype=jnp.int32)[None, :] < num_active[:, None]
        w_geom = jnp.take_along_axis(map_geom, cand_idx[..., None], axis=1)
        c_pts = w_geom[..., :3]
        c_nrm = w_geom[..., 3:6]
        c_cc = w_geom[..., 6]
        # Recompute each active point's pixel from its gathered position
        # (pure math) instead of scattering pix through the compaction.
        _, cand_pix = _project_map_points(c_pts, cand_valid, pose, K, H, W)

    # --- 3. gating against the frame pixel each candidate hits ------------
    safe_pix = jnp.minimum(cand_pix, HW - 1)
    fgeom = jnp.take_along_axis(frame_geom, safe_pix[..., None], axis=1)
    fp, fn = fgeom[..., :3], fgeom[..., 3:6]
    is_close = jnp.linalg.norm(fp - c_pts, axis=-1) < dist_th
    is_similar = jnp.sum(fn * c_nrm, axis=-1) > dot_th
    eligible = cand_valid & is_close & is_similar

    # --- 4. per-pixel winner via one lexicographic sort -------------------
    ray_dists = jnp.sum((c_pts - fp) ** 2, axis=-1)
    k_pix = jnp.where(eligible, cand_pix, HW)  # ineligible rows sort last
    k_negcc = jnp.where(eligible, -c_cc, jnp.inf)
    k_ray = jnp.where(eligible, ray_dists, jnp.inf)
    k_idx = jnp.where(eligible, cand_idx, cap)
    # Sort FLAT: a (B, N) sort along dim 1 is ~10x slower on TPU than a 1-D
    # sort of the flattened array. Fold the batch into the pixel key
    # (b * (HW + 1) + pix); each batch contributes exactly N rows, so the
    # sorted array factors back into per-batch slices.
    boff = jnp.arange(B, dtype=jnp.int32)[:, None] * (HW + 1)
    sf_pix, sf_negcc, sf_ray, sf_idx = jax.lax.sort(
        (
            (k_pix + boff).reshape(-1),
            k_negcc.reshape(-1),
            k_ray.reshape(-1),
            k_idx.reshape(-1),
        ),
        dimension=0,
        num_keys=4,
        is_stable=False,
    )
    s_pix = sf_pix.reshape(B, N) - boff
    s_idx = sf_idx.reshape(B, N)
    first = jnp.concatenate(
        [
            jnp.ones((B, 1), dtype=bool),
            s_pix[:, 1:] != s_pix[:, :-1],
        ],
        axis=1,
    )
    s_winner = first & (s_pix < HW)

    # --- 5. pixel-driven combined merge + append --------------------------
    # One scatter pass updates winner rows AND writes new points: TPU
    # scatters are ~8x the cost of gathers, so the merge pulls map data to
    # pixel space (gathers) and a single per-pixel scatter set writes back.
    bidx_cand = jnp.broadcast_to(jnp.arange(B)[:, None], (B, N))
    bidx_pix = jnp.broadcast_to(jnp.arange(B)[:, None], (B, HW))

    # per-pixel winner map row (cap = "no winner"), via one unique scatter
    table_pix = jnp.where(
        s_winner, s_pix, HW + jnp.arange(N, dtype=jnp.int32)[None, :]
    )
    winner_row = (
        jnp.full((B, HW), cap, dtype=jnp.int32)
        .at[bidx_cand, table_pix]
        .set(s_idx, mode="drop", unique_indices=True)
    )
    corresponded = winner_row < cap
    safe_row = jnp.minimum(winner_row, cap - 1)

    color_flat = rgbdimages.rgb_image.reshape(B, HW, 3)
    ufeat_flat = (
        rgbdimages.feature_image.reshape(B, HW, n_user) if n_user > 0 else None
    )
    alpha_image = get_alpha(rgbdimages.vertex_map, sigma=sigma, dim=4, keepdim=True)
    alpha_flat = alpha_image.reshape(B, HW, 1)

    m_geom = jnp.take_along_axis(map_geom, safe_row[..., None], axis=1)
    m_pts = m_geom[..., :3]
    m_nrm = m_geom[..., 3:6]
    m_cc = m_geom[..., 6:7]
    if quantized:
        # Colors rode along in the packed row — no extra gather.
        m_col = unpack_colors(m_geom[..., 7:8])
    else:
        m_col = jnp.take_along_axis(pointclouds.colors, safe_row[..., None], axis=1)

    corr = corresponded[..., None]
    cc_old = jnp.where(corr, m_cc, 0.0)  # new points start from zero mass
    new_cc = cc_old + alpha_flat
    inv_cc = 1.0 / jnp.where(new_cc == 0, 1.0, new_cc)
    out_pts = (cc_old * m_pts + alpha_flat * vertex_flat) * inv_cc
    out_nrm = (cc_old * m_nrm + alpha_flat * normal_flat) * inv_cc
    out_col = (cc_old * m_col + alpha_flat * color_flat) * inv_cc
    out_uf = None
    if n_user > 0:
        # User features fuse exactly like colors (one extra gather; the
        # 8-wide hot row is untouched).
        m_uf = jnp.take_along_axis(user_feats, safe_row[..., None], axis=1)
        out_uf = (cc_old * m_uf + alpha_flat * ufeat_flat) * inv_cc

    # destination row per pixel: winner row for merges, fresh tail slot for
    # appends, unique OOB parking otherwise (keeps the fast scatter path)
    valid_depth = rgbdimages.valid_depth_mask.reshape(B, HW)
    new_mask = valid_depth & ~corresponded
    tail = (
        pointclouds.num_points[:, None]
        + jnp.cumsum(new_mask.astype(jnp.int32), axis=-1)
        - 1
    )
    oob = cap + jnp.arange(HW, dtype=jnp.int32)[None, :]
    dest = jnp.where(
        corresponded, winner_row, jnp.where(new_mask & (tail < cap), tail, oob)
    )

    appended = jnp.sum((new_mask & (tail < cap)).astype(jnp.int32), axis=-1)
    num_points = pointclouds.num_points + appended
    # Overflow accounting (see Pointclouds.num_dropped): un-corresponded valid
    # pixels that found no free slot are dropped — count them, don't hide it.
    num_dropped = pointclouds.num_dropped
    if num_dropped is not None:
        num_dropped = num_dropped + (
            jnp.sum(new_mask.astype(jnp.int32), axis=-1) - appended
        )

    # Unified pixel-space payload for both write-back modes: in the quantized
    # layout colors ride packed in the features channel pair (no separate
    # color plane, 8 scatters / one 8-wide gather instead of 10 / two).
    if quantized:
        feat_pix = jnp.concatenate([new_cc, pack_colors(out_col)], axis=-1)
    else:
        feat_pix = new_cc
    fd = feat_pix.shape[-1]

    if merge == "gather":
        # Rebuild-by-gather: invert the pixel->row map with ONE single-column
        # scatter (destinations unique: a map row wins at most its own
        # projected pixel; tail slots are distinct by construction), then let
        # every map row GATHER its new value — row gathers are ~8x cheaper
        # than row scatters on TPU.
        row_src = (
            jnp.full((B, cap), HW, dtype=jnp.int32)
            .at[bidx_pix, dest]
            .set(jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None], (B, HW)),
                 mode="drop", unique_indices=True)
        )
        touched = row_src < HW
        safe_src = jnp.where(touched, row_src, 0)
        t = touched[..., None]
        # One packed 8-wide gather (pts | nrm | features, zero-padded to 8);
        # the exact path adds one 3-wide color gather (row gathers cost the
        # same up to 32-byte rows).
        pix_geom = jnp.concatenate(
            [out_pts, out_nrm, feat_pix] +
            ([jnp.zeros((B, HW, 2 - fd), out_pts.dtype)] if fd < 2 else []),
            axis=-1,
        )  # (B, HW, 8)
        g = jnp.take_along_axis(pix_geom, safe_src[..., None], axis=1)
        new_points = jnp.where(t, g[..., :3], pointclouds.points)
        new_normals = jnp.where(t, g[..., 3:6], pointclouds.normals)
        new_features = jnp.where(t, g[..., 6:6 + fd], base_feats)
        if n_user > 0:
            guf = jnp.take_along_axis(out_uf, safe_src[..., None], axis=1)
            new_features = jnp.concatenate(
                [new_features, jnp.where(t, guf, user_feats)], axis=-1
            )
        new_colors = None
        if not quantized:
            gc = jnp.take_along_axis(out_col, safe_src[..., None], axis=1)
            new_colors = jnp.where(t, gc, pointclouds.colors)
    else:
        def scatter_map(buf, vals):
            # Column-at-a-time: single-column TPU scatters are ~8x cheaper
            # than multi-column row scatters.
            vals = vals.astype(buf.dtype)
            for c in range(buf.shape[-1]):
                buf = buf.at[bidx_pix, dest, c].set(
                    vals[..., c], mode="drop", unique_indices=True
                )
            return buf

        new_points = scatter_map(pointclouds.points, out_pts)
        new_normals = scatter_map(pointclouds.normals, out_nrm)
        new_features = scatter_map(
            pointclouds.features,
            feat_pix if n_user == 0
            else jnp.concatenate([feat_pix, out_uf], axis=-1),
        )
        new_colors = (
            None if quantized else scatter_map(pointclouds.colors, out_col)
        )

    kw = dict(
        points=new_points,
        normals=new_normals,
        features=new_features,
        num_points=num_points,
        num_dropped=num_dropped,
    )
    if not quantized:
        kw["colors"] = new_colors
    return dataclasses.replace(pointclouds, **kw)


def update_map_aggregate(
    pointclouds: Pointclouds,
    rgbdimages: RGBDImages,
    sigma: Optional[Union[float, int]] = None,
) -> Pointclouds:
    r"""Naive aggregation: append all valid live-frame points to the map
    (reference fusionutils.py:725-758)."""
    if not isinstance(pointclouds, Pointclouds):
        raise TypeError(
            f"Expected pointclouds to be of type Pointclouds. Got {type(pointclouds)}."
        )
    if not isinstance(rgbdimages, RGBDImages):
        raise TypeError(
            f"Expected rgbdimages to be of type RGBDImages. Got {type(rgbdimages)}."
        )
    rgbdimages = rgbdimages.to_channels_last()
    B, _, H, W = rgbdimages.shape
    vertex_flat = rgbdimages.global_vertex_map.reshape(B, H * W, 3)
    normal_flat = rgbdimages.global_normal_map.reshape(B, H * W, 3)
    color_flat = rgbdimages.rgb_image.reshape(B, H * W, 3)
    valid = rgbdimages.valid_depth_mask.reshape(B, H * W)
    features = None
    if pointclouds.features is not None:
        sig = 0.6 if sigma is None else sigma
        alpha = get_alpha(rgbdimages.vertex_map, sigma=sig, dim=4, keepdim=True)
        features = alpha.reshape(B, H * W, 1)
        n_user = pointclouds.features.shape[-1] - 1
        if n_user > 0:
            # User feature channels after the confidence channel (the
            # aggregate-map analogue of PointFusion(feature_channels=F)).
            if (
                rgbdimages.feature_image is None
                or rgbdimages.feature_image.shape[-1] != n_user
            ):
                got = (
                    "no feature_image" if rgbdimages.feature_image is None
                    else f"{rgbdimages.feature_image.shape[-1]} channel(s)"
                )
                raise ValueError(
                    f"The map carries {n_user} user feature channel(s) but "
                    f"the live frame has {got} — attach a matching "
                    "RGBDImages.feature_image (B, L, H, W, F)."
                )
            features = jnp.concatenate(
                [features, rgbdimages.feature_image.reshape(B, H * W, n_user)],
                axis=-1,
            )
    return pointclouds.append_masked(
        vertex_flat,
        valid,
        normals=normal_flat if pointclouds.normals is not None else None,
        colors=color_flat if pointclouds.colors is not None else None,
        features=features,
    )


def prune_map(
    pointclouds: Pointclouds,
    min_confidence: Union[float, int],
) -> Pointclouds:
    r"""Remove low-confidence (unstable) map points.

    Keller et al.'s point-based fusion removes points whose confidence counter
    stays below a stability threshold; the reference never implemented this
    stage. With the fixed-capacity padded buffer it is one masked compaction:
    survivors are packed to the front and the live counter shrinks, freeing
    capacity for new points. Jit/scan-safe and differentiable.
    """
    if pointclouds.features is None:
        raise ValueError("Pointclouds must have features (ccounts) to prune.")
    keep = pointclouds.nonpad_mask & (
        pointclouds.features[..., 0] >= min_confidence
    )
    cap = pointclouds.capacity
    points, counts = compact_masked(pointclouds.points, keep, cap)
    normals = None
    colors = None
    features = None
    if pointclouds.normals is not None:
        normals, _ = compact_masked(pointclouds.normals, keep, cap)
    if pointclouds.colors is not None:
        colors, _ = compact_masked(pointclouds.colors, keep, cap)
    features, _ = compact_masked(pointclouds.features, keep, cap)
    return Pointclouds(
        points=points, num_points=counts, normals=normals, colors=colors,
        features=features, num_dropped=pointclouds.num_dropped,
    )


def voxel_downsample(
    pointclouds: Pointclouds,
    voxel_size: Union[float, int],
    *,
    reduce: str = "mean",
    quantized_colors: Optional[bool] = None,
) -> Pointclouds:
    r"""Voxel-grid decimation of a padded pointcloud batch (the open3d
    ``voxel_down_sample`` operation, absent from the reference — map
    maintenance companion to :func:`prune_map`).

    One point survives per occupied ``voxel_size``-cube. Static-shape
    recipe (same machinery as the fusion winner selection): quantize
    coordinates to integer voxel ids, flat 4-key ``lax.sort`` by
    ``(vx, vy, vz, index)``, run-start detection marks one winner per
    voxel, masked compaction packs survivors to the front. Jit/vmap-safe
    and differentiable with respect to point values.

    Args:
        voxel_size: cube edge length (must be > 0).
        reduce: ``'mean'`` (default — each surviving point is the centroid
            of its voxel's points; attributes are averaged too, normals
            re-normalized) or ``'first'`` (keep the lowest-index point per
            voxel unchanged — like the fusion tie-break).
        quantized_colors: whether the map uses the quantized layout
            (``PointFusion(quantize_colors=True)``: ``colors=None``,
            features ``[ccount, packed_color]``) — with ``reduce='mean'``
            the packed channel is then unpacked, averaged and re-packed
            (arithmetic-averaging ``r<<16|g<<8|b`` integers would garble
            every multi-point voxel's color). Default ``None``
            auto-detects the layout the same way :func:`update_map_fusion`
            does (``colors is None`` and a 2-channel feature buffer);
            pass an explicit bool to override.

    Returns:
        A new ``Pointclouds`` with the same capacity, survivors packed to
        the front, and ``num_points`` shrunk per batch. ``num_dropped``
        carries over (decimation is intentional, not overflow).
    """
    if not voxel_size > 0:
        raise ValueError(f"voxel_size must be > 0. Got {voxel_size}.")
    if reduce not in ("mean", "first"):
        raise ValueError(f"Unknown reduce mode: {reduce!r}.")
    if quantized_colors is None:
        # Auto-detection: a colorless 2-feature cloud is unambiguously the
        # quantized [ccount, packed_color] layout (the only one this library
        # produces), and silently mean-averaging its packed integers would
        # garble every multi-point voxel's color. A colorless cloud with
        # MORE feature channels is ambiguous — it could be quantized+user
        # (PointFusion(quantize_colors=True, feature_channels=F)) or a
        # generic descriptor cloud whose channel 1 must NOT be unpacked —
        # so refuse to guess.
        quantized_colors = (
            pointclouds.colors is None
            and pointclouds.features is not None
            and pointclouds.features.shape[-1] == 2
        )
        if (
            pointclouds.colors is None
            and pointclouds.features is not None
            and pointclouds.features.shape[-1] > 2
        ):
            raise ValueError(
                "voxel_downsample cannot tell whether this colorless "
                f"{pointclouds.features.shape[-1]}-channel feature layout "
                "is quantized ([ccount, packed_color, *user]) or generic — "
                "pass quantized_colors=True/False explicitly."
            )
    elif quantized_colors and (
        pointclouds.colors is not None
        or pointclouds.features is None
        or pointclouds.features.shape[-1] < 2
    ):
        raise ValueError(
            "quantized_colors=True expects the quantized map layout "
            "(colors=None, features (B, CAP, 2+) = [ccount, packed_color, "
            "*user])."
        )
    pts = pointclouds.points  # (B, CAP, 3)
    B, CAP, _ = pts.shape
    valid = pointclouds.nonpad_mask  # (B, CAP)

    # Integer voxel ids, offset to be non-negative per batch so invalid rows
    # can take an int sentinel strictly above every real id.
    vid = jnp.floor(pts / voxel_size).astype(jnp.int32)  # (B, CAP, 3)
    vid = vid - jnp.min(jnp.where(valid[..., None], vid, _INT_SENTINEL),
                        axis=1, keepdims=True)
    vx = jnp.where(valid, vid[..., 0], _INT_SENTINEL)
    vy = jnp.where(valid, vid[..., 1], _INT_SENTINEL)
    vz = jnp.where(valid, vid[..., 2], _INT_SENTINEL)
    idx = jnp.broadcast_to(jnp.arange(CAP, dtype=jnp.int32)[None], (B, CAP))

    # Batched 4-key sort by (vx, vy, vz, index) ascending, each batch row
    # independently. (The per-frame fusion path flattens batch into the key
    # to dodge TPU's batched-sort penalty; a maintenance utility prefers the
    # simple form — folding batch in would need an offset > sentinel, which
    # overflows int32 for B >= 2.)
    s_vx, s_vy, s_vz, s_idx = jax.lax.sort(
        (vx, vy, vz, idx), dimension=1, num_keys=4, is_stable=False,
    )
    s_valid = s_vx < _INT_SENTINEL

    first = jnp.concatenate(
        [jnp.ones((B, 1), bool),
         (s_vx[:, 1:] != s_vx[:, :-1])
         | (s_vy[:, 1:] != s_vy[:, :-1])
         | (s_vz[:, 1:] != s_vz[:, :-1])],
        axis=1,
    ) & s_valid

    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, CAP))

    def gather_rows(buf):  # (B, CAP, C) -> sorted order
        return buf[bidx, s_idx]

    if reduce == "mean":
        # segment id per sorted row -> scatter-add values and counts, then
        # each run-start row reads its voxel's mean.
        seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1  # (B, CAP)
        seg = jnp.where(s_valid, seg, CAP - 1)  # park invalid rows
        ones = s_valid.astype(pts.dtype)
        cnt = jnp.zeros((B, CAP), pts.dtype).at[bidx, seg].add(ones)
        cnt_safe = jnp.where(cnt == 0, 1.0, cnt)

        def voxel_mean(buf):
            v = gather_rows(buf) * ones[..., None]
            acc = jnp.zeros((B, CAP, buf.shape[-1]), buf.dtype)
            acc = acc.at[bidx, seg].add(v)
            return acc / cnt_safe[..., None]

        def reduced(buf):
            return None if buf is None else jnp.take_along_axis(
                voxel_mean(buf), seg[..., None], axis=1)

        new_pts = reduced(pts)
        new_nrm = reduced(pointclouds.normals)
        if new_nrm is not None:
            n2 = jnp.sum(new_nrm * new_nrm, axis=-1, keepdims=True)
            pos = n2 > 0
            new_nrm = jnp.where(
                pos, new_nrm / jnp.sqrt(jnp.where(pos, n2, 1.0)), new_nrm)
        new_col = reduced(pointclouds.colors)
        if quantized_colors:
            # Unpack -> average -> re-pack: the packed r<<16|g<<8|b integers
            # are not linear in color, so averaging them directly garbles
            # every multi-point voxel.
            cc_mean = reduced(pointclouds.features[..., 0:1])
            col_mean = reduced(unpack_colors(pointclouds.features[..., 1:2]))
            parts = [cc_mean, pack_colors(col_mean)]
            if pointclouds.features.shape[-1] > 2:
                # user feature channels past the packed color average plainly
                parts.append(reduced(pointclouds.features[..., 2:]))
            new_feat = jnp.concatenate(parts, axis=-1)
        else:
            new_feat = reduced(pointclouds.features)
    else:  # 'first': keep the lowest-index point of each voxel unchanged
        def reduced(buf):
            return None if buf is None else gather_rows(buf)

        new_pts = reduced(pts)
        new_nrm = reduced(pointclouds.normals)
        new_col = reduced(pointclouds.colors)
        new_feat = reduced(pointclouds.features)

    points, counts = compact_masked(new_pts, first, CAP)
    normals = colors = features = None
    if new_nrm is not None:
        normals, _ = compact_masked(new_nrm, first, CAP)
    if new_col is not None:
        colors, _ = compact_masked(new_col, first, CAP)
    if new_feat is not None:
        features, _ = compact_masked(new_feat, first, CAP)
    return Pointclouds(
        points=points, num_points=counts, normals=normals, colors=colors,
        features=features, num_dropped=pointclouds.num_dropped,
    )
