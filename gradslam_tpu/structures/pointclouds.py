r"""Batched pointclouds as fixed-capacity padded buffers (TPU-native).

Re-design of the reference ``Pointclouds``
(``/root/reference/gradslam/structures/pointclouds.py:13``). The reference keeps
a list of ragged ``(N_b, 3)`` tensors and grows the global map with unbounded
``append_points`` (:1117) — dynamic shapes that are incompatible with XLA's
trace-once compilation model. Here the *padded* representation the reference
only half-has (``points_padded`` + ``nonpad_mask``, :791-809) is promoted to
primary and given a fixed capacity:

- ``points``   ``(B, CAP, 3)`` — padded point buffer,
- ``num_points`` ``(B,)`` int32 — live-point counters,
- optional ``normals``/``colors`` ``(B, CAP, 3)`` and ``features`` ``(B, CAP, C)``.

"Appending" becomes a masked scatter into the free region (see
:func:`append_masked`), so the whole SLAM loop stays static-shaped, jittable,
vmappable, and differentiable (gradients flow through the scatter).

Everything is a frozen dataclass pytree: operations return new objects; the
reference's in-place ``*_`` methods map to the pure methods here.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import projutils
from ..geometry.geometryutils import transform_normals, transform_pointcloud
from ..utils.precision import einsum_hp

__all__ = ["Pointclouds"]


def _array_device(arr):
    """Device of a jax array (torch-style `.device` parity helper)."""
    dev = getattr(arr, "device", None)
    if dev is not None and not callable(dev):
        return dev
    devices = getattr(arr, "devices", None)
    if callable(devices):
        return next(iter(devices()))
    return None


def _compact_masked(values: jnp.ndarray, mask: jnp.ndarray, capacity: int):
    """Compact masked rows of ``values (B, M, C)`` to the front of a
    ``(B, capacity, C)`` buffer. Returns ``(buffer, counts)``.

    Rows beyond capacity are dropped (XLA scatter ``mode='drop'``).
    """
    B, M = mask.shape
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # (B, M)
    # Park invalid rows AND capacity-overflowing valid rows at out-of-bounds
    # slots that stay UNIQUE (capacity + i): unique_indices=True lets XLA use
    # the fast scatter path on TPU instead of the serialising
    # conflict-resolution path — an overflowing rank >= capacity could
    # otherwise collide with another row's capacity + i parking slot.
    oob = capacity + jnp.arange(M, dtype=jnp.int32)[None, :]
    dest = jnp.where(mask & (rank < capacity), rank, oob)
    out = jnp.zeros((B, capacity) + values.shape[2:], dtype=values.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
    out = out.at[bidx, dest].set(values, mode="drop", unique_indices=True)
    counts = jnp.minimum(jnp.sum(mask, axis=-1).astype(jnp.int32), capacity)
    return out, counts


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Pointclouds:
    r"""A batch of ``B`` pointclouds stored in fixed-capacity padded buffers.

    Mirrors the public surface of the reference ``Pointclouds`` while being a
    frozen JAX pytree (safe to pass through ``jit``/``scan``/``vmap``/``grad``).
    """

    points: jnp.ndarray  # (B, CAP, 3)
    num_points: jnp.ndarray  # (B,) int32
    normals: Optional[jnp.ndarray] = None  # (B, CAP, 3)
    colors: Optional[jnp.ndarray] = None  # (B, CAP, 3)
    features: Optional[jnp.ndarray] = None  # (B, CAP, C)
    # Overflow accounting: rows append_masked had to drop because the buffer
    # was full. None = not tracked (e.g. ad-hoc constructions); Pointclouds
    # built via `empty()` — every SLAM map — track it, so a too-small
    # map_capacity is detectable instead of silently truncating the map.
    num_dropped: Optional[jnp.ndarray] = None  # (B,) int32

    def __post_init__(self):
        # Migration ergonomics: accept torch tensors (converted to numpy on
        # the host); numpy/jax inputs pass through untouched.
        from .structutils import coerce_torch

        for name in ("points", "num_points", "normals", "colors", "features",
                     "num_dropped"):
            val = getattr(self, name)
            coerced = coerce_torch(val)
            if coerced is not val:
                object.__setattr__(self, name, coerced)
        pts = self.points
        if hasattr(pts, "ndim") and not isinstance(pts, jax.core.Tracer):
            if pts.ndim != 3 or pts.shape[-1] != 3:
                raise ValueError(
                    f"points must have shape (B, CAP, 3). Got {pts.shape}."
                )
            for name in ("normals", "colors", "features"):
                attr = getattr(self, name)
                if attr is not None and attr.shape[:2] != pts.shape[:2]:
                    raise ValueError(
                        f"{name} must have shape (B, CAP, *). Got {attr.shape} "
                        f"for points of shape {pts.shape}."
                    )

    # ------------------------------------------------------------------ #
    # Constructors
    # ------------------------------------------------------------------ #
    @classmethod
    def empty(
        cls,
        batch_size: int,
        capacity: int,
        has_normals: bool = True,
        has_colors: bool = True,
        feature_dim: Optional[int] = 1,
        dtype=jnp.float32,
    ) -> "Pointclouds":
        """An empty map buffer — the scan carry's initial value."""
        zeros3 = jnp.zeros((batch_size, capacity, 3), dtype=dtype)
        return cls(
            points=zeros3,
            num_points=jnp.zeros((batch_size,), dtype=jnp.int32),
            normals=zeros3 if has_normals else None,
            colors=zeros3 if has_colors else None,
            features=(
                jnp.zeros((batch_size, capacity, feature_dim), dtype=dtype)
                if feature_dim
                else None
            ),
            num_dropped=jnp.zeros((batch_size,), dtype=jnp.int32),
        )

    @classmethod
    def from_list(
        cls,
        points: Sequence,
        normals: Optional[Sequence] = None,
        colors: Optional[Sequence] = None,
        features: Optional[Sequence] = None,
        capacity: Optional[int] = None,
        allow_truncation: bool = False,
    ) -> "Pointclouds":
        """Build from a list of ragged ``(N_b, 3)`` arrays (host-side helper,
        parity with the reference list constructor pointclouds.py:110).

        Clouds longer than an explicit ``capacity`` raise (the reference's
        loud-validation culture; a silently truncated cloud looks valid) —
        pass ``allow_truncation=True`` to keep the first ``capacity`` points
        instead.
        """
        if len(points) == 0:
            raise ValueError("points list must be non-empty.")
        counts = [int(np.asarray(p).shape[0]) for p in points]
        cap = capacity if capacity is not None else max(max(counts), 1)
        if max(counts) > cap and not allow_truncation:
            raise ValueError(
                f"cloud with {max(counts)} points exceeds capacity {cap}; "
                "raise capacity or pass allow_truncation=True to keep only "
                "the first `capacity` points."
            )

        def pad(seq, dim):
            if seq is None:
                return None
            out = np.zeros((len(seq), cap, dim), dtype=np.float32)
            for b, arr in enumerate(seq):
                arr = np.asarray(arr, dtype=np.float32)
                n = min(arr.shape[0], cap)
                if n:
                    out[b, :n] = arr[:n]
            return jnp.asarray(out)

        fdim = int(np.asarray(features[0]).shape[-1]) if features is not None else None
        return cls(
            points=pad(points, 3),
            num_points=jnp.asarray(np.minimum(counts, cap), dtype=jnp.int32),
            normals=pad(normals, 3),
            colors=pad(colors, 3),
            features=pad(features, fdim) if features is not None else None,
        )

    # ------------------------------------------------------------------ #
    # Basic properties
    # ------------------------------------------------------------------ #
    def __len__(self) -> int:
        return self.points.shape[0]

    @property
    def capacity(self) -> int:
        """Padded buffer capacity CAP (max points per batch element)."""
        return self.points.shape[1]

    @property
    def device(self):
        """Device holding the buffers (torch-style parity attribute)."""
        return _array_device(self.points)

    @property
    def equisized(self) -> bool:
        """True when every batch element has the same number of points
        (reference pointclouds.py ctor attribute). Host-side only — reads
        the live counters, so not usable under jit."""
        counts = np.asarray(self.num_points)
        return bool((counts == counts[0]).all()) if counts.size else True

    @property
    def nonpad_mask(self) -> jnp.ndarray:
        """(B, CAP) bool — True for live (non-padding) points."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)[None, :]
        return idx < self.num_points[:, None]

    @property
    def points_padded(self) -> jnp.ndarray:
        """(B, CAP, 3) padded point buffer (reference pointclouds.py:736)."""
        return self.points

    @property
    def normals_padded(self) -> Optional[jnp.ndarray]:
        """(B, CAP, 3) padded normals, or None (reference pointclouds.py:755)."""
        return self.normals

    @property
    def colors_padded(self) -> Optional[jnp.ndarray]:
        """(B, CAP, 3) padded colors, or None (reference pointclouds.py:773)."""
        return self.colors

    @property
    def features_padded(self) -> Optional[jnp.ndarray]:
        """(B, CAP, C) padded features, or None (reference pointclouds.py:791)."""
        return self.features

    @property
    def num_features(self) -> int:
        """Number of feature channels, 0 when there are none
        (reference pointclouds.py:669-681)."""
        return 0 if self.features is None else self.features.shape[-1]

    @property
    def num_points_per_pointcloud(self) -> jnp.ndarray:
        """(B,) live point counts (reference pointclouds.py:812-822)."""
        return self.num_points

    @property
    def has_points(self) -> bool:
        """Host-side check (do not use inside jit — query num_points instead)."""
        return bool(jax.device_get(jnp.any(self.num_points > 0)))

    @property
    def has_normals(self) -> bool:
        """True when a normals buffer exists (reference pointclouds.py:630)."""
        return self.normals is not None

    @property
    def has_colors(self) -> bool:
        """True when a colors buffer exists (reference pointclouds.py:642)."""
        return self.colors is not None

    @property
    def has_features(self) -> bool:
        """True when a features buffer exists (reference pointclouds.py:654)."""
        return self.features is not None

    @property
    def points_list(self) -> List[np.ndarray]:
        """Host-side ragged view (parity with the reference list repr)."""
        pts = np.asarray(jax.device_get(self.points))
        counts = np.asarray(jax.device_get(self.num_points))
        return [pts[b, : counts[b]] for b in range(len(self))]

    @property
    def normals_list(self) -> Optional[List[np.ndarray]]:
        """Host-side ragged view of normals, or None
        (reference pointclouds.py:700)."""
        if self.normals is None:
            return None
        arr = np.asarray(jax.device_get(self.normals))
        counts = np.asarray(jax.device_get(self.num_points))
        return [arr[b, : counts[b]] for b in range(len(self))]

    @property
    def colors_list(self) -> Optional[List[np.ndarray]]:
        """Host-side ragged view of colors, or None
        (reference pointclouds.py:712)."""
        if self.colors is None:
            return None
        arr = np.asarray(jax.device_get(self.colors))
        counts = np.asarray(jax.device_get(self.num_points))
        return [arr[b, : counts[b]] for b in range(len(self))]

    @property
    def features_list(self) -> Optional[List[np.ndarray]]:
        """Host-side ragged view of features, or None
        (reference pointclouds.py:724)."""
        if self.features is None:
            return None
        arr = np.asarray(jax.device_get(self.features))
        counts = np.asarray(jax.device_get(self.num_points))
        return [arr[b, : counts[b]] for b in range(len(self))]

    def __getitem__(self, index) -> "Pointclouds":
        """Batch indexing; returns a Pointclouds with the selected batch rows."""
        if isinstance(index, int):
            B = self.points.shape[0]
            if not -B <= index < B:
                # slicing past the end would silently return an EMPTY batch,
                # hiding the caller's bug far downstream (review r2); list
                # indexing in the reference raises here too.
                raise IndexError(
                    f"Batch index {index} out of range for {B} pointclouds."
                )
            # keep the batch dim; -1 must select the LAST row, not an empty
            # slice (slice(-1, 0) is empty)
            index = slice(index, index + 1 if index != -1 else None)

        def sel(x):
            return None if x is None else x[index]

        return Pointclouds(
            points=self.points[index],
            num_points=self.num_points[index],
            normals=sel(self.normals),
            colors=sel(self.colors),
            features=sel(self.features),
            num_dropped=sel(self.num_dropped),
        )

    # ------------------------------------------------------------------ #
    # Geometric ops (pure; reference `*_` in-place ops map here)
    # ------------------------------------------------------------------ #
    def _map_points(self, fn, also_normals=None) -> "Pointclouds":
        return dataclasses.replace(
            self,
            points=fn(self.points),
            normals=(
                also_normals(self.normals)
                if (also_normals is not None and self.normals is not None)
                else self.normals
            ),
        )

    def offset(self, offsets) -> "Pointclouds":
        """Translate live points by ``offsets`` (broadcastable); padding stays
        zero (reference offset_ pointclouds.py:390)."""
        offsets = jnp.asarray(offsets)
        mask = self.nonpad_mask[..., None].astype(self.points.dtype)
        return dataclasses.replace(self, points=self.points + offsets * mask)

    def scale(self, scales) -> "Pointclouds":
        """Scale points by ``scales`` (broadcastable; reference scale_
        pointclouds.py:428)."""
        scales = jnp.asarray(scales)
        return dataclasses.replace(self, points=self.points * scales)

    def rotate(self, rmat, *, pre_multiplication: bool = True) -> "Pointclouds":
        """Rotate by ``(3, 3)`` or ``(B, 3, 3)`` rotation matrices
        (reference pointclouds.py:466). ``pre_multiplication=False``
        post-multiplies (``points @ rmat``), matching the reference's
        ``@`` operator semantics."""
        rmat = jnp.asarray(rmat)
        if rmat.shape[-2:] != (3, 3):
            raise ValueError(f"rmat must have shape (*, 3, 3). Got {rmat.shape}.")
        if pre_multiplication:
            if rmat.ndim == 2:
                rot = lambda x: einsum_hp("ij,bnj->bni", rmat, x)
            else:
                rot = lambda x: einsum_hp("bij,bnj->bni", rmat, x)
        else:
            if rmat.ndim == 2:
                rot = lambda x: einsum_hp("bnj,jk->bnk", x, rmat)
            else:
                rot = lambda x: einsum_hp("bnj,bjk->bnk", x, rmat)
        return self._map_points(rot, also_normals=rot)

    def transform(self, transform, *, pre_multiplication: bool = True) -> "Pointclouds":
        """Apply SE(3) transform(s) ``(4, 4)`` or ``(B, 4, 4)``
        (reference pointclouds.py:526). ``pre_multiplication=False``
        post-multiplies the rotation (reference transform_ semantics:
        rotate then offset by the translation)."""
        transform = jnp.asarray(transform)
        if transform.shape[-2:] != (4, 4):
            raise ValueError(
                f"transform must have shape (*, 4, 4). Got {transform.shape}."
            )
        if not pre_multiplication:
            tvec = transform[..., :3, 3]
            if tvec.ndim == 2:
                tvec = tvec[:, None]
            return self.rotate(
                transform[..., :3, :3], pre_multiplication=False
            ).offset(tvec)
        # Zero padded rows after the transform: the translation would move
        # dead rows to tvec, breaking the padding-stays-zero invariant the
        # other ops (offset, post-multiplication path) preserve.
        mask = self.nonpad_mask[..., None]
        return dataclasses.replace(
            self,
            points=jnp.where(mask, transform_pointcloud(self.points, transform), 0.0),
            normals=(
                transform_normals(self.normals, transform)
                if self.normals is not None
                else None
            ),
        )

    def pinhole_projection(self, intrinsics) -> "Pointclouds":
        """Project points onto the z=1 plane: each point becomes ``(u, v, 1)``,
        zeroed on padding (reference pointclouds.py:575-613)."""
        intrinsics = jnp.asarray(intrinsics)
        if intrinsics.shape[-2:] != (4, 4):
            raise ValueError(
                f"intrinsics must have shape (*, 4, 4). Got {intrinsics.shape}."
            )
        projected_2d = projutils.project_points(self.points, intrinsics)
        projected = projutils.homogenize_points(projected_2d)
        projected = projected * self.nonpad_mask[..., None].astype(projected.dtype)
        return dataclasses.replace(self, points=projected)

    def __add__(self, other):
        return self.offset(other)

    def __sub__(self, other):
        return self.offset(-jnp.asarray(other))

    def __mul__(self, other):
        return self.scale(other)

    def __truediv__(self, other):
        return self.scale(1.0 / jnp.asarray(other))

    def __matmul__(self, other):
        r"""Post-multiplication SE(3)/SO(3) application to points and normals
        (reference pointclouds.py:353-389): ``pc @ R`` with ``(3, 3)`` /
        ``(B, 3, 3)`` rotations or ``pc @ T`` with ``(4, 4)`` / ``(B, 4, 4)``
        transformations."""
        other = jnp.asarray(other)
        if not (
            (other.ndim == 2 or other.ndim == 3)
            and (other.shape[-2:] == (3, 3) or other.shape[-2:] == (4, 4))
        ):
            raise ValueError(
                f"Unsupported shape for Pointclouds @ operand: {other.shape}\n"
                "Use tensor of shape (3, 3) or (B, 3, 3) for rotations, or "
                "(4, 4) or (B, 4, 4) for transformations"
            )
        if other.shape[-2:] == (3, 3):
            return self.rotate(other, pre_multiplication=False)
        return self.transform(other, pre_multiplication=False)

    # ------------------------------------------------------------------ #
    # Tensor-semantics conveniences (reference clone/detach/to,
    # pointclouds.py:997-1115 — JAX arrays are immutable, so clone is a
    # structural copy and detach stops gradients)
    # ------------------------------------------------------------------ #
    def clone(self) -> "Pointclouds":
        """Deep copy of every buffer (reference pointclouds.py:997)."""
        return jax.tree_util.tree_map(jnp.array, self)

    def detach(self) -> "Pointclouds":
        """Stop gradients through every buffer (reference pointclouds.py:1031)."""
        return jax.tree_util.tree_map(jax.lax.stop_gradient, self)

    def to(self, device) -> "Pointclouds":
        """Move all buffers to ``device`` (reference pointclouds.py:1043)."""
        return jax.device_put(self, device)

    def with_capacity(self, capacity: int) -> "Pointclouds":
        """Return a copy whose padded buffers are grown to ``capacity``
        (amortized map growth: every fusion stage is O(capacity), so SLAM
        pipelines scan early frames with small buffers and re-pad between
        segments — see ``ICPSLAM(map_capacity=[(frames, cap), ...])``).
        Zero-pads on the capacity axis; contents and live counts unchanged.
        """
        if capacity == self.capacity:
            return self
        if capacity < self.capacity:
            raise ValueError(
                f"with_capacity can only grow the buffer: requested {capacity} "
                f"< current capacity {self.capacity} (shrinking could drop "
                "live points; use prune_map/compaction instead)."
            )
        pad = ((0, 0), (0, capacity - self.capacity), (0, 0))

        def grow(x):
            return None if x is None else jnp.pad(x, pad)

        return dataclasses.replace(
            self,
            points=grow(self.points),
            normals=grow(self.normals),
            colors=grow(self.colors),
            features=grow(self.features),
        )

    def cpu(self) -> "Pointclouds":
        """Move to host (reference pointclouds.py:1066-1081)."""
        return self.to(jax.devices("cpu")[0])

    def cuda(self) -> "Pointclouds":
        """Move to the default accelerator — on this framework a TPU (or
        whatever ``jax.devices()[0]`` is); name kept for drop-in parity with
        the reference (pointclouds.py:1083-1098)."""
        return self.to(jax.devices()[0])

    # Reference in-place variants (pointclouds.py:390-613). JAX arrays are
    # immutable, so these cannot mutate; they return the new Pointclouds
    # (the reference returns ``self`` after mutation, so chained call sites
    # ``pc = pc.offset_(x)`` work identically).
    def offset_(self, offsets) -> "Pointclouds":
        """Reference in-place alias of :meth:`offset` (returns new object)."""
        return self.offset(offsets)

    def scale_(self, scales) -> "Pointclouds":
        """Reference in-place alias of :meth:`scale` (returns new object)."""
        return self.scale(scales)

    def rotate_(self, rmat) -> "Pointclouds":
        """Reference in-place alias of :meth:`rotate` (returns new object)."""
        return self.rotate(rmat)

    def transform_(self, transform) -> "Pointclouds":
        """Reference in-place alias of :meth:`transform` (returns new object)."""
        return self.transform(transform)

    def pinhole_projection_(self, intrinsics) -> "Pointclouds":
        """Reference in-place alias of :meth:`pinhole_projection`
        (returns new object)."""
        return self.pinhole_projection(intrinsics)

    # ------------------------------------------------------------------ #
    # Map growth (the reference's append_points, pointclouds.py:1117)
    # ------------------------------------------------------------------ #
    def append_masked(
        self,
        points: jnp.ndarray,
        mask: jnp.ndarray,
        normals: Optional[jnp.ndarray] = None,
        colors: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
    ) -> "Pointclouds":
        """Append masked rows of ``points (B, M, 3)`` into the free region of
        the buffer. Static-shape equivalent of ragged ``append_points``:
        destination slots are ``num_points + cumsum(mask) - 1``; rows that
        would exceed capacity are dropped — and *counted* in ``num_dropped``
        when the buffer tracks it (see the field docs), so overflow is never
        silent. Differentiable.
        """
        B, M = mask.shape
        cap = self.capacity
        dest = self.num_points[:, None] + jnp.cumsum(mask.astype(jnp.int32), -1) - 1
        # Unique out-of-bounds parking slots for dropped rows — keeps the
        # scatter on XLA's fast unique-indices path (see compact_masked).
        oob = cap + jnp.arange(M, dtype=jnp.int32)[None, :]
        dest = jnp.where(mask & (dest < cap), dest, oob)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))

        def scat(buf, new):
            if buf is None or new is None:
                return buf
            new = new.astype(buf.dtype)
            # Column-at-a-time scatters: a TPU row scatter with C >= 2 columns
            # costs ~8x a single-column scatter (strided per-row writes), so
            # C single-column scatters are much faster than one C-column one.
            for c in range(buf.shape[-1]):
                buf = buf.at[bidx, dest, c].set(
                    new[..., c], mode="drop", unique_indices=True
                )
            return buf

        appended = jnp.sum((dest < cap).astype(jnp.int32), axis=-1)
        requested = jnp.sum(mask.astype(jnp.int32), axis=-1)
        return Pointclouds(
            points=scat(self.points, points),
            num_points=self.num_points + appended,
            normals=scat(self.normals, normals),
            colors=scat(self.colors, colors),
            features=scat(self.features, features),
            num_dropped=(
                None
                if self.num_dropped is None
                else self.num_dropped + (requested - appended)
            ),
        )

    def append_points(self, other: "Pointclouds") -> "Pointclouds":
        """Append another Pointclouds' live points (API parity with the
        reference pointclouds.py:1117)."""
        return self.append_masked(
            other.points,
            other.nonpad_mask,
            normals=other.normals,
            colors=other.colors,
            features=other.features,
        )

    # ------------------------------------------------------------------ #
    # Export / viz (host-side, optional deps)
    # ------------------------------------------------------------------ #
    def save_ply(self, path: str, index: int = 0, binary: bool = True,
                 color_range: str = None) -> None:
        r"""Write batch element ``index`` to a PLY file (points + normals +
        colors when present) with no visualization dependency — see
        :mod:`gradslam_tpu.structures.io` (``color_range`` documented
        there). The reference can only persist maps through open3d
        (pointclouds.py:1239)."""
        from .io import save_ply as _save_ply

        _save_ply(
            path,
            self.points_list[index],
            normals=None if self.normals is None else self.normals_list[index],
            colors=None if self.colors is None else self.colors_list[index],
            binary=binary,
            color_range=color_range,
        )

    def open3d(self, index: int):
        """Export batch element ``index`` as an ``open3d.geometry.PointCloud``
        (parity with reference pointclouds.py:1239). Requires open3d."""
        import open3d as o3d  # optional dep; never imported at package root

        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(
            np.asarray(self.points_list[index], dtype=np.float64)
        )
        if self.normals is not None:
            pcd.normals = o3d.utility.Vector3dVector(
                np.asarray(self.normals_list[index], dtype=np.float64)
            )
        if self.colors is not None:
            colors = np.asarray(self.colors_list[index], dtype=np.float64)
            if colors.size and colors.max() > 1.001:
                colors = colors / 255.0
            pcd.colors = o3d.utility.Vector3dVector(colors)
        return pcd

    def plotly(
        self,
        index: int,
        include_colors: bool = True,
        max_num_points: Optional[int] = 200000,
        as_figure: bool = True,
        point_size: int = 2,
    ):
        r"""Export batch element ``index`` as a plotly ``Scatter3d`` (or a
        ``Figure`` wrapping it) — parity with the reference viewer
        (pointclouds.py:1296-1395): random subsampling above
        ``max_num_points``, 255-range color heuristic, hidden-axis layout.
        Requires plotly."""
        if not isinstance(index, int):
            raise TypeError(f"Index should be int, but was {type(index)}.")
        import plotly.graph_objects as go  # optional dep

        pts = self.points_list[index]
        num_points = pts.shape[0]
        subsample = max_num_points is not None and max_num_points < num_points
        if subsample:
            point_inds = np.random.permutation(num_points)[:max_num_points]
            pts = pts[point_inds]

        marker = {"size": point_size}
        if self.colors is not None and include_colors:
            colors = self.colors_list[index]
            if subsample:
                colors = colors[point_inds]
            if colors.size and colors.max() < 1.1:
                colors = colors * 255.0
            colors = np.clip(colors, 0.0, 255.0).astype(np.uint8)
            # plotly's marker.color validator takes color strings (an (N, 3)
            # numeric array is rejected) — same format the RGBDImages
            # vertex-scatter viewer uses.
            marker["color"] = [
                f"rgb({r},{g},{b})" for r, g, b in colors
            ]

        scatter = go.Scatter3d(
            x=pts[:, 0], y=pts[:, 1], z=pts[:, 2], mode="markers", marker=marker
        )
        if not as_figure:
            return scatter
        hidden = dict(
            showticklabels=False, showgrid=False, zeroline=False, visible=False
        )
        fig = go.Figure(data=[scatter])
        fig.update_layout(
            showlegend=False,
            scene=dict(xaxis=hidden, yaxis=hidden, zaxis=hidden),
        )
        return fig


# Re-export the compaction helper for structure/fusion internals.
compact_masked = _compact_masked
