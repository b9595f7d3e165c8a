r"""Multi-chip scaling for batched SLAM (new capability — the reference is
single-process/single-device, SURVEY §2.3).

Batched differentiable SLAM is embarrassingly data-parallel: each sequence in
the batch builds its own map. We shard the batch axis of every array (frames,
map buffers, poses) across a 1-D ``jax.sharding.Mesh`` and let ``jit`` + XLA
SPMD partition the whole scanned SLAM program — no hand-written collectives
are needed on the forward path; gradient reductions (when a scalar loss spans
the batch) become XLA ``psum`` over ICI automatically.

The map-point (capacity) axis can additionally be sharded for maps too large
for one chip's HBM — see ``map_sharded_spec`` (the association/fusion ops are
pointwise over the capacity axis; only the append's prefix-sum and the KNN
argmin cross shards, which XLA lowers to collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..structures.pointclouds import Pointclouds
from ..structures.rgbdimages import RGBDImages

__all__ = [
    "make_mesh",
    "shard_frames",
    "shard_pointclouds",
    "batch_sharding",
    "DataParallelSLAM",
]


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    r"""A 1-D device mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else list(devices)
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    r"""Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def _shard_leading(tree, mesh: Mesh, axis_name: str):
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def shard_frames(frames: RGBDImages, mesh: Mesh, axis_name: str = "data") -> RGBDImages:
    r"""Place a batch of frames with the batch axis sharded across the mesh.
    Batch size must be divisible by the mesh size."""
    B = len(frames)
    n = mesh.devices.size
    if B % n != 0:
        raise ValueError(
            f"Batch size ({B}) must be divisible by the mesh size ({n})."
        )
    return _shard_leading(frames, mesh, axis_name)


def shard_pointclouds(
    pointclouds: Pointclouds, mesh: Mesh, axis_name: str = "data"
) -> Pointclouds:
    r"""Place a map buffer with the batch axis sharded across the mesh."""
    return _shard_leading(pointclouds, mesh, axis_name)


def map_sharded_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    r"""Sharding for the map-point (capacity) axis — for maps too large for a
    single chip's HBM: ``points (B, CAP, 3)`` split along CAP."""
    return NamedSharding(mesh, P(None, axis_name))


class DataParallelSLAM:
    r"""Wrap an ``ICPSLAM``/``PointFusion`` pipeline for batch-sharded
    execution on a device mesh.

    Example::

        mesh = make_mesh()
        slam = DataParallelSLAM(PointFusion(odom="gt"), mesh)
        pointclouds, poses = slam(frames)   # batch sharded over all chips
    """

    def __init__(self, slam, mesh: Optional[Mesh] = None, axis_name: str = "data"):
        self.slam = slam
        self.mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
        self.axis_name = axis_name

    def __call__(self, frames: RGBDImages) -> Tuple[Pointclouds, jnp.ndarray]:
        frames = shard_frames(frames, self.mesh, self.axis_name)
        return self.slam(frames)

    def step(self, pointclouds, live_frame, prev_frame=None, prev_transform=None):
        """Single online SLAM step with every batch tensor sharded over
        the mesh's data axis (same contract as ``ICPSLAM.step``, including
        the optional constant-velocity ``prev_transform`` prior — batched
        over the same data axis)."""
        pointclouds = shard_pointclouds(pointclouds, self.mesh, self.axis_name)
        live_frame = shard_frames(live_frame, self.mesh, self.axis_name)
        if prev_frame is not None:
            prev_frame = shard_frames(prev_frame, self.mesh, self.axis_name)
        if prev_transform is not None:
            prev_transform = jax.device_put(
                jnp.asarray(prev_transform),
                NamedSharding(self.mesh, P(self.axis_name)),
            )
        return self.slam.step(pointclouds, live_frame, prev_frame, prev_transform)
