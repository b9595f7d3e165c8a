from .sharding import (
    DataParallelSLAM,
    batch_sharding,
    make_mesh,
    shard_frames,
    shard_pointclouds,
)

__all__ = [
    "DataParallelSLAM",
    "make_mesh",
    "batch_sharding",
    "shard_frames",
    "shard_pointclouds",
]
