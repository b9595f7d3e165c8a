from .map_sharded import (
    MapShardedPointFusion,
    ShardedMap,
    nn_points_map_sharded,
)
from .sharding import (
    DataParallelSLAM,
    batch_sharding,
    make_mesh,
    shard_frames,
    shard_pointclouds,
)

__all__ = [
    "DataParallelSLAM",
    "MapShardedPointFusion",
    "ShardedMap",
    "nn_points_map_sharded",
    "make_mesh",
    "batch_sharding",
    "shard_frames",
    "shard_pointclouds",
]
