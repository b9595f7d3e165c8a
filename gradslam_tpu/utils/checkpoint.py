r"""Checkpoint / resume for SLAM state.

The reference has no state serialization (SURVEY §5: checkpoint/resume
ABSENT); its de-facto resumable state is the ``(pointclouds, poses)`` pair
threaded through ``step()``. Here that state is an explicit pytree, so
checkpointing is a first-class operation: a dependency-free atomic ``.npz``
writer (the state is a plain pytree — hand it to ``orbax.checkpoint`` for
multi-host/async checkpointing).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path: str, pointclouds, poses: Optional[jnp.ndarray] = None):
    r"""Serialize SLAM state (map buffers + trajectory) to ``path`` as a
    compressed ``.npz``. (The state is a plain pytree — users who want orbax
    or multi-host checkpointing can hand it to ``orbax.checkpoint`` directly.)
    """
    arrays = {
        "points": np.asarray(pointclouds.points),
        "num_points": np.asarray(pointclouds.num_points),
    }
    for name in ("normals", "colors", "features", "num_dropped"):
        val = getattr(pointclouds, name)
        if val is not None:
            arrays[name] = np.asarray(val)
    if poses is not None:
        arrays["poses"] = np.asarray(poses)
    dest = path if path.endswith(".npz") else path + ".npz"
    # Atomic replace: periodic checkpointing overwrites the same file, and a
    # crash mid-savez would otherwise truncate the ONLY resumable state.
    tmp = dest + ".tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_state(path: str):
    r"""Load SLAM state saved by :func:`save_state` (npz format). Returns
    ``(Pointclouds, poses-or-None)``."""
    # Imported here (not at module top) to avoid a cycle: geometry modules
    # import utils.precision, which triggers this package's __init__.
    from ..structures.pointclouds import Pointclouds
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        pc = Pointclouds(
            points=jnp.asarray(data["points"]),
            num_points=jnp.asarray(data["num_points"]),
            normals=jnp.asarray(data["normals"]) if "normals" in data else None,
            colors=jnp.asarray(data["colors"]) if "colors" in data else None,
            features=jnp.asarray(data["features"]) if "features" in data else None,
            num_dropped=(
                jnp.asarray(data["num_dropped"]) if "num_dropped" in data else None
            ),
        )
        poses = jnp.asarray(data["poses"]) if "poses" in data else None
    return pc, poses
