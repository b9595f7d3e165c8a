"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/shard_map) are exercised without TPU hardware. Must run before any
jax import (hence the env mutation at module import time)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Some environments register a TPU PJRT plugin that overrides JAX_PLATFORMS;
# the config API wins over the plugin, so force CPU explicitly as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "msrd_b2s3")


@pytest.fixture(scope="session")
def msrd():
    """Golden fixture from the reference test-suite (tests/data/msrd_b2s3):
    colors/depths/intrinsics/poses plus precomputed vertex/normal/global maps,
    shapes (2, 3, 120, 160, *)."""
    names = [
        "colors",
        "depths",
        "intrinsics",
        "poses",
        "vertex_map",
        "normal_map",
        "global_vertex_map",
        "global_normal_map",
    ]
    return {n: np.load(os.path.join(DATA_DIR, f"{n}.npy")) for n in names}


@pytest.fixture(scope="session")
def synthetic_clip():
    """Factory for small synthetic RGB-D clips (procedural static scene)."""
    import jax.numpy as jnp

    from gradslam_tpu import RGBDImages
    from gradslam_tpu.datasets import synthetic_sequence

    def make(B=1, L=4, H=16, W=24, seed=0):
        rgb, depth, intrinsics, poses = synthetic_sequence(B, L, H, W, seed=seed)
        return RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(intrinsics),
            jnp.asarray(poses),
        )

    return make
