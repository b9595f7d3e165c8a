"""Numerical gradient verification via jax.test_util.check_grads — the JAX
analogue of the reference's torch.autograd.gradcheck usage
(tests/slam/test_fusionutils.py:4,56), extended to the ops the reference left
commented out."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from gradslam_tpu.geometry import (
    inverse_intrinsics,
    project_points,
    se3_exp,
    so3_exp,
    transform_pointcloud,
    unproject_points,
)
from gradslam_tpu.slam.fusionutils import get_alpha


def rng_array(shape, seed=0, scale=1.0, offset=0.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale + offset
    )


class TestGradcheck:
    def test_se3_exp(self):
        xi = rng_array((6,), seed=0, scale=0.3)
        check_grads(se3_exp, (xi,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_so3_exp(self):
        w = rng_array((3,), seed=1, scale=0.5)
        check_grads(so3_exp, (w,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)

    def test_transform_pointcloud(self):
        pts = rng_array((20, 3), seed=2)
        T = se3_exp(rng_array((6,), seed=3, scale=0.2))
        check_grads(
            lambda p: transform_pointcloud(p, T), (pts,), order=1, modes=["rev"],
            atol=1e-2, rtol=1e-2,
        )

    def test_project_points(self):
        K = jnp.eye(4).at[0, 0].set(100.0).at[1, 1].set(100.0)
        pts = rng_array((15, 3), seed=4, scale=0.3, offset=2.0)  # z > 0
        check_grads(
            lambda p: project_points(p, K), (pts,), order=1, modes=["rev"],
            atol=1e-2, rtol=1e-2,
        )

    def test_unproject_points(self):
        Kinv = inverse_intrinsics(jnp.eye(4).at[0, 0].set(90.0).at[1, 1].set(90.0))
        px = rng_array((15, 2), seed=5, scale=20.0, offset=40.0)
        d = rng_array((15,), seed=6, scale=0.1, offset=1.5)
        check_grads(
            lambda p, dd: unproject_points(p, Kinv[:3, :3], dd), (px, d),
            order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
        )

    def test_get_alpha(self):
        pts = rng_array((10, 3), seed=7, scale=0.4)
        check_grads(
            lambda p: get_alpha(p, sigma=0.6), (pts,), order=1, modes=["rev"],
            atol=1e-2, rtol=1e-2,
        )
