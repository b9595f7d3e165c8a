"""estimate_normals: open3d-style KNN plane-fit normals for padded
pointclouds (no reference equivalent — reference maps only get normals from
RGBD normal maps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.structures import Pointclouds, estimate_normals


def _plane_cloud(n=200, cap=256, seed=0, a=0.3, b=0.2):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2)
    z = a * xy[:, 0] + b * xy[:, 1] + 1.0
    pts = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
    buf = np.zeros((1, cap, 3), np.float32)
    buf[0, :n] = pts
    pc = Pointclouds(points=jnp.asarray(buf), num_points=jnp.asarray([n]))
    true = np.array([-a, -b, 1.0])
    return pc, true / np.linalg.norm(true), pts


class TestEstimateNormals:
    def test_plane_recovered_and_oriented(self):
        pc, true, pts = _plane_cloud()
        out = estimate_normals(pc, k=12)
        n = np.asarray(out.normals[0, :200])
        np.testing.assert_allclose(np.abs(n @ true), 1.0, atol=1e-4)
        # unit length
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
        # oriented toward the default viewpoint (origin, below the plane)
        assert np.all(np.einsum("ij,ij->i", n, -pts) > 0)
        # padded rows zeroed
        assert float(np.abs(np.asarray(out.normals[0, 200:])).sum()) == 0.0

    def test_custom_viewpoint_flips(self):
        pc, true, pts = _plane_cloud()
        above = jnp.asarray([[0.5, 0.5, 10.0]], jnp.float32)
        n_up = np.asarray(estimate_normals(pc, k=12, viewpoints=above)
                          .normals[0, :200])
        n_dn = np.asarray(estimate_normals(pc, k=12).normals[0, :200])
        np.testing.assert_allclose(n_up, -n_dn, atol=1e-6)

    def test_sphere_radial(self):
        rng = np.random.RandomState(1)
        v = rng.randn(300, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        buf = np.zeros((1, 384, 3), np.float32)
        buf[0, :300] = v
        pc = Pointclouds(points=jnp.asarray(buf), num_points=jnp.asarray([300]))
        out = estimate_normals(pc, k=8)  # center viewpoint: inward normals
        n = np.asarray(out.normals[0, :300])
        dots = np.einsum("ij,ij->i", n, -v)  # inward radial
        assert (dots > 0.9).mean() > 0.95  # local fit wobbles a little

    def test_jit_and_batch(self):
        pc, _, _ = _plane_cloud()
        two = Pointclouds(
            points=jnp.concatenate([pc.points, pc.points]),
            num_points=jnp.asarray([200, 150]),
        )
        out = jax.jit(lambda p: estimate_normals(p, k=6))(two)
        assert out.normals.shape == (2, 256, 3)
        assert float(np.abs(np.asarray(out.normals[1, 150:])).sum()) == 0.0

    def test_validation(self):
        pc, _, _ = _plane_cloud()
        with pytest.raises(TypeError):
            estimate_normals("nope")
        with pytest.raises(ValueError, match="k must be"):
            estimate_normals(pc, k=1)
        with pytest.raises(ValueError, match="viewpoints"):
            estimate_normals(pc, viewpoints=jnp.zeros((3,)))
        tiny = Pointclouds(points=jnp.zeros((1, 4, 3)),
                           num_points=jnp.asarray([4]))
        with pytest.raises(ValueError, match="capacity"):
            estimate_normals(tiny, k=8)

    def test_usable_as_icp_target(self):
        # The motivating workflow: a normal-less cloud becomes a
        # point-to-plane ICP target after estimate_normals.
        from gradslam_tpu.odometry.icputils import point_to_plane_ICP

        pc, _, pts = _plane_cloud(n=200, cap=256)
        out = estimate_normals(pc, k=12)
        T, _ = point_to_plane_ICP(
            jnp.asarray(pts[:150]), out.points[0], out.normals[0],
            numiters=3, tgt_mask=out.nonpad_mask[0],
        )
        assert np.all(np.isfinite(np.asarray(T)))
