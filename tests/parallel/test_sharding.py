"""Multi-chip tests on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.parallel import DataParallelSLAM, make_mesh, shard_frames


def synthetic_frames(B, L=2, H=16, W=24, seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = 1.5 + 0.3 * np.sin(xs / 13.0) + 0.2 * np.cos(ys / 9.0)
    depths = np.stack(
        [[base + 0.02 * rng.rand(H, W) for _ in range(L)] for _ in range(B)]
    )[..., None].astype(np.float32)
    rgb = rng.rand(B, L, H, W, 3).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.8 * W
    K[0, 2], K[1, 2] = (W - 1) / 2, (H - 1) / 2
    intrinsics = np.tile(K, (B, 1, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))
    return RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
        jnp.asarray(poses),
    )


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh()


class TestDataParallel:
    def test_sharded_forward_matches_single_device(self, mesh):
        frames = synthetic_frames(8)
        slam = PointFusion(odom="gt")
        pc_single, poses_single = slam(frames)

        dp = DataParallelSLAM(PointFusion(odom="gt"), mesh)
        pc_dp, poses_dp = dp(frames)
        np.testing.assert_array_equal(
            np.asarray(pc_dp.num_points), np.asarray(pc_single.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(pc_dp.points), np.asarray(pc_single.points), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(poses_dp), np.asarray(poses_single), atol=1e-6
        )

    def test_feature_plane_shards_with_the_batch(self, mesh):
        """RGBDImages.feature_image is a pytree leaf, so data-parallel
        sharding must carry it — fused user features equal single-device."""
        import dataclasses

        frames = synthetic_frames(8)
        B, L, H, W = frames.shape
        lab = np.zeros((B, L, H, W, 2), np.float32)
        lab[..., : W // 2, 0] = 1.0
        lab[..., W // 2 :, 1] = 1.0
        frames = dataclasses.replace(frames, feature_image=jnp.asarray(lab))

        single = PointFusion(odom="gt", feature_channels=2)
        pc_s, _ = single(frames)
        dp = DataParallelSLAM(PointFusion(odom="gt", feature_channels=2), mesh)
        pc_dp, _ = dp(frames)
        np.testing.assert_allclose(
            np.asarray(pc_dp.features), np.asarray(pc_s.features), atol=1e-6
        )

    def test_output_is_sharded(self, mesh):
        frames = synthetic_frames(8)
        dp = DataParallelSLAM(PointFusion(odom="gt"), mesh)
        pc, _ = dp(frames)
        # result retains a batch-sharded layout (not fully replicated)
        shard_devices = {s.device.id for s in pc.points.addressable_shards}
        assert len(shard_devices) == 8

    def test_indivisible_batch_raises(self, mesh):
        frames = synthetic_frames(3)
        with pytest.raises(ValueError):
            shard_frames(frames, mesh)

    def test_sharded_grad_step(self, mesh):
        """Batched differentiable SLAM: grads to depth + intrinsics on a
        sharded mesh (BASELINE.md config #5 — no reference equivalent)."""
        frames = synthetic_frames(8)
        slam = PointFusion(odom="gt", use_jit=False)
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))

        def loss_fn(depth, intrinsics):
            fr = RGBDImages(frames.rgb_image, depth, intrinsics, frames.poses)
            pc, poses = slam.forward(fr)
            return jnp.sum(pc.points**2)

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        g_depth, g_intr = step(
            jax.device_put(frames.depth_image, shard),
            jax.device_put(frames.intrinsics, shard),
        )
        assert np.all(np.isfinite(np.asarray(g_depth)))
        assert np.all(np.isfinite(np.asarray(g_intr)))
        assert float(jnp.abs(g_depth).max()) > 0


class TestTrackedSharded:
    def test_gradicp_pipeline_shards(self, mesh):
        """The full tracked pipeline (GradICP + fusion) must compile and run
        batch-sharded across the mesh."""
        frames = synthetic_frames(8, L=2, H=16, W=24)
        dp = DataParallelSLAM(
            PointFusion(odom="gradicp", dsratio=2, numiters=2, map_capacity=1024),
            mesh,
        )
        pc, poses = dp(frames)
        assert poses.shape == (8, 2, 4, 4)
        assert np.all(np.isfinite(np.asarray(poses)))
        assert np.all(np.isfinite(np.asarray(pc.points)))

    def test_step_with_cv_prior_shards(self, mesh):
        """step() passes the constant-velocity prev_transform through,
        sharded over the data axis (review follow-up to motion_model)."""
        from gradslam_tpu import ICPSLAM

        frames = synthetic_frames(8, L=2, H=16, W=24)
        dp = DataParallelSLAM(
            ICPSLAM(odom="icp", dsratio=2, numiters=2), mesh
        )
        pc = dp.slam.empty_map(8, 2 * 16 * 24)
        pc, pose = dp.step(pc, frames[:, 0])
        prev = frames[:, 0].with_poses(pose)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=pose.dtype), (8, 4, 4))
        pc, pose2 = dp.step(pc, frames[:, 1], prev, prev_transform=eye)
        assert pose2.shape == (8, 1, 4, 4)
        assert np.all(np.isfinite(np.asarray(pose2)))
