"""Error-path tests mirroring the reference's pervasive input validation
(SURVEY §4.5: every public function has raises-companions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, Pointclouds, RGBDImages
from gradslam_tpu.odometry import (
    GradICPOdometryProvider,
    GroundTruthOdometryProvider,
    ICPOdometryProvider,
)
from gradslam_tpu.slam.fusionutils import (
    find_active_map_points,
    find_best_unique_correspondences,
    find_similar_map_points,
    update_map_aggregate,
)


def small_frame(B=1, L=1):
    return RGBDImages(
        jnp.ones((B, L, 4, 4, 3)),
        jnp.ones((B, L, 4, 4, 1)),
        jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4)),
        jnp.broadcast_to(jnp.eye(4), (B, L, 4, 4)),
    )


def small_cloud(B=1, normals=True, features=True):
    return Pointclouds.empty(
        B, 8, has_normals=normals, feature_dim=1 if features else None
    )


class TestFusionErrors:
    def test_find_active_wrong_types(self):
        with pytest.raises(TypeError):
            find_active_map_points("not a cloud", small_frame())
        with pytest.raises(TypeError):
            find_active_map_points(small_cloud(), "not frames")

    def test_find_active_seq_len(self):
        with pytest.raises(ValueError):
            find_active_map_points(small_cloud(), small_frame(L=2))

    def test_find_active_batch_mismatch(self):
        with pytest.raises(ValueError):
            find_active_map_points(small_cloud(B=2), small_frame(B=1))

    def test_similar_requires_normals(self):
        pc = small_cloud(normals=False)
        frame = small_frame()
        active = find_active_map_points(
            Pointclouds.empty(1, 8), frame
        )
        with pytest.raises(ValueError):
            find_similar_map_points(pc, frame, active, 0.05, 0.9)

    def test_unique_requires_features(self):
        pc = small_cloud(features=False)
        frame = small_frame()
        active = find_active_map_points(Pointclouds.empty(1, 8), frame)
        with pytest.raises(ValueError):
            find_best_unique_correspondences(pc, frame, active)

    def test_aggregate_wrong_types(self):
        with pytest.raises(TypeError):
            update_map_aggregate("nope", small_frame())
        with pytest.raises(TypeError):
            update_map_aggregate(small_cloud(), "nope")


class TestSLAMErrors:
    def test_forward_requires_rgbdimages(self):
        with pytest.raises(TypeError):
            ICPSLAM(odom="gt")("not frames")

    def test_step_type_checks(self):
        slam = PointFusion(odom="gt")
        with pytest.raises(TypeError):
            slam.step(small_cloud(), "not frames")
        with pytest.raises(TypeError):
            slam.step(small_cloud(), small_frame(), "not frames")

    def test_step_without_poses_raises(self):
        slam = PointFusion(odom="gt")
        frames = RGBDImages(
            jnp.ones((1, 1, 4, 4, 3)),
            jnp.ones((1, 1, 4, 4, 1)),
            jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
        )
        with pytest.raises(ValueError):
            slam.step(small_cloud(), frames)

    def test_icp_prev_frame_needs_poses(self):
        slam = PointFusion(odom="gradicp")
        prev = RGBDImages(
            jnp.ones((1, 1, 4, 4, 3)),
            jnp.ones((1, 1, 4, 4, 1)),
            jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
        )
        with pytest.raises(ValueError):
            slam.step(small_cloud(), small_frame(), prev)


class TestOdometryErrors:
    def test_gt_requires_poses(self):
        prov = GroundTruthOdometryProvider()
        frames_no_pose = RGBDImages(
            jnp.ones((1, 1, 4, 4, 3)),
            jnp.ones((1, 1, 4, 4, 1)),
            jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
        )
        with pytest.raises(ValueError):
            prov.provide(frames_no_pose, small_frame())

    def test_gt_batch_mismatch(self):
        prov = GroundTruthOdometryProvider()
        with pytest.raises(ValueError):
            prov.provide(small_frame(B=1), small_frame(B=2))

    def test_gt_recovers_relative(self):
        prov = GroundTruthOdometryProvider()
        f1 = small_frame()
        pose2 = jnp.eye(4).at[0, 3].set(0.5)
        f2 = RGBDImages(
            f1.rgb_image, f1.depth_image, f1.intrinsics, pose2[None, None]
        )
        T = prov.provide(f1, f2)
        np.testing.assert_allclose(np.asarray(T[0, 0, 0, 3]), 0.5, atol=1e-6)

    @pytest.mark.parametrize("cls", [ICPOdometryProvider, GradICPOdometryProvider])
    def test_icp_requires_normals(self, cls):
        prov = cls(numiters=2)
        maps_pc = small_cloud(normals=False)
        frames_pc = small_cloud()
        with pytest.raises(ValueError):
            prov.provide(maps_pc, frames_pc)

    @pytest.mark.parametrize("cls", [ICPOdometryProvider, GradICPOdometryProvider])
    def test_icp_batch_mismatch(self, cls):
        prov = cls(numiters=2)
        with pytest.raises(ValueError):
            prov.provide(small_cloud(B=2), small_cloud(B=1))
