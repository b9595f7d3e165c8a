"""Per-entry-point invalid-input tests (VERDICT r1 #4).

The reference pairs nearly every public function with
``test_raises_type_error`` / ``test_raises_value_error`` companions
(/root/reference/tests/odometry/test_icputils.py:51-119,
tests/structures/test_pointclouds.py:585). This module is the consolidated
equivalent: every public function in geometry / structures / odometry / slam /
metrics / dataset-utils gets at least one invalid-input assertion.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, Pointclouds, RGBDImages
from gradslam_tpu.geometry import (
    geometryutils as gu,
    projutils as pu,
    se3utils as se3,
)
from gradslam_tpu.datasets import datautils
from gradslam_tpu.metrics import align_trajectories, ate_rmse, chamfer_distance, rpe
from gradslam_tpu.odometry import (
    GradICPOdometryProvider,
    GroundTruthOdometryProvider,
    ICPOdometryProvider,
    icputils,
)
from gradslam_tpu.slam import fusionutils as fu
from gradslam_tpu.structures import (
    pointclouds_from_rgbdimages,
    structutils,
)

P3 = jnp.zeros((5, 3))
P4 = jnp.zeros((5, 4))
T44 = jnp.eye(4)


def frames(B=1, L=1, H=4, W=6, poses=True):
    return RGBDImages(
        jnp.zeros((B, L, H, W, 3)),
        jnp.ones((B, L, H, W, 1)),
        jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4)),
        jnp.broadcast_to(jnp.eye(4), (B, L, 4, 4)) if poses else None,
    )


class TestGeometryProjutils:
    def test_homogenize_points(self):
        with pytest.raises(TypeError):
            pu.homogenize_points("not an array")
        with pytest.raises(ValueError):
            pu.homogenize_points(jnp.zeros(()))

    def test_unhomogenize_points(self):
        with pytest.raises(TypeError):
            pu.unhomogenize_points(None)
        with pytest.raises(ValueError):
            pu.unhomogenize_points(jnp.zeros((4,)))  # needs >= 2 dims

    def test_project_points(self):
        with pytest.raises(ValueError):
            pu.project_points(P3, jnp.zeros((3, 3)))  # proj not 4x4
        with pytest.raises(ValueError):
            pu.project_points(jnp.zeros((5, 2)), T44)  # points not (*, 3)
        with pytest.raises(ValueError):  # batched rank mismatch
            pu.project_points(jnp.zeros((2, 1, 5, 3)), jnp.zeros((3, 4, 4)))

    def test_unproject_points(self):
        with pytest.raises(ValueError):
            pu.unproject_points(jnp.zeros((5, 2)), T44, jnp.zeros(5))
        with pytest.raises(ValueError):
            pu.unproject_points(P3, jnp.zeros((2, 3)), jnp.zeros(5))
        with pytest.raises(ValueError):  # depth rank mismatch
            pu.unproject_points(P3, jnp.eye(3), jnp.zeros((5, 1)))

    def test_inverse_intrinsics(self):
        with pytest.raises(ValueError):
            pu.inverse_intrinsics(jnp.zeros((5,)))
        with pytest.raises(ValueError):
            pu.inverse_intrinsics(jnp.zeros((2, 3)))


class TestGeometryUtils:
    def test_create_meshgrid(self):
        with pytest.raises(TypeError):
            gu.create_meshgrid(4.0, 6)
        with pytest.raises(TypeError):
            gu.create_meshgrid(4, "6")

    def test_compose_transformations(self):
        with pytest.raises(ValueError):
            gu.compose_transformations(jnp.zeros((3, 3)), T44)

    def test_inverse_transformation(self):
        with pytest.raises(ValueError):
            gu.inverse_transformation(jnp.zeros((4, 3)))

    def test_relative_transformation(self):
        with pytest.raises(ValueError):
            gu.relative_transformation(jnp.zeros((2, 2)), T44)

    def test_transform_pointcloud(self):
        with pytest.raises(ValueError):
            gu.transform_pointcloud(P4, T44)
        with pytest.raises(ValueError):
            gu.transform_pointcloud(P3, jnp.zeros((4, 3)))

    def test_transform_normals(self):
        with pytest.raises(ValueError):
            gu.transform_normals(P4, T44)
        with pytest.raises(ValueError):
            gu.transform_normals(P3, jnp.zeros((3, 4)))

    def test_transform_pts_3d(self):
        with pytest.raises(ValueError):
            gu.transform_pts_3d(P3, jnp.zeros((4, 3)))

    def test_pixel_coord_normalization(self):
        with pytest.raises(ValueError):
            gu.normalize_pixel_coords(jnp.zeros((4, 6, 3)), 4, 6)
        with pytest.raises(ValueError):
            gu.unnormalize_pixel_coords(jnp.zeros((4, 6, 3)), 4, 6)

    def test_cam2pixel(self):
        with pytest.raises(ValueError):
            gu.cam2pixel(jnp.zeros((4, 6, 2)), T44)

    def test_cam2pixel_KF(self):
        with pytest.raises(ValueError):
            gu.cam2pixel_KF(jnp.zeros((4, 6, 2)), T44)
        with pytest.raises(ValueError):
            gu.cam2pixel_KF(jnp.zeros((4, 6, 3)), jnp.zeros((3, 3)))

    def test_quaternion_utils(self):
        with pytest.raises(ValueError):
            gu.normalize_quaternion(jnp.zeros((5, 3)))
        with pytest.raises(ValueError):
            gu.quaternion_to_rotation_matrix(jnp.zeros((5, 3)))
        with pytest.raises(ValueError):
            gu.quaternion_to_axisangle(jnp.zeros((5, 5)))

    def test_3d_aliases(self):
        with pytest.raises(ValueError):
            gu.inverse_transfom_3d(jnp.zeros((2, 4)))
        with pytest.raises(ValueError):
            gu.compose_transforms_3d(jnp.zeros((4, 4, 2)), T44)
        with pytest.raises(ValueError):
            gu.relative_transform_3d(jnp.zeros((1, 2)), T44)


class TestSE3Utils:
    def test_hats(self):
        with pytest.raises(ValueError):
            se3.so3_hat(jnp.zeros((5, 4)))
        with pytest.raises(ValueError):
            se3.se3_hat(jnp.zeros((5, 3)))

    def test_exps(self):
        with pytest.raises(ValueError):
            se3.so3_exp(jnp.zeros((5, 6)))
        with pytest.raises(ValueError):
            se3.se3_exp(jnp.zeros((5, 3)))


class TestStructuresCtors:
    def test_rgbdimages_bad_shapes(self):
        with pytest.raises(ValueError):
            RGBDImages(jnp.zeros((1, 1, 4, 6, 4)), jnp.ones((1, 1, 4, 6, 1)),
                       jnp.eye(4)[None, None], None)
        with pytest.raises(ValueError):
            RGBDImages(jnp.zeros((1, 1, 4, 6, 3)), jnp.ones((1, 1, 4, 5, 1)),
                       jnp.eye(4)[None, None], None)
        with pytest.raises(ValueError):
            RGBDImages(jnp.zeros((1, 1, 4, 6, 3)), jnp.ones((1, 1, 4, 6, 1)),
                       jnp.eye(3)[None, None], None)

    def test_pointclouds_bad_shapes(self):
        with pytest.raises(ValueError):
            Pointclouds(points=jnp.zeros((2, 8, 4)),
                        num_points=jnp.zeros((2,), dtype=jnp.int32))
        with pytest.raises(ValueError):
            Pointclouds(points=jnp.zeros((2, 8, 3)),
                        num_points=jnp.zeros((2,), dtype=jnp.int32),
                        normals=jnp.zeros((2, 4, 3)))

    def test_from_list_empty(self):
        with pytest.raises(ValueError):
            Pointclouds.from_list([])

    def test_pointclouds_from_rgbdimages(self):
        with pytest.raises(TypeError):
            pointclouds_from_rgbdimages("frames")
        with pytest.raises(ValueError):  # seq len must be 1
            pointclouds_from_rgbdimages(frames(L=2))

    def test_structutils_converters(self):
        with pytest.raises(ValueError):
            structutils.list_to_padded([np.zeros((3, 2))], pad_size=(2, 2))
        with pytest.raises(ValueError):
            structutils.padded_to_list(np.zeros((2, 4, 3)), split_size=[3])


class TestOdometry:
    def test_solve_linear_system(self):
        with pytest.raises(ValueError):
            icputils.solve_linear_system(jnp.zeros((4, 6, 1)), jnp.zeros((4, 1)))
        with pytest.raises(ValueError):
            icputils.solve_linear_system(jnp.zeros((4, 6)), jnp.zeros((4, 2)))
        with pytest.raises(ValueError):
            icputils.solve_linear_system(jnp.zeros((4, 6)), jnp.zeros((5, 1)))

    def test_icp_solvers_bad_lookahead(self):
        pc = jnp.zeros((10, 3))
        with pytest.raises(ValueError):
            icputils.point_to_plane_ICP(pc, pc, pc, lookahead_assoc="bogus")
        with pytest.raises(ValueError):
            icputils.point_to_plane_gradICP(pc, pc, pc, lookahead_assoc="bogus")

    def test_icp_solvers_bad_numiters(self):
        # numiters=0 used to reach a length-0 scan and die on idx_hist[-1]
        # with an opaque IndexError deep in the trace (review r2).
        pc = jnp.zeros((10, 3))
        with pytest.raises(ValueError, match="numiters"):
            icputils.point_to_plane_ICP(pc, pc, pc, numiters=0)
        with pytest.raises(ValueError, match="numiters"):
            icputils.point_to_plane_gradICP(pc, pc, pc, numiters=0)
        with pytest.raises(ValueError, match="numiters"):
            ICPSLAM(odom="icp", numiters=0)

    def test_downsample_type_errors(self):
        with pytest.raises(TypeError):
            icputils.downsample_rgbdimages("frames", 4)
        with pytest.raises(TypeError):
            icputils.downsample_rgbdimages(frames(), 4.0)
        with pytest.raises(ValueError):  # seq len must be 1
            icputils.downsample_rgbdimages(frames(L=2), 2)

    def test_groundtruth_provider(self):
        prov = GroundTruthOdometryProvider()
        with pytest.raises(TypeError):
            prov.provide(frames(), "x")
        with pytest.raises(ValueError):
            prov.provide(frames(L=2), frames(L=2))

    @pytest.mark.parametrize("cls", [ICPOdometryProvider, GradICPOdometryProvider])
    def test_icp_providers_need_normals(self, cls):
        prov = cls(numiters=1)
        src = Pointclouds.empty(1, 8, has_normals=False)
        tgt = Pointclouds.empty(1, 8, has_normals=False)
        with pytest.raises(ValueError):
            prov.provide(tgt, src)


class TestSlamPipelines:
    def test_bad_odom_name(self):
        with pytest.raises(ValueError):
            ICPSLAM(odom="magic")
        with pytest.raises(ValueError):
            PointFusion(odom="magic")

    def test_bad_prune(self):
        with pytest.raises(ValueError):
            PointFusion(odom="gt", prune_every=-1)
        with pytest.raises(ValueError):
            ICPSLAM(odom="gt", prune_every=2)  # no confidence channel

    def test_forward_type(self):
        with pytest.raises(TypeError):
            PointFusion(odom="gt")("frames")

    def test_fusion_predicates(self):
        with pytest.raises(ValueError):
            fu.get_alpha(jnp.zeros((4, 2)), 0.6)
        with pytest.raises(ValueError):
            fu.are_points_close(jnp.zeros((4, 3)), jnp.zeros((5, 3)), 0.1)
        with pytest.raises(ValueError):
            fu.are_normals_similar(jnp.zeros((4, 3)), jnp.zeros((5, 3)), 0.5)

    def test_update_map_fusion_bad_modes(self):
        pc = Pointclouds.empty(1, 8)
        fr = frames()
        with pytest.raises(ValueError):
            fu.update_map_fusion(pc, fr, 0.6, 0.05, 0.9, association="bogus")
        with pytest.raises(ValueError):
            fu.update_map_fusion(pc, fr, 0.6, 0.05, 0.9, merge="bogus")

    def test_prune_requires_features(self):
        pc = Pointclouds.empty(1, 8, feature_dim=None)
        with pytest.raises(ValueError):
            fu.prune_map(pc, 1.0)


class TestMetrics:
    def test_ate_shape_mismatch(self):
        a = jnp.broadcast_to(jnp.eye(4), (5, 4, 4))
        b = jnp.broadcast_to(jnp.eye(4), (6, 4, 4))
        with pytest.raises(ValueError):
            ate_rmse(a, b)

    def test_rpe_bad_delta(self):
        a = jnp.broadcast_to(jnp.eye(4), (5, 4, 4))
        with pytest.raises(ValueError):
            rpe(a, a, delta=0)
        with pytest.raises(ValueError):
            rpe(a, a, delta=5)

    def test_positions_bad_shape(self):
        with pytest.raises(ValueError):
            align_trajectories(jnp.zeros((5, 2)), jnp.zeros((5, 2)))

    def test_chamfer_bad_trailing_dim(self):
        with pytest.raises(ValueError):
            chamfer_distance(jnp.zeros((5, 2)), jnp.zeros((5, 3)))


class TestDatautils:
    def test_channels_first(self):
        with pytest.raises(ValueError):
            datautils.channels_first(np.zeros((4, 6)))

    def test_scale_intrinsics(self):
        with pytest.raises(ValueError):
            datautils.scale_intrinsics(np.eye(2), 0.5, 0.5)

    def test_pointquaternion_to_homogeneous(self):
        with pytest.raises(ValueError):
            datautils.pointquaternion_to_homogeneous(np.zeros(6))


class TestMotionModelValidation:
    def test_step_rejects_wrong_prev_transform_shape(self, synthetic_clip):
        # the natural mistake — passing the (B, 1, 4, 4) pose step returns —
        # must raise at the boundary, not broadcast into rank-5 poses
        frames = synthetic_clip(B=1, L=2, H=16, W=24)
        slam = ICPSLAM(odom="icp", dsratio=2, numiters=2)
        pc = slam.empty_map(1, 2 * 16 * 24)
        pc, pose = slam.step(pc, frames[:, 0])
        prev = frames[:, 0].with_poses(pose)
        with pytest.raises(ValueError, match="prev_transform"):
            slam.step(pc, frames[:, 1], prev, prev_transform=pose)  # (B,1,4,4)
        # correct shape passes
        slam.step(pc, frames[:, 1], prev, prev_transform=pose[:, 0])
