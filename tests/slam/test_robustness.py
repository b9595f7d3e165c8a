"""Degenerate-input robustness: empty maps, all-invalid depth, capacity
overflow — the failure modes static-shape SLAM must survive (the reference
raises or warns its way out of these; we must stay finite under jit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, Pointclouds, RGBDImages
from gradslam_tpu.odometry import point_to_plane_ICP, point_to_plane_gradICP


def frame_with_depth(depth_fill, B=1, H=8, W=8):
    rgb = jnp.ones((B, 1, H, W, 3)) * 0.5
    depth = jnp.full((B, 1, H, W, 1), depth_fill)
    K = jnp.eye(4).at[0, 0].set(8.0).at[1, 1].set(8.0).at[0, 2].set(3.5).at[1, 2].set(3.5)
    return RGBDImages(
        rgb, depth, jnp.broadcast_to(K, (B, 1, 4, 4)),
        jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4)),
    )


class TestDegenerateInputs:
    @pytest.mark.slow
    def test_all_invalid_depth_fusion(self):
        """A frame with no valid depth adds nothing and corrupts nothing."""
        slam = PointFusion(odom="gt", map_capacity=256)
        pc = Pointclouds.empty(1, 256)
        out, _ = slam.step(pc, frame_with_depth(0.0))
        assert int(out.num_points[0]) == 0
        assert np.all(np.isfinite(np.asarray(out.points)))

    def test_empty_map_icp_is_benign(self):
        """ICP against an empty (all-masked) target must return a finite
        transform (identity-ish), not NaN."""
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        tgt = jnp.zeros((64, 3))
        normals = jnp.zeros((64, 3))
        mask = jnp.zeros((64,), dtype=bool)
        for solver in (point_to_plane_ICP, point_to_plane_gradICP):
            T, _ = solver(src, tgt, normals, numiters=3, tgt_mask=mask)
            assert np.all(np.isfinite(np.asarray(T)))

    def test_tracked_step_with_empty_map(self):
        """First tracked step (empty map) must not produce NaN poses."""
        slam = PointFusion(odom="gradicp", numiters=3, dsratio=2, map_capacity=256)
        pc = Pointclouds.empty(1, 256)
        live = frame_with_depth(1.0)
        prev = frame_with_depth(1.0)
        out_pc, poses = slam.step(pc, live, prev)
        assert np.all(np.isfinite(np.asarray(poses)))

    def test_capacity_overflow_clamps(self):
        """Appending beyond capacity drops points but keeps counters sane."""
        slam = PointFusion(odom="gt", map_capacity=16)
        pc = Pointclouds.empty(1, 16)
        out, _ = slam.step(pc, frame_with_depth(1.0))  # 64 valid pixels
        assert int(out.num_points[0]) == 16
        out2, _ = slam.step(out, frame_with_depth(1.0))
        assert int(out2.num_points[0]) <= 16
        assert np.all(np.isfinite(np.asarray(out2.points)))

    def test_fusion_gradient_survives_degenerate_frame(self):
        slam = PointFusion(odom="gt", map_capacity=128, use_jit=False)
        frame = frame_with_depth(1.0)

        def loss(depth):
            fr = RGBDImages(frame.rgb_image, depth, frame.intrinsics, frame.poses)
            pc = Pointclouds.empty(1, 128)
            out, _ = slam.step(pc, fr)
            return jnp.sum(out.points**2)

        # zero-depth frame: gradient exists and is finite (all zeros)
        g = jax.grad(loss)(jnp.zeros_like(frame.depth_image))
        assert np.all(np.isfinite(np.asarray(g)))
