"""Tracking-health telemetry (slam.tracking_health): production
observability for lost tracking. The reference has none — its pipelines
silently produce a garbage map when odometry diverges. Measured signatures
and the slow-drift limitation are documented in slam/health.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.datasets import hard_sequence
from gradslam_tpu.slam import PointFusion, tracking_health
from gradslam_tpu.structures import RGBDImages

TUNED = dict(motion_model="constant_velocity", robust_loss="tukey",
             robust_scale=0.03, dist_thresh=0.01)


@pytest.fixture(scope="module")
def tracked_run():
    B, L, H, W = 1, 6, 60, 80
    rgb, d, K, poses = hard_sequence(B, L, H, W, noise_sigma=0.003,
                                     outlier_frac=0.05)
    frames = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
    pf = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                     map_capacity=L * H * W, **TUNED)
    pc, op = pf(frames)
    return frames, pc, op, L


class TestTrackingHealth:
    def test_healthy_vs_corrupted_pose(self, tracked_run):
        frames, pc, op, L = tracked_run
        last = frames[:, L - 1].with_poses(op[:, L - 1][:, None])
        h = tracking_health(pc, last, robust_scale=0.03, dist_thresh=0.01)
        assert h["inlier_frac"].shape == (1,)
        healthy = float(h["inlier_frac"][0])
        assert healthy > 0.6, healthy  # measured 0.87 at 160x120
        assert float(h["median_abs_residual"][0]) < 0.03  # inside the band

        bad = np.asarray(op[:, L - 1]).copy()
        bad[:, 0, 3] += 0.25
        lastb = frames[:, L - 1].with_poses(jnp.asarray(bad)[:, None])
        hb = tracking_health(pc, lastb, robust_scale=0.03, dist_thresh=0.01)
        corrupted = float(hb["inlier_frac"][0])
        assert corrupted < healthy - 0.25, (healthy, corrupted)
        assert float(hb["median_abs_residual"][0]) > float(
            h["median_abs_residual"][0]
        )

    def test_overlap_detects_leaving_the_map(self, tracked_run):
        frames, pc, op, L = tracked_run
        gone = np.asarray(op[:, L - 1]).copy()
        gone[:, 0, 3] += 50.0  # camera far outside the mapped volume
        h = tracking_health(
            pc, frames[:, L - 1].with_poses(jnp.asarray(gone)[:, None]),
            robust_scale=0.03,
        )
        assert float(h["overlap_frac"][0]) < 0.05

    def test_jittable(self, tracked_run):
        frames, pc, op, L = tracked_run
        last = frames[:, L - 1].with_poses(op[:, L - 1][:, None])
        f = jax.jit(
            lambda m, fr: tracking_health(m, fr, robust_scale=0.03)
        )
        h1 = f(pc, last)
        h2 = tracking_health(pc, last, robust_scale=0.03)
        np.testing.assert_allclose(
            np.asarray(h1["inlier_frac"]), np.asarray(h2["inlier_frac"]),
            atol=1e-6,
        )

    def test_validation(self, tracked_run):
        frames, pc, op, L = tracked_run
        last = frames[:, L - 1].with_poses(op[:, L - 1][:, None])
        with pytest.raises(TypeError, match="Pointclouds"):
            tracking_health(frames, last)
        with pytest.raises(TypeError, match="RGBDImages"):
            tracking_health(pc, pc)
        import dataclasses

        no_normals = dataclasses.replace(pc, normals=None)
        with pytest.raises(ValueError, match="normals"):
            tracking_health(no_normals, last)
        no_pose = dataclasses.replace(last, poses=None)
        with pytest.raises(ValueError, match="poses"):
            tracking_health(pc, no_pose)
