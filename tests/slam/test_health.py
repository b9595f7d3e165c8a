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


class TestKeyframeDrift:
    """Keyframe-anchored drift detection (slam.keyframe_anchor): slow drift
    is invisible to frame-vs-own-map residuals (the map is fused at the
    tracker's own wrong poses) but alarms against a FROZEN early keyframe
    snapshot — the in-library mitigation of the documented blind spot."""

    def test_slow_drift_alarms_vs_anchor_not_vs_map(self):
        from gradslam_tpu.datasets import synthetic_sequence
        from gradslam_tpu.slam import keyframe_anchor

        B, L, H, W = 1, 10, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        # simulate a slowly drifting tracker: 6 mm/frame along the camera's
        # depth axis (54 mm by frame 9 — the measured invisible-drift regime)
        drift = np.zeros((B, L, 4, 4), np.float32) + np.eye(4, dtype=np.float32)
        drift[:, :, 2, 3] = 0.006 * np.arange(L, dtype=np.float32)
        drifted = jnp.asarray(np.einsum("blij,bljk->blik", drift, poses))
        frames = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                            drifted)
        # the map is fused at the drifted poses (what a drifting tracker does)
        pf = PointFusion(odom="gt", map_capacity=L * H * W)
        pc, _ = pf(frames)
        live = frames[:, L - 1]  # at its drifted pose

        h_map = tracking_health(pc, live, robust_scale=0.03)
        # anchored reference: frame 0 frozen before the drift accumulated
        anchor = keyframe_anchor(frames[:, 0])
        h_anchor = tracking_health(anchor, live, robust_scale=0.03)

        # guard against a vacuous alarm: the anchor must actually associate
        # (an empty association reads inlier_frac 0.0 for the wrong reason)
        assert float(h_anchor["assoc_frac"][0]) > 0.5, h_anchor
        # self-consistency reads healthy — the documented blind spot ...
        assert float(h_map["inlier_frac"][0]) > 0.7, h_map
        # ... while the anchored statistic alarms on the same frame
        assert float(h_anchor["inlier_frac"][0]) < 0.35, h_anchor
        # the anchored residual carries the accumulated ~54 mm drift; the
        # self-consistent one stays inside the 30 mm band (measured: 56 mm
        # vs 25 mm)
        assert float(h_anchor["median_abs_residual"][0]) > 0.04
        assert (float(h_anchor["median_abs_residual"][0])
                > 1.5 * float(h_map["median_abs_residual"][0]))

    def test_no_drift_reads_healthy_vs_anchor(self):
        from gradslam_tpu.datasets import synthetic_sequence
        from gradslam_tpu.slam import keyframe_anchor

        B, L, H, W = 1, 10, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        frames = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                            jnp.asarray(poses))
        anchor = keyframe_anchor(frames[:, 0])
        h = tracking_health(anchor, frames[:, L - 1], robust_scale=0.03)
        assert float(h["inlier_frac"][0]) > 0.7, h


class TestProjectiveHealth:
    """tracking_health(method='projective'): the same statistic computed
    with the projective association odom_assoc='projective' solvers use —
    the healthy/corrupted discrimination must survive the association swap,
    and the call must stay KNN-free."""

    def test_discriminates_like_knn(self, tracked_run):
        frames, pc, op, L = tracked_run
        live = frames[:, L - 1].with_poses(op[:, L - 1][:, None])
        h_ok = tracking_health(pc, live, robust_scale=0.03,
                               dist_thresh=0.01, method="projective")
        import dataclasses

        bad_pose = op[:, L - 1].at[:, 0, 3].add(0.25)
        h_bad = tracking_health(pc, live.with_poses(bad_pose[:, None]),
                                robust_scale=0.03, dist_thresh=0.01,
                                method="projective")
        healthy = float(h_ok["inlier_frac"][0])
        corrupted = float(h_bad["inlier_frac"][0])
        # same discrimination bar as the KNN variant (whose measured
        # corrupted signature is also ~0.35): a 0.25 m misalignment drops
        # the inlier fraction by > 0.25 and inflates the median residual
        assert healthy > 0.6, (healthy, corrupted)
        assert corrupted < healthy - 0.25, (healthy, corrupted)
        assert float(h_bad["median_abs_residual"][0]) > float(
            h_ok["median_abs_residual"][0])

    def test_validation(self, tracked_run):
        frames, pc, op, L = tracked_run
        live = frames[:, L - 1].with_poses(op[:, L - 1][:, None])
        with pytest.raises(ValueError, match="method"):
            tracking_health(pc, live, method="nearest")
