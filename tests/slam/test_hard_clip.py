"""Hard accuracy clip (VERDICT r2 #4): on a noisy/fast-motion/outlier clip,
plain least-squares visibly degrades and the robust configuration recovers.

Tuning measurements (120x160, 10 frames, CPU, 2026-08-18; the committed
bench configs in scripts/bench_all.py run the same sweep at 320x240 x 30
frames on TPU): plain 83 mm ATE, huber 79, tukey 52, pyramid 115,
cv 270 (outlier error feedback), cv+tukey 12 mm — a 7x spread in favor of
the robust + motion-model configuration. The regression guard below holds
~2x headroom on those numbers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import PointFusion, RGBDImages
from gradslam_tpu.datasets import hard_sequence, synthetic_sequence
from gradslam_tpu.metrics import ate_rmse


class TestHardSequence:
    def test_shapes_and_gt_poses(self):
        B, L, H, W = 2, 4, 12, 16
        rgb, d, K, poses = hard_sequence(B, L, H, W)
        assert rgb.shape == (B, L, H, W, 3)
        assert d.shape == (B, L, H, W, 1)
        assert K.shape == (B, 1, 4, 4)
        assert poses.shape == (B, L, 4, 4)
        # poses are exact (corruption enters only through depth): frame-to-
        # frame translation ~6 cm at the default speed, modulated
        step = np.linalg.norm(poses[0, 1, :3, 3] - poses[0, 0, :3, 3])
        assert 0.04 < step < 0.12, step

    def test_outliers_and_noise_present(self):
        B, L, H, W = 1, 2, 48, 64
        _, d_hard, _, _ = hard_sequence(
            B, L, H, W, noise_sigma=0.0, outlier_frac=0.12, outlier_mag=0.35,
            speed=0.0,
        )
        _, d_clean, _, _ = hard_sequence(
            B, L, H, W, noise_sigma=0.0, outlier_frac=0.0, outlier_mag=0.0,
            speed=0.0,
        )
        dev = np.abs(d_hard - d_clean)[0, 0, ..., 0]
        frac = float((dev > 0.01).mean())
        # rectangles overlap, so the union covers a bit less than the target
        assert 0.05 < frac < 0.25, frac
        # outlier magnitude is gross (up to ±35 cm)
        assert dev.max() > 0.1
        # and the patches are frame-INCONSISTENT (different every frame)
        dev1 = np.abs(d_hard - d_clean)[0, 1, ..., 0]
        assert ((dev > 0.01) != (dev1 > 0.01)).mean() > 0.01

    def test_easy_clip_unchanged(self):
        # hard_sequence shares the scene with synthetic_sequence: with all
        # corruption off and speed matched it renders the same geometry
        _, d_hard, K_h, poses_h = hard_sequence(
            1, 1, 24, 32, noise_sigma=0.0, outlier_frac=0.0, speed=1.0
        )
        _, d_easy, K_e, poses_e = synthetic_sequence(1, 1, 24, 32)
        # frame 0: cam_t(0) == 0 in both generators
        np.testing.assert_allclose(d_hard[0, 0], d_easy[0, 0], atol=3e-4)
        np.testing.assert_array_equal(K_h, K_e)
        np.testing.assert_allclose(poses_h[:, :1], poses_e[:, :1])


class TestHardClipRobustness:
    @pytest.mark.slow
    def test_robust_cv_config_beats_plain(self):
        B, L, H, W = 1, 10, 120, 160
        rgb, d, K, poses = hard_sequence(B, L, H, W)
        frames = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
            jnp.asarray(poses),
        )
        cap = L * H * W

        plain = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                            map_capacity=cap)
        _, op_plain = plain(frames)
        ate_plain = float(ate_rmse(op_plain[0], frames.poses[0]))

        robust = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                             motion_model="constant_velocity",
                             robust_loss="tukey", map_capacity=cap)
        _, op_rob = robust(frames)
        ate_rob = float(ate_rmse(op_rob[0], frames.poses[0]))

        # measured 2026-08-18: plain 83.4 mm, cv+tukey 12.0 mm
        assert ate_rob < 0.025, f"robust config regressed: {ate_rob}"
        assert ate_plain > 2 * ate_rob, (ate_plain, ate_rob)
