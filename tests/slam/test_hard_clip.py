"""Hard accuracy clip (VERDICT r2 #4): on a noisy/fast-motion/outlier clip,
plain least-squares visibly degrades and the robust configuration recovers.

Tuning measurements (120x160, 30 frames, CPU, 2026-08-19, after the
motion-model/robust-step fixes below; the committed bench configs in
scripts/bench_all.py run the same sweep at 160x120 x 30 frames on TPU):
plain ~0.35 m ATE, cv+tukey 127 mm, cv+tukey scale=0.03 25.5 mm,
cv+tukey scale=0.03 dist_thresh=0.01 **19.2 mm** — an 18x spread in favor
of the tuned robust + motion-model configuration.

At 320x240 the same clip used to defeat every configuration from frame 1
(~0.35 m across the board). TPU factor isolation (2026-08-19) pinned it on
the 5 mm depth NOISE alone (outliers-only tracks at 3.8 mm; sampling pitch
was ruled out — ds8@320x240 samples the identical 40x30 grid as the working
ds4@160x120 and still fails): the reference's pitch-1 finite-difference
normals have angular noise ~ sigma*fx/z, which doubles with resolution.
``normal_pitch=2`` restores the coarser resolution's normal SNR at full
point density and tracks 320x240 at 18 mm (15 mm at ds4) — see
TestNormalPitchRescue and the 320x240 row in scripts/bench_all.py.
"""

import jax
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


class TestMotionModelStability:
    """Regression guards for two pose-runaway bugs found via the 30-frame
    hard-clip bench (2026-08-19):

    1. the CV carry's ``pose @ inv(prev) @ pose`` composition chain DOUBLES
       f32 rotation orthonormality error per frame (~2.4^k growth): det(R)
       visibly drifts by frame ~13 and overflows to NaN by frame ~25 even
       with PERFECT tracking — fixed by re-projecting the predicted pose
       onto SO(3) (geometry.orthonormalize_rotations);
    2. with a hard-rejecting robust kernel, a drifted initialization zeroes
       (almost) every IRLS weight, the damped 6x6 normal equations go
       near-singular, and gradICP applies the unbounded garbage step
       unconditionally — fixed by the displacement trust region + inlier
       mass fade (icputils._guard_robust_step).
    """

    @pytest.mark.slow
    def test_cv_long_horizon_stays_orthonormal(self):
        # 40 frames of the EASY clip: pre-fix this NaN'd around frame ~25-35
        # purely numerically (no outliers involved)
        B, L, H, W = 1, 40, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        frames = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
            jnp.asarray(poses),
        )
        slam = PointFusion(odom="gradicp", dsratio=4, numiters=4,
                           motion_model="constant_velocity",
                           map_capacity=L * H * W)
        _, op = slam(frames)
        op = np.asarray(op)[0]
        assert np.isfinite(op).all()
        dets = np.linalg.det(op[:, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)
        ate = float(ate_rmse(jnp.asarray(op), frames.poses[0]))
        assert ate < 0.005, ate

    @staticmethod
    def _degenerate_pair():
        """All-outlier frame plus 4 NEAR-COLLINEAR in-band points: the
        weighted normal equations are near-singular with a NONZERO right
        hand side, so the unguarded damped solve takes a large step
        (measured |t| = 0.75 m over 10 iters vs 0.01 m guarded). A purely
        all-outlier frame would be a vacuous check — every weight is
        exactly zero there, A = b = 0, and even the unguarded solve
        returns xi = 0."""
        rng = np.random.RandomState(0)
        xs, ys = np.meshgrid(np.linspace(0, 1, 30), np.linspace(0, 1, 30))
        tgt = np.stack(
            [xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1
        ).astype(np.float32)
        n = np.tile(np.asarray([0, 0, 1], np.float32), (tgt.shape[0], 1))
        src = tgt + np.asarray([0, 0, 2.0], np.float32)
        for k, x in enumerate([0.2, 0.4, 0.6, 0.8]):
            src[k] = [x, 0.5 + 1e-4 * rng.randn(), 0.045]
        return jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n)

    def test_robust_step_guard_bounds_degenerate_solve(self):
        from gradslam_tpu.odometry.icputils import point_to_plane_gradICP

        src, tgt, n = self._degenerate_pair()
        T, _ = point_to_plane_gradICP(src, tgt, n, numiters=10,
                                      robust_loss="tukey", robust_scale=0.05)
        T = np.asarray(T)
        assert np.isfinite(T).all()
        # guarded: 0.010 m; unguarded (guard monkeypatched to identity while
        # tuning this test): 0.746 m — assert well below the unguarded level
        assert np.linalg.norm(T[:3, 3]) < 0.1, np.linalg.norm(T[:3, 3])
        np.testing.assert_allclose(np.linalg.det(T[:3, :3]), 1.0, atol=1e-4)

    def test_robust_guard_gradient_stays_finite(self):
        # the guard's norms/trust-division must not NaN the backward when
        # the degenerate regime it targets occurs (xi == 0, disp == 0):
        # sqrt'(0) = inf, and dividing by a tiny clamp overflows the
        # division's backward — both were real NaN sources
        from gradslam_tpu.odometry.icputils import point_to_plane_gradICP

        _, tgt, n = self._degenerate_pair()
        src = tgt + jnp.asarray([0, 0, 2.0], jnp.float32)  # all-outlier

        def loss(s):
            T, _ = point_to_plane_gradICP(s, tgt, n, numiters=3,
                                          robust_loss="tukey",
                                          robust_scale=0.05)
            return jnp.sum(T[:3, 3] ** 2)

        g = jax.grad(loss)(src)
        assert bool(jnp.isfinite(g).all()), "NaN gradient through the guard"


class TestNormalPitchRescue:
    @pytest.mark.slow
    def test_pitch2_rescues_noise_limited_tracking(self):
        # scale-equivalent CPU stand-in for the 320x240@5mm failure: at
        # 160x120 with DOUBLED noise (10 mm) the noise/baseline ratio of
        # the pitch-1 normals matches 320x240@5mm — and tracking fails the
        # same way (measured 2026-08-19: pitch1 0.363 m, pitch2 25 mm).
        B, L, H, W = 1, 30, 120, 160
        rgb, d, K, poses = hard_sequence(B, L, H, W, noise_sigma=0.010,
                                         outlier_frac=0.0)
        frames = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
            jnp.asarray(poses),
        )
        tuned = dict(motion_model="constant_velocity", robust_loss="tukey",
                     robust_scale=0.03, dist_thresh=0.01,
                     map_capacity=L * H * W, odom="gradicp", dsratio=4,
                     numiters=10)
        _, op1 = PointFusion(normal_pitch=1, **tuned)(frames)
        ate1 = float(ate_rmse(op1[0], frames.poses[0]))
        _, op2 = PointFusion(normal_pitch=2, **tuned)(frames)
        ate2 = float(ate_rmse(op2[0], frames.poses[0]))
        assert ate2 < 0.05, f"pitch-2 tracking regressed: {ate2}"
        assert ate1 > 5 * ate2, (ate1, ate2)


class TestHardClipRobustness:
    @pytest.mark.slow
    def test_robust_cv_config_beats_plain(self):
        # 30 frames: long enough that the pre-fix CV carry would have
        # diverged to NaN (~frame 18) — this now regression-guards the
        # orthonormality + robust-step fixes AND the accuracy spread
        B, L, H, W = 1, 30, 120, 160
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
                             robust_loss="tukey", robust_scale=0.03,
                             dist_thresh=0.01, map_capacity=cap)
        _, op_rob = robust(frames)
        ate_rob = float(ate_rmse(op_rob[0], frames.poses[0]))

        # measured 2026-08-19: plain ~0.35 m, tuned cv+tukey 19.2 mm
        assert np.isfinite(ate_rob), "robust tracker diverged"
        assert ate_rob < 0.04, f"robust config regressed: {ate_rob}"
        assert ate_plain > 5 * ate_rob, (ate_plain, ate_rob)


class TestProjectiveDenseHardClip:
    @pytest.mark.slow
    def test_sym_recipe_tracks_dense_noisy_clip(self):
        """The projective anti-drift recipe (sym normals + gate + point
        rows + tightened tukey) must track a noisy clip at DENSE ds4 where
        one-sided plane rows run away (design.md §4 'Projective'). CPU-scale
        guard for the committed TPU result (640x480 ds4: 29.9 mm, where KNN
        ds4 diverges at 0.55-3.7 m)."""
        B, L, H, W = 1, 20, 240, 320
        rgb, depths, intrinsics, poses = hard_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(depths),
                        jnp.asarray(intrinsics), jnp.asarray(poses))
        base = dict(
            odom="gradicp", odom_assoc="projective", dsratio=4, numiters=10,
            map_capacity=L * H * W, motion_model="constant_velocity",
            robust_loss="tukey", dist_thresh=0.01, normal_pitch=2,
        )
        plain = PointFusion(**base, robust_scale=0.03)
        recipe = PointFusion(
            **base, robust_scale=0.02, odom_sym_normals=True,
            odom_angle_gate=45.0, odom_point_weight=0.25,
        )
        _, op_p = jax.jit(lambda f: plain(f))(fr)
        _, op_r = jax.jit(lambda f: recipe(f))(fr)
        ate_p = float(ate_rmse(op_p[0], fr.poses[0]))
        ate_r = float(ate_rmse(op_r[0], fr.poses[0]))
        assert ate_r < 0.5 * ate_p
        assert ate_r < 0.05
