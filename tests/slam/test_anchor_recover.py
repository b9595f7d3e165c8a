"""Auto-arming keyframe drift recovery (``anchor_every``, VERDICT r4 #10):
the in-scan gate that closes the slow-drift blind spot ``slam.health``
documents — self-consistent health cannot see a tracker drifting a few
mm/frame (the map is fused at its own wrong poses), but a FROZEN keyframe
anchor can, and recovery re-solves against the anchor itself (the only
non-drifted reference in the program).

The drift scenario is the measured one from round 4's analysis: projective
association WITHOUT symmetric normals on noisy depth drifts monotonically
(the tangential null-space walk, design.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, RGBDImages
from gradslam_tpu.datasets import hard_sequence
from gradslam_tpu.metrics import ate_rmse

BASE = dict(odom="gradicp", odom_assoc="projective", dsratio=4, numiters=10,
            motion_model="constant_velocity", robust_loss="tukey",
            robust_scale=0.03, dist_thresh=0.01, odom_angle_gate=60.0)


class TestAnchorRecover:
    def test_validation(self):
        with pytest.raises(ValueError, match="anchor_every"):
            ICPSLAM(odom="gradicp", anchor_every=-1)
        with pytest.raises(ValueError, match="relocalize_below"):
            # the anchored gate reuses the relocalization machinery
            ICPSLAM(odom="gradicp", anchor_every=4)
        with pytest.raises(ValueError, match="anchor_below"):
            ICPSLAM(odom="gradicp", relocalize_below=0.2, anchor_every=4,
                    anchor_below=1.5)
        with pytest.raises(ValueError, match="anchor_dsratio"):
            ICPSLAM(odom="gradicp", relocalize_below=0.2, anchor_every=4,
                    anchor_dsratio=0)
        # anchor_every -> relocalize_below -> tracked odometry (transitive)
        with pytest.raises(ValueError, match="relocalize_below"):
            ICPSLAM(odom="gt", relocalize_below=0.2, anchor_every=4)

    @pytest.mark.slow
    def test_drift_clip_recovers_in_scan(self):
        """The committed numbers (CPU, 2026-08-20): one-sided projective
        normals on the noisy clip drift to 172 mm final error / 38 mm ATE;
        the anchored gate (conditional-inlier drift alarm + robust KNN
        re-solve against the frozen frame-0 anchor) cuts both roughly in
        half. Healthy-path cost is one window association per frame (the
        recovery branch sits behind ``lax.cond``)."""
        B, L, H, W = 1, 18, 120, 160
        rgb, d, K, poses = hard_sequence(B, L, H, W, outlier_frac=0.0)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        results = {}
        for tag, kw in [
            ("plain", {}),
            ("anchored", dict(relocalize_below=0.2, anchor_every=30)),
        ]:
            pf = PointFusion(**BASE, map_capacity=L * H * W, **kw)
            _, op = jax.jit(lambda f, pf=pf: pf(f))(fr)
            err = np.asarray(op[0][:, :3, 3] - fr.poses[0][:, :3, 3])
            results[tag] = (
                float(ate_rmse(op[0], fr.poses[0])),
                float(np.linalg.norm(err[-1])),
            )
        ate_p, fin_p = results["plain"]
        ate_a, fin_a = results["anchored"]
        assert fin_p > 0.1  # the scenario actually drifts
        assert ate_a < 0.65 * ate_p
        assert fin_a < 0.5 * fin_p

    def test_healthy_run_unperturbed(self):
        """On a clean clip with the full anti-drift recipe the anchor gate
        must never fire — trajectories equal the unanchored run."""
        from gradslam_tpu.datasets import synthetic_sequence

        B, L, H, W = 1, 8, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        ops = {}
        for tag, kw in [
            ("off", {}),
            ("on", dict(relocalize_below=0.2, anchor_every=3)),
        ]:
            pf = PointFusion(odom="gradicp", odom_assoc="projective",
                             odom_sym_normals=True, dsratio=2, numiters=8,
                             map_capacity=L * H * W, **kw)
            _, op = jax.jit(lambda f, pf=pf: pf(f))(fr)
            ops[tag] = np.asarray(op)
        np.testing.assert_allclose(ops["on"], ops["off"], atol=1e-5)
