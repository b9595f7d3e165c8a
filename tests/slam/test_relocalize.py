"""Relocalization (slam.relocalize): multi-hypothesis recovery after lost
tracking. The reference has no recovery path — a diverged run stays diverged.
Pairs with tracking_health: the monitor detects the kidnapped frame, the
relocalizer re-attaches it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.datasets import hard_sequence
from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.slam import (
    PointFusion,
    perturbation_grid,
    relocalize,
    tracking_health,
)
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


def kidnap(pose, dx=0.35, yaw_deg=20.0):
    """Displace a (B, 4, 4) pose by a camera-local translation + yaw."""
    xi = jnp.asarray([dx, 0.0, 0.0, 0.0, np.radians(yaw_deg), 0.0],
                     dtype=pose.dtype)
    return jnp.einsum("bij,jk->bik", pose, se3_exp(xi))


class TestPerturbationGrid:
    def test_shape_and_identity_first(self, tracked_run):
        _, _, op, L = tracked_run
        pose = op[:, L - 1]
        grid = perturbation_grid(pose, yaw_deg=(0.0, -10.0, 10.0),
                                 translations=((0, 0, 0), (0.1, 0, 0)))
        assert grid.shape == (1, 6, 4, 4)
        np.testing.assert_allclose(np.asarray(grid[:, 0]), np.asarray(pose),
                                   atol=1e-6)

    def test_camera_local(self):
        # a pure z-translation hypothesis moves along the camera's forward
        # axis, wherever the camera is
        pose = jnp.eye(4)[None].at[:, 0, 3].set(5.0)
        grid = perturbation_grid(pose, yaw_deg=(0.0,),
                                 translations=((0, 0, 0.2),))
        np.testing.assert_allclose(np.asarray(grid[0, 0, :3, 3]),
                                   [5.0, 0.0, 0.2], atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError, match=r"\(B, 4, 4\)"):
            perturbation_grid(jnp.eye(4))
        with pytest.raises(ValueError, match="non-empty"):
            perturbation_grid(jnp.eye(4)[None], yaw_deg=())
        with pytest.raises(ValueError, match="3-sequence"):
            perturbation_grid(jnp.eye(4)[None], translations=((0, 0),))


class TestRelocalize:
    def test_recovers_kidnapped_pose(self, tracked_run):
        frames, pc, op, L = tracked_run
        true_pose = op[:, L - 1]
        bad = kidnap(true_pose)
        live = frames[:, L - 1]

        # health flags the kidnapped pose
        h_bad = tracking_health(pc, live.with_poses(bad[:, None]),
                                robust_scale=0.03, dist_thresh=0.01)
        assert float(h_bad["inlier_frac"][0]) < 0.5

        # anchors: a grid around the BAD pose (the tracker's last belief)
        anchors = perturbation_grid(
            bad,
            yaw_deg=(0.0, -15.0, 15.0, -30.0),
            translations=((0, 0, 0), (-0.3, 0, 0), (0.3, 0, 0)),
        )
        poses, info = relocalize(pc, live, anchors, dsratio=4, numiters=12,
                                 robust_scale=0.03)
        assert poses.shape == (1, 1, 4, 4)
        # recovered pose within a few mm of the true one
        t_err = float(jnp.linalg.norm(poses[0, 0, :3, 3] - true_pose[0, :3, 3]))
        assert t_err < 0.02, t_err
        # and the winner's health is back to healthy levels
        assert float(info["inlier_frac"][0]) > 0.6
        h_rec = tracking_health(pc, live.with_poses(poses),
                                robust_scale=0.03, dist_thresh=0.01)
        assert float(h_rec["inlier_frac"][0]) > 0.6
        # the grid's identity hypothesis (the bad pose itself) must not win
        # with a better score than the winner
        scores = np.asarray(info["hypothesis_inlier_frac"][0])
        assert scores[int(info["best_hypothesis"][0])] == scores.max()

    def test_empty_view_scores_zero(self, tracked_run):
        """A hypothesis whose frustum sees NO map points must score 0, not a
        vacuous 1.0 (the KNN +inf sentinel gathers a zero normal whose
        residual is exactly 0)."""
        frames, pc, op, L = tracked_run
        gone = np.asarray(op[:, L - 1]).copy()
        gone[:, 0, 3] += 100.0  # far outside the mapped volume
        anchors = jnp.asarray(gone)[:, None]  # K=1
        poses, info = relocalize(pc, frames[:, L - 1], anchors,
                                 dsratio=4, robust_scale=0.03)
        assert float(info["inlier_frac"][0]) < 0.05

    def test_jittable_and_deterministic(self, tracked_run):
        frames, pc, op, L = tracked_run
        bad = kidnap(op[:, L - 1], dx=0.2, yaw_deg=10.0)
        anchors = perturbation_grid(bad, yaw_deg=(0.0, -10.0, 10.0))
        live = frames[:, L - 1]
        f = jax.jit(lambda m, fr, a: relocalize(m, fr, a, dsratio=4,
                                                robust_scale=0.03))
        p1, i1 = f(pc, live, anchors)
        p2, i2 = relocalize(pc, live, anchors, dsratio=4, robust_scale=0.03)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
        assert int(i1["best_hypothesis"][0]) == int(i2["best_hypothesis"][0])

    def test_validation(self, tracked_run):
        frames, pc, op, L = tracked_run
        live = frames[:, L - 1]
        anchors = op[:, L - 1][:, None]
        with pytest.raises(TypeError, match="Pointclouds"):
            relocalize(live, live, anchors)
        with pytest.raises(TypeError, match="RGBDImages"):
            relocalize(pc, pc, anchors)
        with pytest.raises(ValueError, match=r"\(B, K, 4, 4\)"):
            relocalize(pc, live, op[:, L - 1])
        with pytest.raises(ValueError, match="odom"):
            relocalize(pc, live, anchors, odom="gt")
        import dataclasses

        no_normals = dataclasses.replace(pc, normals=None)
        with pytest.raises(ValueError, match="normals"):
            relocalize(no_normals, live, anchors)


class TestLocalizeMapUpdateDecomposition:
    def test_localize_plus_map_update_equals_step(self, tracked_run):
        """The decomposed serving loop (localize -> gate -> map_update) must
        reproduce step() exactly when the gate passes."""
        frames, pc, op, L = tracked_run
        pf = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                         map_capacity=pc.capacity, **TUNED)
        prev = frames[:, L - 2].with_poses(op[:, L - 2][:, None])
        live = frames[:, L - 1]
        pc_step, poses_step = pf.step(pc, live, prev)
        poses_loc = pf.localize(pc, live, prev)
        pc_fused = pf.map_update(pc, live.with_poses(poses_loc))
        np.testing.assert_allclose(np.asarray(poses_loc),
                                   np.asarray(poses_step), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pc_fused.points),
                                   np.asarray(pc_step.points), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(pc_fused.num_points),
                                      np.asarray(pc_step.num_points))

    def test_decomposition_with_normal_pitch(self, tracked_run):
        """map_update must fuse the SAME pitch-k normals step() fuses when
        the pipeline overrides normal_pitch (regression: map_update used to
        skip _with_normal_pitch and silently fuse pitch-1 normals)."""
        frames, pc, op, L = tracked_run
        pf = PointFusion(odom="gradicp", dsratio=4, numiters=10,
                         map_capacity=pc.capacity, normal_pitch=2, **TUNED)
        prev = frames[:, L - 2].with_poses(op[:, L - 2][:, None])
        live = frames[:, L - 1]
        pc_step, poses_step = pf.step(pc, live, prev)
        poses_loc = pf.localize(pc, live, prev)
        pc_fused = pf.map_update(pc, live.with_poses(poses_loc))
        np.testing.assert_allclose(np.asarray(poses_loc),
                                   np.asarray(poses_step), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pc_fused.normals),
                                   np.asarray(pc_step.normals), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pc_fused.points),
                                   np.asarray(pc_step.points), atol=1e-6)

    def test_localize_validation(self, tracked_run):
        frames, pc, op, L = tracked_run
        prev = frames[:, L - 2].with_poses(op[:, L - 2][:, None])
        gt = PointFusion(odom="gt", map_capacity=pc.capacity)
        with pytest.raises(ValueError, match="gt"):
            gt.localize(pc, frames[:, L - 1], prev)
        pf = PointFusion(odom="gradicp", dsratio=4, numiters=2,
                         map_capacity=pc.capacity)
        with pytest.raises(TypeError, match="RGBDImages"):
            pf.localize(pc, pc, prev)
        import dataclasses

        with pytest.raises(ValueError, match="poses"):
            pf.localize(pc, frames[:, L - 1],
                        dataclasses.replace(prev, poses=None))
        with pytest.raises(ValueError, match="poses"):
            pf.map_update(pc, dataclasses.replace(frames[:, L - 1], poses=None))


class TestHypothesisMode:
    def test_scan_equals_vmap(self, tracked_run):
        """hypothesis_mode='scan' (the memory-bounded mode the in-scan
        branch embeds — only one hypothesis window live at a time) must
        produce the same solved poses and scores as the concurrent vmap."""
        frames, pc, op, L = tracked_run
        bad = kidnap(op[:, L - 1])
        live = frames[:, L - 1]
        anchors = perturbation_grid(
            bad, yaw_deg=(0.0, -15.0, 15.0),
            translations=((0, 0, 0), (-0.3, 0, 0)),
        )
        outs = {}
        for mode in ("vmap", "scan"):
            poses, info = relocalize(pc, live, anchors, dsratio=4,
                                     numiters=8, robust_scale=0.03,
                                     hypothesis_mode=mode)
            outs[mode] = (np.asarray(poses),
                          np.asarray(info["hypothesis_inlier_frac"]),
                          int(info["best_hypothesis"][0]))
        # fp-ordering differences between the vmap'd and sequential solves
        # compound over the LM iterations (measured ~3e-4 over 8 iters on
        # this noisy clip), so equality is same-winner + sub-mm poses, not
        # bit-identity
        assert outs["scan"][2] == outs["vmap"][2]
        np.testing.assert_allclose(outs["scan"][0], outs["vmap"][0],
                                   atol=2e-3)
        np.testing.assert_allclose(outs["scan"][1], outs["vmap"][1],
                                   atol=2e-2)

    def test_unknown_mode_raises(self, tracked_run):
        frames, pc, op, L = tracked_run
        anchors = perturbation_grid(op[:, L - 1])
        with pytest.raises(ValueError, match="hypothesis_mode"):
            relocalize(pc, frames[:, L - 1], anchors,
                       hypothesis_mode="parallel")
