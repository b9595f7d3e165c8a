"""Projective data association odometry (odometry.projective): the KNN-free
frame-to-model mode the reference cannot express (it is welded to chamferdist,
/root/reference/gradslam/odometry/icputils.py:3). Covers: solver-level pose
recovery, pipeline-level ATE parity with the KNN mode, the normal gate's
wrong-surface rejection on the hard clip, differentiability, and validation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, RGBDImages
from gradslam_tpu.datasets import hard_sequence, synthetic_sequence
from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.metrics import ate_rmse
from gradslam_tpu.odometry import (
    ProjectiveOdometryProvider,
    point_to_plane_gradICP_projective,
    projective_associate,
)
from gradslam_tpu.structures import Pointclouds

TUNED = dict(motion_model="constant_velocity", robust_loss="tukey",
             robust_scale=0.03, dist_thresh=0.01)


def one_frame(H=60, W=80, seed=0):
    rgb, d, K, poses = synthetic_sequence(1, 1, H, W, seed=seed)
    return RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                      jnp.asarray(poses))


def frame_geom_of(frame):
    """Packed (HW, 8) association image: vertex | normal | valid | 0."""
    B, _, H, W = frame.shape
    vert = frame.vertex_map.reshape(B, H * W, 3)
    nrm = frame.normal_map.reshape(B, H * W, 3)
    valid = frame.valid_depth_mask.reshape(B, H * W, 1).astype(vert.dtype)
    return jnp.concatenate(
        [vert, nrm, valid, jnp.zeros_like(valid)], axis=-1)[0]


class TestProjectiveAssociate:
    def test_self_association_at_true_pose(self):
        """Every valid map point sampled from the frame itself must
        re-associate to (nearly) itself at the true pose."""
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)[0]
        nrm = frame.global_normal_map.reshape(1, H * W, 3)[0]
        mask = frame.valid_depth_mask.reshape(1, H * W)[0]
        s, valid, n_frame = projective_associate(
            pts, nrm, mask, frame_geom_of(frame), frame.intrinsics[0, 0],
            frame.poses[0, 0], H, W,
        )
        v = np.asarray(valid)
        assert v.sum() > 0.9 * np.asarray(mask).sum()
        err = np.linalg.norm(np.asarray(s - pts), axis=-1)[v]
        assert err.max() < 1e-4

    def test_gates(self):
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)[0]
        nrm = frame.global_normal_map.reshape(1, H * W, 3)[0]
        mask = frame.valid_depth_mask.reshape(1, H * W)[0]
        args = (frame_geom_of(frame), frame.intrinsics[0, 0],
                frame.poses[0, 0], H, W)
        # shift the map 10 cm: a 1 cm^2 distance gate kills everything
        _, v_far, _ = projective_associate(pts + 0.1, nrm, mask, *args,
                                        dist_thresh=0.01**2)
        assert int(np.asarray(v_far).sum()) == 0
        # flip the map normals: a dot gate kills everything
        _, v_flip, _ = projective_associate(pts, -nrm, mask, *args,
                                         dot_gate=0.5)
        assert int(np.asarray(v_flip).sum()) == 0
        # behind-camera points are invalid
        behind = pts.at[..., 2].set(-1.0)
        _, v_behind, _ = projective_associate(behind, nrm, mask, *args)
        assert int(np.asarray(v_behind).sum()) == 0


class TestProjectiveSolver:
    @pytest.mark.parametrize("solver", ["icp", "gradicp"])
    def test_recovers_perturbed_pose(self, solver):
        """Map = the frame's own surface at the true pose; init = perturbed
        pose. The solver must find the correction back to the true pose."""
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        maps_pc = Pointclouds(points=pts, normals=nrm,
                              num_points=mask.sum(-1).astype(jnp.int32))
        # compact the valid points to the front so nonpad_mask is honest
        order = jnp.argsort(~mask[0])
        maps_pc = dataclasses.replace(
            maps_pc, points=pts[:, order], normals=nrm[:, order])
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.008]))
        init = (delta @ true_pose)[None, None]
        prov = ProjectiveOdometryProvider(solver=solver, numiters=15)
        X = prov.provide(maps_pc, frame.with_poses(init))  # (1, 1, 4, 4)
        solved = np.asarray(X[0, 0] @ init[0, 0])
        np.testing.assert_allclose(solved, np.asarray(true_pose), atol=2e-3)

    def test_warm_start_included_in_result(self):
        """initial_transform warm-start must be included in the returned
        transform (pyramid levels chain by composition)."""
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        maps_pc = Pointclouds(points=pts, normals=nrm,
                              num_points=mask.sum(-1).astype(jnp.int32))
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.03, 0.0, 0.0, 0.0, 0.02, 0.0]))
        init = (delta @ true_pose)[None, None]
        prov = ProjectiveOdometryProvider(numiters=8)
        # warm-start with the exact correction: the solve starts at the
        # optimum and must stay there, returning ~the warm start itself
        X0 = jnp.linalg.inv(delta)[None]
        X = prov.provide(maps_pc, frame.with_poses(init),
                         initial_transform=X0)
        np.testing.assert_allclose(np.asarray(X[0, 0] @ init[0, 0]),
                                   np.asarray(true_pose), atol=1e-3)

    def test_differentiable(self):
        """Gradients flow through the projective solve to the frame depth
        (the gradSLAM selling point, preserved by the new association)."""
        frame = one_frame(H=32, W=40)
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)[0]
        nrm = frame.global_normal_map.reshape(1, H * W, 3)[0]
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.01, 0.0]))
        init = delta @ true_pose

        def loss(depth):
            fr = dataclasses.replace(frame, depth_image=depth)
            geom = frame_geom_of(fr)
            X = point_to_plane_gradICP_projective(
                pts, nrm, jnp.ones(pts.shape[0], bool), geom,
                fr.intrinsics[0, 0], init, H, W, numiters=4,
            )
            return jnp.sum((X @ init - true_pose) ** 2)

        g = jax.grad(loss)(frame.depth_image)
        ga = np.asarray(g)
        assert np.isfinite(ga).all()
        assert np.abs(ga).max() > 0


class TestProjectivePipeline:
    def test_ate_parity_with_knn(self):
        B, L, H, W = 1, 8, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        ates = {}
        for assoc in ("knn", "projective"):
            pf = PointFusion(odom="gradicp", odom_assoc=assoc, dsratio=4,
                             numiters=10, map_capacity=L * H * W)
            _, op = pf(fr)
            ates[assoc] = float(ate_rmse(op[0], fr.poses[0]))
        # both track; projective within 2x of the KNN mode (VERDICT r3 #1)
        assert ates["knn"] < 1e-3
        assert ates["projective"] < 2 * max(ates["knn"], 1e-5)

    def test_icpslam_and_pyramid(self):
        B, L, H, W = 1, 6, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        s = ICPSLAM(odom="icp", odom_assoc="projective",
                    pyramid=[(8, 6), (4, 4)], map_capacity=L * H * W)
        _, op = s(fr)
        assert float(ate_rmse(op[0], fr.poses[0])) < 1e-3

    def test_normal_gate_rescues_hard_clip(self):
        """On the noisy-depth hard clip the pure distance gate admits
        wrong-surface candidates (design.md §4); the projective normal gate
        rejects them. The gated ATE must land in the KNN-tuned band and beat
        the ungated run."""
        B, L, H, W = 1, 12, 120, 160
        rgb, d, K, poses = hard_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        ates = {}
        for gate in (None, 60.0):
            pf = PointFusion(odom="gradicp", odom_assoc="projective",
                             odom_angle_gate=gate, dsratio=4, numiters=10,
                             map_capacity=L * H * W, **TUNED)
            _, op = pf(fr)
            ates[gate] = float(ate_rmse(op[0], fr.poses[0]))
        assert ates[60.0] < 0.03  # committed: 0.0169 (KNN tuned: 0.0162)
        assert ates[60.0] < ates[None]

    def test_validation(self):
        with pytest.raises(ValueError, match="odom_assoc"):
            ICPSLAM(odom="gradicp", odom_assoc="nearest")
        with pytest.raises(ValueError, match="odom_angle_gate"):
            ICPSLAM(odom="gt", odom_angle_gate=60.0)
        with pytest.raises(ValueError, match="odom_angle_gate"):
            ICPSLAM(odom="gradicp", odom_assoc="projective",
                    odom_angle_gate=-5.0)
        with pytest.raises(ValueError, match="solver"):
            ProjectiveOdometryProvider(solver="lm")
        with pytest.raises(ValueError, match="dot_gate"):
            ProjectiveOdometryProvider(dot_gate=2.0)
        frame = one_frame()
        pc_nonorm = Pointclouds(points=jnp.zeros((1, 8, 3)),
                                num_points=jnp.asarray([8]))
        prov = ProjectiveOdometryProvider()
        with pytest.raises(ValueError, match="normals"):
            prov.provide(pc_nonorm, frame)
        pc = Pointclouds(points=jnp.zeros((1, 8, 3)),
                         normals=jnp.zeros((1, 8, 3)),
                         num_points=jnp.asarray([8]))
        with pytest.raises(ValueError, match="poses"):
            prov.provide(pc, dataclasses.replace(frame, poses=None))
        with pytest.raises(TypeError, match="RGBDImages"):
            prov.provide(pc, pc)
        pc2 = Pointclouds(points=jnp.zeros((2, 8, 3)),
                          normals=jnp.zeros((2, 8, 3)),
                          num_points=jnp.asarray([8, 8]))
        with pytest.raises(ValueError, match="[Bb]atch"):
            prov.provide(pc2, frame)
        with pytest.raises(ValueError, match="lookahead"):
            ProjectiveOdometryProvider(lookahead_assoc="stale").provide(
                pc, frame)
        with pytest.raises(ValueError, match="numiters"):
            ProjectiveOdometryProvider(numiters=0).provide(pc, frame)


class TestSymNormalsAndPointRows:
    @pytest.mark.parametrize(
        "kw",
        [dict(sym_normals=True), dict(point_weight=0.25),
         dict(sym_normals=True, point_weight=0.25)],
    )
    def test_recovers_perturbed_pose(self, kw):
        """The symmetric-normal / point-to-point row variants must still
        solve the clean perturbed-pose recovery problem. point_weight is
        kept small here: point rows gather the surface at the ROUNDED
        pixel, so they carry a half-pixel in-plane quantization floor
        (~z/(2 fx)) that plane rows are insensitive to — the weight trades
        that floor against the tangential anti-drift constraint."""
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        maps_pc = Pointclouds(points=pts, normals=nrm,
                              num_points=mask.sum(-1).astype(jnp.int32))
        order = jnp.argsort(~mask[0])
        maps_pc = dataclasses.replace(
            maps_pc, points=pts[:, order], normals=nrm[:, order])
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.008]))
        init = (delta @ true_pose)[None, None]
        prov = ProjectiveOdometryProvider(numiters=15, **kw)
        X = prov.provide(maps_pc, frame.with_poses(init))
        solved = np.asarray(X[0, 0] @ init[0, 0])
        # The point-row variants converge only to the half-pixel
        # quantization floor (z/(2 fx) — ~25 mm at this tiny 80-px frame,
        # ~2 mm at 640x480): the pixel-snap in-plane offsets are spatially
        # correlated, so LS trades them into the pose. point_weight is an
        # anti-drift knob for production resolutions, not a precision one.
        atol = 0.03 if kw.get("point_weight") else 2e-3
        np.testing.assert_allclose(solved, np.asarray(true_pose), atol=atol)

    def test_sym_normals_rescue_noisy_tracking(self):
        """The drift mechanism sym_normals fixes (docstring of
        ProjectiveOdometryProvider): on a noisy clip, pure plane rows with
        map normals drift without a restoring force; the symmetric
        objective keeps the trajectory bounded. CPU-scale version of the
        measured 320x240 result (205 mm -> 46 mm)."""
        from gradslam_tpu.datasets import hard_sequence
        from gradslam_tpu.metrics.trajectory import ate_rmse
        from gradslam_tpu.slam import PointFusion

        B, L, H, W = 1, 18, 120, 160
        rgb, depths, intrinsics, poses = hard_sequence(
            B, L, H, W, outlier_frac=0.0)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(depths),
                        jnp.asarray(intrinsics), jnp.asarray(poses))
        ates = {}
        for sym in (False, True):
            pf = PointFusion(
                odom="gradicp", odom_assoc="projective", dsratio=4,
                numiters=10, map_capacity=L * H * W,
                motion_model="constant_velocity", robust_loss="tukey",
                robust_scale=0.03, dist_thresh=0.01,
                odom_angle_gate=60.0, odom_sym_normals=sym,
            )
            _, op = jax.jit(lambda f, pf=pf: pf(f))(fr)
            ates[sym] = float(ate_rmse(op[0], fr.poses[0]))
        assert ates[True] < 0.6 * ates[False]

    def test_validation(self):
        with pytest.raises(ValueError, match="point_weight"):
            ProjectiveOdometryProvider(point_weight=-1.0)
        from gradslam_tpu.slam import ICPSLAM as _S
        with pytest.raises(ValueError, match="projective"):
            _S(odom="gradicp", odom_sym_normals=True)
        with pytest.raises(ValueError, match="projective"):
            _S(odom="gradicp", odom_point_weight=1.0)
        with pytest.raises(ValueError, match="odom_point_weight"):
            _S(odom="gradicp", odom_assoc="projective",
               odom_point_weight=-0.5)


class TestHybridPyramid:
    def test_per_level_assoc_validation(self):
        from gradslam_tpu.slam import ICPSLAM as _S
        with pytest.raises(ValueError, match="per-level"):
            _S(odom="gradicp", odom_assoc=["projective", "knn"])
        with pytest.raises(ValueError, match="same length"):
            _S(odom="gradicp", odom_assoc=["projective"],
               pyramid=[(8, 4), (4, 2)])
        with pytest.raises(ValueError, match="level"):
            _S(odom="gradicp", odom_assoc=["projective", "nearest"],
               pyramid=[(8, 4), (4, 2)])

    def test_hybrid_tracks(self):
        """Coarse projective pre-alignment + fine KNN re-anchor: the hybrid
        must track the easy clip at KNN-grade accuracy (the committed
        320x240 hard-clip result: hybrid 18.6 mm vs pure projective
        176 mm vs pure KNN 14.3 mm)."""
        from __graft_entry__ import _synthetic_frames_arrays
        from gradslam_tpu.metrics.trajectory import ate_rmse
        from gradslam_tpu.slam import PointFusion

        B, L, H, W = 1, 12, 120, 160
        rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(depths),
                        jnp.asarray(intrinsics), jnp.asarray(poses))
        pf = PointFusion(
            odom="gradicp", pyramid=[(8, 6), (8, 4)],
            odom_assoc=["projective", "knn"], odom_sym_normals=True,
            map_capacity=L * H * W,
        )
        _, op = jax.jit(lambda f: pf(f))(fr)
        ate = float(ate_rmse(op[0], fr.poses[0]))
        assert ate < 5e-4


class TestProjectivePipelineGrad:
    def test_grad_through_tracked_projective_forward(self):
        """End-to-end gradients through the scanned projective pipeline
        (depth + intrinsics), incl. sym normals — the KNN-free mode keeps
        the differentiable-SLAM contract."""
        from __graft_entry__ import _synthetic_frames_arrays
        from gradslam_tpu.slam import PointFusion

        B, L, H, W = 1, 4, 32, 40
        rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
        rgb_j, poses_j = jnp.asarray(rgb), jnp.asarray(poses)
        slam = PointFusion(odom="gradicp", odom_assoc="projective",
                           odom_sym_normals=True, dsratio=2, numiters=3,
                           use_jit=False, map_capacity=L * H * W)

        def loss_fn(d, K):
            fr = RGBDImages(rgb_j, d, K, poses_j)
            pc, _ = slam.forward(fr)
            return jnp.sum(pc.points**2)

        g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(
            jnp.asarray(depths), jnp.asarray(intrinsics))
        gd = float(np.abs(np.asarray(g[0])).max())
        gk = float(np.abs(np.asarray(g[1])).max())
        assert np.isfinite(gd) and gd > 0
        assert np.isfinite(gk) and gk > 0


class TestNestedPyramidWindows:
    def test_carved_coarse_window_equals_direct_compaction(self):
        """_localize's nested-window fast path (one full-capacity compaction
        at the finest level, coarser windows carved from it) must produce
        EXACTLY the windows the direct per-level compaction produces —
        compact_masked is rank-order-preserving, so row sets AND order must
        match."""
        from gradslam_tpu.odometry.icputils import downsample_pointclouds
        from gradslam_tpu.slam.fusionutils import find_active_map_points
        from gradslam_tpu.structures.pointclouds import compact_masked

        frame = one_frame(H=48, W=64)
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        target = Pointclouds(points=pts, normals=nrm,
                             num_points=mask.sum(-1).astype(jnp.int32))
        active = find_active_map_points(target, frame)
        ds_fine, ds_coarse = 4, 8
        capf = 2 * -(-H // ds_fine) * -(-W // ds_fine)
        capc = 2 * -(-H // ds_coarse) * -(-W // ds_coarse)

        direct = downsample_pointclouds(
            target, active.valid, active.pix_h, active.pix_w,
            ds_coarse, capc)

        dt = pts.dtype
        packed = jnp.concatenate(
            [pts, nrm, active.pix_h[..., None].astype(dt),
             active.pix_w[..., None].astype(dt)], axis=-1)
        keep = (active.valid & (active.pix_h % ds_fine == 0)
                & (active.pix_w % ds_fine == 0))
        win8, counts = compact_masked(packed, keep, capf)
        rowmask = jnp.arange(capf, dtype=jnp.int32)[None] < counts[:, None]
        ph = win8[..., 6].astype(jnp.int32)
        pw = win8[..., 7].astype(jnp.int32)
        keep_c = rowmask & (ph % ds_coarse == 0) & (pw % ds_coarse == 0)
        sub, c_c = compact_masked(win8[..., :6], keep_c, capc)

        np.testing.assert_array_equal(np.asarray(c_c),
                                      np.asarray(direct.num_points))
        n = int(c_c[0])
        np.testing.assert_array_equal(np.asarray(sub[0, :n, :3]),
                                      np.asarray(direct.points[0, :n]))
        np.testing.assert_array_equal(np.asarray(sub[0, :n, 3:6]),
                                      np.asarray(direct.normals[0, :n]))

    def test_nested_pyramid_pipeline_tracks(self):
        """Pipeline smoke for the nested path (multi-level, divisible
        strides): tracking quality unchanged."""
        from __graft_entry__ import _synthetic_frames_arrays
        from gradslam_tpu.metrics.trajectory import ate_rmse
        from gradslam_tpu.slam import PointFusion

        B, L, H, W = 1, 10, 120, 160
        rgb, depths, intrinsics, poses = _synthetic_frames_arrays(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(depths),
                        jnp.asarray(intrinsics), jnp.asarray(poses))
        pf = PointFusion(odom="gradicp", pyramid=[(8, 6), (4, 2)],
                         map_capacity=L * H * W)
        _, op = jax.jit(lambda f: pf(f))(fr)
        ate = float(ate_rmse(op[0], fr.poses[0]))
        assert ate < 5e-4


class TestAnalyticPointBlock:
    """point_weight's normal-equation fold (VERDICT r4 #5): the analytic
    block must match the row-concatenating formulation it replaced — same
    AtA/Atb/err/guard-mass, hence the same solved step."""

    def _oracle_rows(self, s, d, valid, point_weight, loss, scale):
        from gradslam_tpu.odometry.icputils import _ptp_system

        w = point_weight ** 0.5
        eye3 = jnp.eye(3, dtype=s.dtype)
        blocks_A, blocks_b = [], []
        for k in range(3):
            ek = jnp.broadcast_to(w * eye3[k], s.shape)
            Ak, bk = _ptp_system(s, d, ek, valid, loss, scale * w)
            blocks_A.append(Ak)
            blocks_b.append(bk)
        return jnp.concatenate(blocks_A, 0), jnp.concatenate(blocks_b, 0)

    @pytest.mark.parametrize("loss,scale", [(None, 0.05), ("huber", 0.05),
                                            ("tukey", 0.03)])
    def test_block_matches_concatenated_rows(self, loss, scale):
        from gradslam_tpu.odometry.projective import _point_block_normal_eq

        rng = np.random.RandomState(0)
        N, pw = 257, 0.25
        s = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        d = s + jnp.asarray((rng.randn(N, 3) * 0.02).astype(np.float32))
        valid = jnp.asarray(rng.rand(N) > 0.3)
        A, b = self._oracle_rows(s, d, valid, pw, loss, scale)
        AtA_o = np.asarray(A.T @ A)
        Atb_o = np.asarray(A.T @ b)
        err_o = float(jnp.sum(b * b))
        mass_o = float(jnp.sum(A[:, :3] ** 2))
        AtA, Atb, err, mass = _point_block_normal_eq(s, d, valid, pw, loss,
                                                     scale)
        np.testing.assert_allclose(np.asarray(AtA), AtA_o, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Atb), Atb_o, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(float(err), err_o, rtol=1e-5)
        np.testing.assert_allclose(float(mass), mass_o, rtol=1e-5)

    def test_solved_step_matches_row_formulation(self):
        """Full composed system (plane rows + point block): the 6-vector
        solved from the analytic normal equations equals the one solved
        from the concatenated (4N, 6) row system."""
        from gradslam_tpu.odometry.icputils import _ptp_system
        from gradslam_tpu.odometry.projective import _point_block_normal_eq

        rng = np.random.RandomState(1)
        N, pw, loss, scale, damp = 181, 0.25, "tukey", 0.03, 1e-6
        s = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        d = s + jnp.asarray((rng.randn(N, 3) * 0.01).astype(np.float32))
        n = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        valid = jnp.asarray(rng.rand(N) > 0.2)
        A_pl, b_pl = _ptp_system(s, d, n, valid, loss, scale)
        A_pt, b_pt = self._oracle_rows(s, d, valid, pw, loss, scale)
        A = jnp.concatenate([A_pl, A_pt], 0)
        b = jnp.concatenate([b_pl, b_pt], 0)
        from gradslam_tpu.odometry.icputils import solve_linear_system

        xi_rows = solve_linear_system(A, b, damp)
        AtA, Atb, _, _ = _point_block_normal_eq(s, d, valid, pw, loss, scale)
        from gradslam_tpu.utils.precision import matmul_hp

        AtA = AtA + matmul_hp(A_pl.T, A_pl) + damp * jnp.eye(6)
        Atb = Atb + matmul_hp(A_pl.T, b_pl)
        xi_ne = jnp.linalg.solve(AtA, Atb)
        np.testing.assert_allclose(np.asarray(xi_ne), np.asarray(xi_rows),
                                   rtol=1e-3, atol=1e-6)


class TestSubpixel:
    def test_subpixel_exact_on_planar_scene_off_grid(self):
        """On a flat wall the vertex map is linear in the pixel, so the
        bilinear lookup is EXACT for off-lattice projections while the
        nearest-pixel lookup carries up to half a pixel of in-plane error
        (the quantization floor odom_subpixel removes; design.md §4)."""
        H, W = 48, 64
        fx = fy = 50.0
        cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
        K = jnp.asarray(
            [[[[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]]]],
            jnp.float32)
        depth = jnp.full((1, 1, H, W, 1), 2.0, jnp.float32)  # flat wall z=2
        rgb = jnp.zeros((1, 1, H, W, 3), jnp.float32)
        pose = jnp.eye(4, dtype=jnp.float32)[None, None]
        frame = RGBDImages(rgb, depth, K, pose)
        geom = frame_geom_of(frame)
        # continuous wall points landing at pixel centers + (0.5, 0.5)
        rng = np.random.RandomState(0)
        uu = rng.uniform(8, W - 8, 500).astype(np.float32) + 0.5
        vv = rng.uniform(8, H - 8, 500).astype(np.float32) + 0.5
        z = 2.0
        pts = jnp.asarray(
            np.stack([(uu - cx) / fx * z, (vv - cy) / fy * z,
                      np.full_like(uu, z)], -1))
        nrm = jnp.asarray(np.tile([0.0, 0.0, -1.0], (500, 1)).astype(
            np.float32))
        mask = jnp.ones(500, bool)
        errs = {}
        for sp in (False, True):
            s, valid, _ = projective_associate(
                pts, nrm, mask, geom, K[0, 0], pose[0, 0], H, W,
                subpixel=sp)
            assert bool(jnp.all(valid))
            errs[sp] = float(jnp.max(jnp.linalg.norm(s - pts, axis=-1)))
        # nearest: ~half-pixel * z/f = 0.5 * 2/50 = 0.02 m; bilinear: exact
        assert errs[False] > 0.01
        assert errs[True] < 1e-5

    def test_solver_recovery_with_subpixel(self):
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        maps_pc = Pointclouds(points=pts, normals=nrm,
                              num_points=mask.sum(-1).astype(jnp.int32))
        order = jnp.argsort(~mask[0])
        maps_pc = dataclasses.replace(
            maps_pc, points=pts[:, order], normals=nrm[:, order])
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.008]))
        init = (delta @ true_pose)[None, None]
        prov = ProjectiveOdometryProvider(numiters=15, subpixel=True)
        X = prov.provide(maps_pc, frame.with_poses(init))
        solved = np.asarray(X[0, 0] @ init[0, 0])
        np.testing.assert_allclose(solved, np.asarray(true_pose), atol=2e-3)

    def test_subpixel_point_rows_beat_nearest_point_rows(self):
        """The half-pixel floor the point rows inherit from nearest-pixel
        association (TestSymNormalsAndPointRows atol=0.03) drops with the
        bilinear lookup: same solve, tighter recovery."""
        frame = one_frame()
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)
        nrm = frame.global_normal_map.reshape(1, H * W, 3)
        mask = frame.valid_depth_mask.reshape(1, H * W)
        maps_pc = Pointclouds(points=pts, normals=nrm,
                              num_points=mask.sum(-1).astype(jnp.int32))
        order = jnp.argsort(~mask[0])
        maps_pc = dataclasses.replace(
            maps_pc, points=pts[:, order], normals=nrm[:, order])
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.008]))
        init = (delta @ true_pose)[None, None]
        errs = {}
        for sp in (False, True):
            prov = ProjectiveOdometryProvider(numiters=15, point_weight=0.25,
                                              subpixel=sp)
            X = prov.provide(maps_pc, frame.with_poses(init))
            errs[sp] = float(np.abs(
                np.asarray(X[0, 0] @ init[0, 0]) - np.asarray(true_pose)
            ).max())
        assert errs[True] < 0.5 * errs[False]
        assert errs[True] < 5e-3

    def test_pipeline_and_validation(self):
        B, L, H, W = 1, 6, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        ates = {}
        for sp in (False, True):
            pf = PointFusion(odom="gradicp", odom_assoc="projective",
                             odom_sym_normals=True, odom_subpixel=sp,
                             dsratio=2, numiters=8, map_capacity=L * H * W)
            _, op = jax.jit(lambda f, pf=pf: pf(f))(fr)
            ates[sp] = float(ate_rmse(op[0], fr.poses[0]))
        assert ates[True] < 2e-3
        assert ates[True] <= max(1.2 * ates[False], 1e-4)
        with pytest.raises(ValueError, match="odom_subpixel"):
            ICPSLAM(odom="gradicp", odom_assoc="knn", odom_subpixel=True)

    def test_subpixel_differentiable(self):
        """The bilinear weights depend on the pose/depth, so gradients flow
        through the sub-pixel association too."""
        frame = one_frame(H=32, W=40)
        _, _, H, W = frame.shape
        pts = frame.global_vertex_map.reshape(1, H * W, 3)[0]
        nrm = frame.global_normal_map.reshape(1, H * W, 3)[0]
        true_pose = frame.poses[0, 0]
        delta = se3_exp(jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.01, 0.0]))
        init = delta @ true_pose

        def loss(depth):
            fr = dataclasses.replace(frame, depth_image=depth)
            geom = frame_geom_of(fr)
            X = point_to_plane_gradICP_projective(
                pts, nrm, jnp.ones(pts.shape[0], bool), geom,
                fr.intrinsics[0, 0], init, H, W, numiters=4, subpixel=True,
            )
            return jnp.sum((X @ init - true_pose) ** 2)

        g = jax.grad(loss)(frame.depth_image)
        ga = np.asarray(g)
        assert np.isfinite(ga).all()
        assert np.abs(ga).max() > 0
