import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import ICPSLAM, PointFusion, Pointclouds, RGBDImages

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data", "ref_golden")


def make_frames(msrd, B=2, L=3):
    return RGBDImages(
        rgb_image=jnp.asarray(msrd["colors"][:B, :L]),
        depth_image=jnp.asarray(msrd["depths"][:B, :L]),
        intrinsics=jnp.asarray(msrd["intrinsics"][:B]),
        poses=jnp.asarray(msrd["poses"][:B, :L]),
    )


def chamfer(a, b):
    # Exact symmetric chamfer via KD-trees: the naive broadcast builds an
    # |a| x |b| x 3 intermediate (~10 GB for the 30k-point golden maps) and
    # took ~30 minutes of the suite's runtime; this is ~0.3 s.
    from scipy.spatial import cKDTree

    a = np.asarray(a)
    b = np.asarray(b)
    da, _ = cKDTree(b).query(a, workers=-1)
    db, _ = cKDTree(a).query(b, workers=-1)
    return da.mean() + db.mean()


class TestICPSLAMGt:
    def test_aggregate_counts(self, msrd):
        slam = ICPSLAM(odom="gt")
        pc, poses = slam(make_frames(msrd))
        valid = (msrd["depths"] > 0).reshape(2, -1).sum(-1)
        np.testing.assert_array_equal(np.asarray(pc.num_points), valid)
        np.testing.assert_allclose(np.asarray(poses), msrd["poses"], atol=1e-6)

    def test_requires_poses(self, msrd):
        slam = ICPSLAM(odom="gt")
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
        )
        with pytest.raises(ValueError):
            slam(frames)

    def test_invalid_odom_raises(self):
        with pytest.raises(ValueError):
            ICPSLAM(odom="bogus")


class TestPointFusionGt:
    def test_reference_parity(self, msrd):
        """End-to-end PointFusion(gt) map must match the reference run
        (golden generated via scripts/reference_shim.py)."""
        slam = PointFusion(odom="gt")
        pc, _ = slam(make_frames(msrd))
        for b in range(2):
            ref_pts = np.load(os.path.join(GOLDEN, f"pointfusion_gt_points_{b}.npy"))
            ours = pc.points_list[b]
            # point counts within 0.2% (fp-sensitive threshold gating)
            assert abs(len(ours) - len(ref_pts)) / len(ref_pts) < 0.002
            assert chamfer(ours, ref_pts) < 1e-3
        # confidence mass matches
        ref_cc = np.load(os.path.join(GOLDEN, "pointfusion_gt_ccounts_0.npy"))
        np.testing.assert_allclose(
            np.asarray(pc.features_list[0]).sum(), ref_cc.sum(), rtol=1e-4
        )

    def test_step_equals_forward(self, msrd):
        """Online step() must produce the same map as the scanned forward."""
        frames = make_frames(msrd)
        slam = PointFusion(odom="gt", map_capacity=3 * 120 * 160)
        pc_fwd, _ = slam(frames)

        pc = Pointclouds.empty(2, 3 * 120 * 160)
        for s in range(3):
            pc, _ = slam.step(pc, frames[:, s])
        np.testing.assert_array_equal(
            np.asarray(pc.num_points), np.asarray(pc_fwd.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(pc.points), np.asarray(pc_fwd.points), atol=1e-5
        )

    def test_differentiable_end_to_end(self, msrd):
        """Gradients flow from the map back to the raw depth (the gradSLAM
        selling point; the reference never tests this end-to-end)."""
        frames = make_frames(msrd, B=1, L=2)
        slam = PointFusion(odom="gt", use_jit=False)

        def loss(depth):
            fr = RGBDImages(frames.rgb_image, depth, frames.intrinsics, frames.poses)
            pc, _ = slam(fr)
            return jnp.sum(pc.points**2)

        g = jax.grad(loss)(frames.depth_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestPruneInPipeline:
    """Periodic in-scan map maintenance (prune_every)."""

    def test_matches_manual_step_plus_prune(self, msrd):
        from gradslam_tpu.slam import prune_map

        frames = make_frames(msrd)
        cap = 3 * 120 * 160
        thr = 1.5
        pruned = PointFusion(
            odom="gt", map_capacity=cap, prune_every=2, prune_min_confidence=thr
        )
        pc_auto, _ = pruned(frames)

        plain = PointFusion(odom="gt", map_capacity=cap)
        pc = plain.empty_map(2, cap)
        for s in range(3):
            pc, _ = plain.step(pc, frames[:, s])
            if (s + 1) % 2 == 0:
                pc = prune_map(pc, thr)
        np.testing.assert_array_equal(
            np.asarray(pc_auto.num_points), np.asarray(pc.num_points)
        )
        for b in range(2):
            np.testing.assert_allclose(
                pc_auto.points_list[b], pc.points_list[b], atol=1e-6
            )

    def test_prune_segments_arithmetic(self):
        """_prune_segments must tile the run exactly and flag precisely the
        global frames g with (g + 1) % prune_every == 0 (the boundaries the
        old in-scan lax.cond fired on)."""
        for k in (1, 2, 3, 4, 7):
            slam = PointFusion(
                odom="gt", map_capacity=64, prune_every=k,
                prune_min_confidence=1.5,
            )
            for start, n in ((0, 9), (1, 8), (3, 5), (5, 1), (4, 12)):
                segs = slam._prune_segments(start, n)
                assert sum(s for s, _ in segs) == n
                g = start
                fired = []
                for sub_n, prune_after in segs:
                    g += sub_n
                    # a flagged sub-scan must END on a boundary frame
                    if prune_after:
                        assert g % k == 0, (start, n, k, segs)
                        fired.append(g - 1)
                expect = [g for g in range(start, start + n)
                          if (g + 1) % k == 0]
                assert fired == expect, (start, n, k, segs)
        nop = PointFusion(odom="gt", map_capacity=64)
        assert nop._prune_segments(2, 7) == [(7, False)]

    def test_prune_with_capacity_schedule(self):
        """prune_every composed with a capacity schedule: the segment-cut
        scan must equal the manual step+prune+with_capacity loop even when
        prune boundaries straddle schedule segments."""
        from gradslam_tpu.datasets import synthetic_sequence
        from gradslam_tpu.slam import prune_map

        B, L, H, W = 1, 9, 60, 80
        rgb, depths, intrinsics, poses = synthetic_sequence(B, L, H, W)
        frames = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(intrinsics),
            jnp.asarray(poses),
        )
        cap_a, cap_b = 4 * H * W, 9 * H * W
        sched = [(4, cap_a), (5, cap_b)]
        thr = 0.5
        auto = PointFusion(
            odom="gt", map_capacity=sched, prune_every=2,
            prune_min_confidence=thr,
        )
        pc_auto, _ = auto(frames)

        plain = PointFusion(odom="gt", map_capacity=cap_a)
        pc = plain.empty_map(B, cap_a)
        for s in range(L):
            if s == 4:
                pc = pc.with_capacity(cap_b)
            pc, _ = plain.step(pc, frames[:, s])
            if (s + 1) % 2 == 0:
                pc = prune_map(pc, thr)
        np.testing.assert_array_equal(
            np.asarray(pc_auto.num_points), np.asarray(pc.num_points)
        )
        assert int(pc_auto.num_points[0]) > 0
        np.testing.assert_allclose(
            pc_auto.points_list[0], pc.points_list[0], atol=1e-6
        )

    def test_prune_is_differentiable(self, msrd):
        """The production map-maintenance knob must not break the
        differentiability flagship: gradients flow from the pruned map
        back to the raw depth through the segment-boundary prunes."""
        frames = make_frames(msrd, B=1, L=3)
        slam = PointFusion(
            odom="gt", use_jit=False, map_capacity=3 * 120 * 160,
            prune_every=2, prune_min_confidence=0.5,
        )

        def loss(depth):
            fr = RGBDImages(
                frames.rgb_image, depth, frames.intrinsics, frames.poses
            )
            pc, _ = slam(fr)
            return jnp.sum(pc.points**2)

        g = jax.grad(loss)(frames.depth_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_prune_shrinks_map(self, msrd):
        frames = make_frames(msrd)
        cap = 3 * 120 * 160
        plain = PointFusion(odom="gt", map_capacity=cap)
        # prune_every=1 with a threshold above the per-frame alpha would wipe
        # the map every frame (every new point starts below it); pruning every
        # 2nd frame keeps twice-observed (stable) points.
        pruned = PointFusion(
            odom="gt", map_capacity=cap, prune_every=2, prune_min_confidence=1.5
        )
        n_plain = np.asarray(plain(frames)[0].num_points)
        n_pruned = np.asarray(pruned(frames)[0].num_points)
        assert (n_pruned < n_plain).all()
        assert (n_pruned > 0).all()

    def test_icpslam_rejects_prune(self):
        with pytest.raises(ValueError):
            ICPSLAM(odom="gt", prune_every=2)
        with pytest.raises(ValueError):
            PointFusion(odom="gt", prune_every=-1)


class TestOdometrySLAM:
    """SLAM with ICP/GradICP odometry on downsampled golden frames."""

    @pytest.mark.parametrize("odom", ["icp", "gradicp"])
    @pytest.mark.slow
    def test_tracks_near_gt(self, msrd, odom):
        # downsample frames 2x for speed
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"][:1, :, ::2, ::2]),
            depth_image=jnp.asarray(msrd["depths"][:1, :, ::2, ::2]),
            intrinsics=jnp.asarray(msrd["intrinsics"][:1]) @ jnp.diag(jnp.asarray([0.5, 0.5, 1.0, 1.0])),
            poses=jnp.asarray(msrd["poses"][:1]),
        )
        # fix intrinsics scaling (cx, cy also scale)
        K = np.asarray(msrd["intrinsics"][:1]).copy()
        K[..., 0, :] *= 0.5
        K[..., 1, :] *= 0.5
        frames = RGBDImages(
            frames.rgb_image, frames.depth_image, jnp.asarray(K), frames.poses
        )
        slam = PointFusion(odom=odom, dsratio=2, numiters=10)
        pc, poses = slam(frames)
        # camera motion in this clip is small; tracked poses should stay close
        # to ground truth
        gt = msrd["poses"][:1]
        err = np.abs(np.asarray(poses) - gt).max()
        assert err < 0.05, f"pose error {err}"
        assert np.all(np.isfinite(np.asarray(pc.points)))


class TestTrackedTrajectoryParity:
    """North-star accuracy criterion (BASELINE.md): ATE-RMSE parity with the
    reference's tracked SLAM on the golden clip. Reference trajectories were
    generated with scripts/reference_shim.py."""

    @pytest.mark.parametrize("odom", ["icp", "gradicp"])
    @pytest.mark.slow
    def test_poses_match_reference(self, msrd, odom):
        from gradslam_tpu.metrics import ate_rmse

        frames = make_frames(msrd)
        slam = PointFusion(odom=odom, dsratio=4, numiters=20)
        _, poses = slam(frames)
        ref = np.load(os.path.join(GOLDEN, f"pointfusion_{odom}_poses.npy"))
        # trajectories agree to sub-mm on this clip
        assert np.abs(np.asarray(poses) - ref).max() < 2e-3
        # and the ATE against ground truth matches the reference's ATE
        gt = jnp.asarray(msrd["poses"])
        for b in range(2):
            ate_ours = float(ate_rmse(poses[b], gt[b], align=False))
            ate_ref = float(ate_rmse(jnp.asarray(ref[b]), gt[b], align=False))
            assert abs(ate_ours - ate_ref) < 1e-4, (ate_ours, ate_ref)


class TestTrackedDifferentiability:
    """The gradSLAM thesis: gradients flow through the full tracked pipeline —
    GradICP odometry + fusion — from the trajectory back to raw depth."""

    @pytest.mark.slow
    def test_grad_of_trajectory_wrt_depth_through_gradicp(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"][:1, :2, ::4, ::4]),
            depth_image=jnp.asarray(msrd["depths"][:1, :2, ::4, ::4]),
            intrinsics=jnp.asarray(
                np.diag([0.25, 0.25, 1.0, 1.0]).astype(np.float32) @ msrd["intrinsics"][:1]
            ),
            poses=jnp.asarray(msrd["poses"][:1, :2]),
        )
        slam = PointFusion(odom="gradicp", dsratio=2, numiters=4, use_jit=False)

        def loss(depth):
            fr = RGBDImages(frames.rgb_image, depth, frames.intrinsics, frames.poses)
            pc, poses = slam.forward(fr)
            # trajectory loss (e.g., against an external signal)
            return jnp.sum(poses[:, -1, :3, 3] ** 2)

        g = jax.grad(loss)(frames.depth_image)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert float(np.abs(g).max()) > 0, "no gradient reached the depth map"


class TestRemat:
    @pytest.mark.slow
    def test_remat_forward_matches_and_grads_flow(self, msrd):
        frames = make_frames(msrd, B=1, L=3)
        base = PointFusion(odom="gt", use_jit=False)
        slam = PointFusion(odom="gt", use_jit=False, remat=True)
        pc0, poses0 = base(frames)
        pc1, poses1 = slam(frames)
        np.testing.assert_array_equal(
            np.asarray(pc0.num_points), np.asarray(pc1.num_points)
        )
        np.testing.assert_allclose(
            np.asarray(pc0.points), np.asarray(pc1.points), atol=1e-6
        )

        def loss(depth):
            fr = RGBDImages(frames.rgb_image, depth, frames.intrinsics, frames.poses)
            pc, _ = slam(fr)
            return jnp.sum(pc.points**2)

        g = jax.grad(loss)(frames.depth_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestNoRetrace:
    def test_step_does_not_retrace_on_same_shapes(self, msrd):
        """Repeated step() calls with same-shaped inputs must reuse the
        compiled program (a retrace would silently destroy throughput)."""
        frames = make_frames(msrd, B=1, L=2)
        slam = PointFusion(odom="gradicp", dsratio=4, numiters=2, map_capacity=1024)
        pc = Pointclouds.empty(1, 1024)
        pc, _ = slam.step(pc, frames[:, 1], frames[:, 0])
        n_compiles = slam._step._cache_size()
        for _ in range(3):
            pc, _ = slam.step(pc, frames[:, 1], frames[:, 0])
        assert slam._step._cache_size() == n_compiles


class TestCapacitySchedule:
    """map_capacity=[(frames, cap), ...] — amortized map growth: per-segment
    scans with growing buffers must match the fixed-capacity run exactly
    (provided no segment overflows)."""

    @pytest.mark.parametrize(
        "cls,kw",
        [
            (PointFusion, dict(odom="gt")),
            (PointFusion, dict(odom="gradicp", dsratio=2, numiters=4)),
            (ICPSLAM, dict(odom="icp", dsratio=2, numiters=4)),
        ],
    )
    @pytest.mark.slow
    def test_schedule_equals_fixed(self, synthetic_clip, cls, kw):
        frames = synthetic_clip(B=1, L=6, H=24, W=32)
        H, W = 24, 32
        fixed = cls(map_capacity=4 * H * W, **kw)
        sched = cls(map_capacity=[(2, 2 * H * W), (4, 4 * H * W)], **kw)
        pc1, tr1 = fixed(frames)
        pc2, tr2 = sched(frames)
        n1, n2 = int(pc1.num_points[0]), int(pc2.num_points[0])
        assert n1 == n2
        np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pc1.points[:, :n1]), np.asarray(pc2.points[:, :n2]),
            atol=1e-6,
        )

    def test_schedule_validation(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=5, H=16, W=16)
        with pytest.raises(ValueError):  # decreasing capacities
            PointFusion(odom="gt", map_capacity=[(2, 100), (3, 50)])(frames)
        with pytest.raises(ValueError):  # wrong frame coverage
            PointFusion(odom="gt", map_capacity=[(2, 100)])(frames)
        with pytest.raises(ValueError):  # non-positive entries
            PointFusion(odom="gt", map_capacity=[(0, 100), (5, 100)])(frames)

    def test_with_capacity_grow_only(self):
        pc = Pointclouds.empty(2, 8)
        grown = pc.with_capacity(16)
        assert grown.capacity == 16 and len(grown) == 2
        assert grown.with_capacity(16) is grown
        with pytest.raises(ValueError):
            grown.with_capacity(8)


class TestPyramid:
    """Coarse-to-fine odometry (pyramid=[(dsratio, numiters), ...]): each
    level warm-starts the next via the provider's initial_transform."""

    def test_single_level_equals_flat(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=4, H=16, W=24)
        flat = ICPSLAM(odom="icp", dsratio=2, numiters=4)
        pyr = ICPSLAM(odom="icp", pyramid=[(2, 4)])
        _, tr_flat = flat(frames)
        _, tr_pyr = pyr(frames)
        np.testing.assert_array_equal(np.asarray(tr_pyr), np.asarray(tr_flat))

    @pytest.mark.slow
    def test_coarse_to_fine_tracks(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=5, H=32, W=48)
        gt = np.asarray(frames.poses)
        pyr = PointFusion(odom="gradicp", pyramid=[(4, 6), (2, 4)])
        _, tr = pyr(frames)
        err = np.abs(np.asarray(tr) - gt).max()
        # must track GT comparably to an all-fine solve of larger cost
        flat = PointFusion(odom="gradicp", dsratio=2, numiters=10)
        _, tr_flat = flat(frames)
        err_flat = np.abs(np.asarray(tr_flat) - gt).max()
        assert err < max(2 * err_flat, 5e-3), (err, err_flat)

    def test_warm_start_included_in_result(self, synthetic_clip):
        # provider contract: the returned transform includes initial_transform
        import jax.numpy as jnp

        from gradslam_tpu.odometry import ICPOdometryProvider
        from gradslam_tpu.odometry.icputils import downsample_rgbdimages

        frames = synthetic_clip(B=1, L=2, H=16, W=24)
        src = downsample_rgbdimages(frames[:, 1], 2)
        tgt = downsample_rgbdimages(frames[:, 0], 2)
        prov = ICPOdometryProvider(numiters=4)
        t_cold = prov.provide(tgt, src)
        t_warm = prov.provide(tgt, src, initial_transform=t_cold[:, 0])
        # warm start from the converged solution stays at (close to) it
        np.testing.assert_allclose(
            np.asarray(t_warm), np.asarray(t_cold), atol=1e-3
        )

    def test_tracked_step_equals_forward(self, synthetic_clip):
        """Online step() with pyramid odometry must reproduce the scanned
        forward trajectory (tracked-odometry online parity)."""
        L = 4
        frames = synthetic_clip(B=1, L=L, H=16, W=24)
        slam = ICPSLAM(odom="icp", pyramid=[(2, 3)], map_capacity=L * 16 * 24)
        _, tr_fwd = slam(frames)

        pc = slam.empty_map(1, L * 16 * 24)
        pc, poses = slam.step(pc, frames[:, 0])  # bootstrap: live pose
        traj = [poses]
        for s in range(1, L):
            prev = frames[:, s - 1].with_poses(traj[-1])
            pc, poses = slam.step(pc, frames[:, s], prev)
            traj.append(poses)
        tr_online = np.concatenate([np.asarray(p) for p in traj], axis=1)
        np.testing.assert_allclose(tr_online, np.asarray(tr_fwd), atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", pyramid=[])
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", pyramid=[(0, 4)])
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", pyramid=[(4, 0)])
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", pyramid="nope")


class TestProductionStack:
    """All opt-in odometry levers composed (the bench production configs):
    window + pyramid + robust + reuse lookahead must track and not drop."""

    def test_icpslam_full_stack(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=6, H=16, W=24)
        gt = np.asarray(frames.poses)
        slam = ICPSLAM(
            odom="icp", pyramid=[(4, 4), (2, 3)], icp_window_frames=2,
            robust_loss="huber", lookahead_assoc="reuse",
        )
        pc, tr = slam(frames)
        assert int(np.asarray(pc.num_dropped).sum()) == 0
        assert np.abs(np.asarray(tr) - gt).max() < 5e-3

    def test_pointfusion_full_stack(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=5, H=16, W=24)
        gt = np.asarray(frames.poses)
        slam = PointFusion(
            odom="gradicp", pyramid=[(4, 4), (2, 3)], robust_loss="tukey",
            robust_scale=0.1, lookahead_assoc="reuse", quantize_colors=True,
        )
        pc, tr = slam(frames)
        assert int(np.asarray(pc.num_dropped).sum()) == 0
        assert np.abs(np.asarray(tr) - gt).max() < 5e-3
        # quantized layout round-trips through decode_map
        dec = PointFusion.decode_map(pc)
        assert dec.colors is not None and dec.features.shape[-1] == 1


class TestICPWindowFrames:
    """icp_window_frames: odometry associates against the most recent
    window of the append-ordered map instead of projecting the whole map."""

    def test_full_window_is_exact(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=5, H=16, W=24)
        ref = ICPSLAM(odom="icp", dsratio=2, numiters=4)
        win = ICPSLAM(odom="icp", dsratio=2, numiters=4, icp_window_frames=5)
        _, tr_ref = ref(frames)
        _, tr_win = win(frames)
        # window covers every mapped frame -> identical target set, but row
        # ORDER may differ (slice offset), so compare trajectories tightly
        np.testing.assert_allclose(
            np.asarray(tr_win), np.asarray(tr_ref), atol=1e-5
        )

    def test_tight_window_still_tracks(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=6, H=16, W=24)
        gt = np.asarray(frames.poses)
        ref = ICPSLAM(odom="icp", dsratio=2, numiters=6)
        win = ICPSLAM(odom="icp", dsratio=2, numiters=6, icp_window_frames=2)
        _, tr_ref = ref(frames)
        _, tr_win = win(frames)
        err_ref = np.abs(np.asarray(tr_ref) - gt).max()
        err_win = np.abs(np.asarray(tr_win) - gt).max()
        # the 2-frame recency window must track ground truth at least as
        # well as full-map association (measured: it tracks BETTER here —
        # 4e-4 vs 2e-2 — stale duplicated aggregate points bias the solver)
        assert err_win <= err_ref + 1e-3, (err_win, err_ref)
        assert err_win < 5e-3, err_win

    def test_pointfusion_rejects_window(self):
        # PointFusion merges revisited surface in place into OLD rows, so
        # the most-recent buffer rows hold exactly the points a frame does
        # NOT overlap — a recency window there wrecks tracking (measured
        # 232x worse). The constructor must fail loudly.
        with pytest.raises(ValueError, match="icp_window_frames"):
            PointFusion(odom="gradicp", icp_window_frames=2)

    def test_validation(self):
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", icp_window_frames=0)


class TestQuantizedColors:
    """Opt-in quantized-color map layout (PointFusion(quantize_colors=True)):
    geometry/trajectory/counts must be EXACTLY the float-color path's;
    colors 8-bit-quantized (max error ~1/255 plus accumulation)."""

    @pytest.mark.parametrize(
        "kw",
        [
            dict(odom="gt"),
            dict(odom="gradicp", dsratio=2, numiters=4),
        ],
    )
    @pytest.mark.slow
    def test_matches_exact_path(self, synthetic_clip, kw):
        frames = synthetic_clip(B=2, L=5, H=24, W=32)
        cap = 5 * 24 * 32
        exact = PointFusion(map_capacity=cap, **kw)
        quant = PointFusion(map_capacity=cap, quantize_colors=True, **kw)
        pc1, tr1 = exact(frames)
        pc2, tr2 = quant(frames)
        np.testing.assert_array_equal(
            np.asarray(pc1.num_points), np.asarray(pc2.num_points)
        )
        np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2), atol=1e-6)
        n = int(pc1.num_points[0])
        np.testing.assert_allclose(
            np.asarray(pc1.points[0, :n]), np.asarray(pc2.points[0, :n]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pc1.features[0, :n, 0]),
            np.asarray(pc2.features[0, :n, 0]),
            atol=1e-6,
        )
        dec = PointFusion.decode_map(pc2)
        assert dec.colors is not None and dec.features.shape[-1] == 1
        np.testing.assert_allclose(
            np.asarray(pc1.colors[0, :n]), np.asarray(dec.colors[0, :n]),
            atol=0.02,
        )

    @pytest.mark.parametrize("merge", ["scatter", "gather"])
    def test_merge_modes_agree(self, synthetic_clip, merge):
        frames = synthetic_clip(B=1, L=4, H=16, W=24)
        cap = 4 * 16 * 24
        ref = PointFusion(odom="gt", map_capacity=cap, quantize_colors=True)
        alt = PointFusion(
            odom="gt", map_capacity=cap, quantize_colors=True, merge=merge
        )
        pc1, _ = ref(frames)
        pc2, _ = alt(frames)
        n = int(pc1.num_points[0])
        assert n == int(pc2.num_points[0])
        np.testing.assert_allclose(
            np.asarray(pc1.points[0, :n]), np.asarray(pc2.points[0, :n]),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(pc1.features[0, :n, 1]),
            np.asarray(pc2.features[0, :n, 1]),
        )

    def test_pack_unpack_roundtrip(self):
        from gradslam_tpu.slam.fusionutils import pack_colors, unpack_colors

        rng = np.random.RandomState(0)
        c = jnp.asarray(rng.rand(100, 3).astype(np.float32))
        packed = pack_colors(c)
        out = unpack_colors(packed)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(c), atol=0.5 / 255.0 + 1e-6
        )
        # exact on already-quantized values
        np.testing.assert_array_equal(
            np.asarray(pack_colors(out)), np.asarray(packed)
        )

    def test_decode_map_noop_on_float_maps(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=2, H=16, W=24)
        pc, _ = PointFusion(odom="gt", map_capacity=2 * 16 * 24)(frames)
        assert PointFusion.decode_map(pc) is pc

    def test_save_ply_colors_within_one_uchar_step(self, synthetic_clip, tmp_path):
        """PLY export is 8-bit uchar — the quantized map's exported colors sit
        within ONE uchar step of the exact path's (merged points re-quantize
        per frame, so exact equality only holds for single-observation
        points); geometry is bit-identical."""
        from gradslam_tpu.structures import load_ply

        frames = synthetic_clip(B=1, L=3, H=16, W=24)
        cap = 3 * 16 * 24
        pc1, _ = PointFusion(odom="gt", map_capacity=cap)(frames)
        pc2, _ = PointFusion(
            odom="gt", map_capacity=cap, quantize_colors=True
        )(frames)
        p1, p2 = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
        pc1.save_ply(p1)
        PointFusion.decode_map(pc2).save_ply(p2)
        a, b = load_ply(p1), load_ply(p2)
        np.testing.assert_array_equal(a["points"], b["points"])
        diff = np.abs(
            np.round(a["colors"] * 255) - np.round(b["colors"] * 255)
        )
        assert diff.max() <= 1, diff.max()


class TestOverflowAccounting:
    """VERDICT r1 #3: a too-small map_capacity must be detectable from the
    returned state, pipelines included — never a silently truncated map."""

    def test_pipeline_surfaces_dropped_rows(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=4, H=16, W=24)
        tiny = PointFusion(odom="gt", map_capacity=100)
        pc, _ = tiny(frames)
        assert pc.num_dropped is not None
        assert int(pc.num_dropped[0]) > 0
        assert int(pc.num_points[0]) == 100  # buffer filled to the brim

    def test_pipeline_zero_drops_at_sufficient_capacity(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=4, H=16, W=24)
        slam = PointFusion(odom="gt", map_capacity=4 * 16 * 24)
        pc, _ = slam(frames)
        np.testing.assert_array_equal(np.asarray(pc.num_dropped), [0])

    def test_capacity_schedule_overflow_detectable(self, synthetic_clip):
        frames = synthetic_clip(B=1, L=4, H=16, W=24)
        sched = PointFusion(odom="gt", map_capacity=[(2, 50), (2, 4 * 16 * 24)])
        pc, _ = sched(frames)
        assert int(pc.num_dropped[0]) > 0  # first segment overflowed


class TestReviewRegressions:
    """Round-2 code-review regressions (tracked L==1, dsratio validation,
    jitted gt step)."""

    @pytest.mark.parametrize("odom", ["icp", "gradicp"])
    def test_tracked_single_frame_sequence(self, synthetic_clip, odom):
        # L == 1 means no scan segment runs — forward must return the
        # bootstrap frame's map and pose instead of crashing on an empty
        # chunk list.
        frames = synthetic_clip(B=1, L=1, H=16, W=24)
        slam = PointFusion(odom=odom, dsratio=2, numiters=2)
        pc, poses = slam(frames)
        assert poses.shape == (1, 1, 4, 4)
        np.testing.assert_allclose(
            np.asarray(poses[:, 0]), np.asarray(frames.poses[:, 0]), atol=1e-6
        )
        assert int(pc.num_points[0]) > 0

    def test_dsratio_validated(self):
        with pytest.raises(ValueError, match="dsratio"):
            ICPSLAM(odom="icp", dsratio=0)
        with pytest.raises(ValueError, match="dsratio"):
            PointFusion(odom="gradicp", dsratio=-2)

    def test_step_warns_on_misused_prev_frame(self, synthetic_clip):
        # Reference parity (icpslam.py:219-230): a forgotten prev_frame with
        # tracked odometry quietly fuses at the stale live pose — warn once
        # the map is non-empty; odom='gt' with a prev_frame warns it's
        # unused. Frame-0 bootstrap (empty map) must NOT warn.
        import warnings as _w

        frames = synthetic_clip(B=1, L=2, H=16, W=24)
        slam = PointFusion(odom="gradicp", dsratio=2, numiters=2)
        empty = slam.empty_map(1, 2 * 16 * 24)
        with _w.catch_warnings():
            _w.simplefilter("error")  # bootstrap: no warning
            pc, _ = slam.step(empty, frames[:, 0])
        with pytest.warns(UserWarning, match="prev_frame.*was None"):
            slam.step(pc, frames[:, 1])
        gt = PointFusion(odom="gt")
        with pytest.warns(UserWarning, match="not used"):
            gt.step(gt.empty_map(1, 2 * 16 * 24), frames[:, 1], frames[:, 0])

    def test_gt_step_uses_jitted_map(self, synthetic_clip):
        # step()'s gt branch must dispatch one compiled program, not the
        # fusion pipeline op-by-op (an order of magnitude slower online).
        slam = PointFusion(odom="gt")
        assert hasattr(slam._map_only, "lower")  # jax.jit wrapper
        eager = PointFusion(odom="gt", use_jit=False)
        assert not hasattr(eager._map_only, "lower")
        frames = synthetic_clip(B=1, L=2, H=16, W=24)
        pc = slam.empty_map(1, 2 * 16 * 24)
        pc, pose = slam.step(pc, frames[:, 0])
        assert int(pc.num_points[0]) > 0


class TestMotionModel:
    """Constant-velocity odometry prior (`motion_model='constant_velocity'`,
    `step(prev_transform=...)`) — a capability the reference lacks: each
    frame's solve warm-starts from (and projects the association window at)
    the previous frame's relative transform."""

    def _clip(self, speed, L=6, H=32, W=48):
        from gradslam_tpu.datasets import synthetic_sequence

        rgb, depth, K, poses = synthetic_sequence(1, L, H, W, seed=0, speed=speed)
        return RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(poses),
        )

    def test_validates(self):
        with pytest.raises(ValueError, match="motion_model"):
            ICPSLAM(odom="icp", motion_model="kalman")

    def test_tracks_when_motion_slow(self):
        # At slow motion the zero-motion prior is already near-optimal and
        # the CV prior feeds the previous solve's error into the next init —
        # it must still track at the millimeter level (measured: 1.2e-3 vs
        # static's 5.5e-4 on this clip), it just isn't the right default.
        from gradslam_tpu.metrics import ate_rmse

        frames = self._clip(speed=1.0)
        ates = {}
        for mm in ("static", "constant_velocity"):
            slam = ICPSLAM(odom="icp", dsratio=2, numiters=10, motion_model=mm)
            _, op = slam(frames)
            ates[mm] = float(ate_rmse(op[0], frames.poses[0], align=False))
        assert ates["constant_velocity"] < 2e-3, ates
        assert ates["static"] < 2e-3, ates

    def test_tracks_fast_motion_better(self):
        # Fast steady pan + few solver iterations: the zero-motion prior
        # starts each solve far from the optimum AND mis-centers the
        # projective association window; the CV prior fixes both.
        # Calibrated on CPU: static 1.70e-3 vs cv 1.12e-3 at speed 16.
        from gradslam_tpu.metrics import ate_rmse

        frames = self._clip(speed=16.0)
        ates = {}
        for mm in ("static", "constant_velocity"):
            slam = ICPSLAM(odom="icp", dsratio=2, numiters=3, motion_model=mm)
            _, op = slam(frames)
            ates[mm] = float(ate_rmse(op[0], frames.poses[0], align=False))
        assert ates["constant_velocity"] < 0.8 * ates["static"], ates

    def test_step_prev_transform_replays_forward(self):
        # The stateless step API with an explicitly threaded prev_transform
        # must reproduce the scanned constant-velocity forward exactly.
        from gradslam_tpu.geometry import (
            compose_transformations,
            inverse_transformation,
        )

        frames = self._clip(speed=8.0, L=5)
        L, H, W = 5, 32, 48
        slam = ICPSLAM(
            odom="icp", dsratio=2, numiters=3,
            motion_model="constant_velocity",
        )
        pc_fwd, poses_fwd = slam(frames)

        pc = slam.empty_map(1, L * H * W)
        pc, pose = slam.step(pc, frames[:, 0])  # bootstrap
        poses = [pose[:, 0]]
        delta = jnp.broadcast_to(jnp.eye(4, dtype=pose.dtype), (1, 4, 4))
        for k in range(1, L):
            prev = frames[:, k - 1].with_poses(poses[-1][:, None])
            live = frames[:, k]
            pc, pose = slam.step(pc, live, prev, prev_transform=delta)
            delta = compose_transformations(
                pose[:, 0], inverse_transformation(poses[-1])
            )
            poses.append(pose[:, 0])
        np.testing.assert_allclose(
            np.asarray(jnp.stack(poses, axis=1)), np.asarray(poses_fwd),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(pc.num_points), np.asarray(pc_fwd.num_points)
        )

    def test_cv_is_differentiable(self):
        # the delta carry (compose + inverse_transformation) must not break
        # end-to-end gradients through the tracked pipeline
        from gradslam_tpu.datasets import synthetic_sequence

        rgb, depth, K, poses = synthetic_sequence(1, 3, 16, 24, seed=0, speed=4.0)
        slam = PointFusion(odom="gradicp", dsratio=2, numiters=2,
                           motion_model="constant_velocity", use_jit=False)

        def loss(d):
            fr = RGBDImages(
                jnp.asarray(rgb), d, jnp.asarray(K), jnp.asarray(poses)
            )
            _, traj = slam(fr)
            return jnp.sum(traj[:, -1, :3, 3] ** 2)

        g = jax.grad(loss)(jnp.asarray(depth))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

