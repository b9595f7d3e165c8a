"""Map-axis-sharded fusion tests on the 8-virtual-device CPU mesh: the
explicit shard_map implementation must produce the same map (as a set) and
the same confidence mass as the single-device PointFusion path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import PointFusion, Pointclouds, RGBDImages
from gradslam_tpu.ops.knn import nn_points
from gradslam_tpu.parallel import (
    MapShardedPointFusion,
    make_mesh,
    nn_points_map_sharded,
)

from test_sharding import synthetic_frames  # same-directory test module


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(axis_name="map")


def _sorted_rows(x):
    x = np.asarray(x)
    order = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
    return x[order]


class TestMapShardedFusion:
    def test_matches_single_device(self, mesh):
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256  # divisible by mesh size; >= L*H*W/... enough headroom

        single = PointFusion(odom="gt", map_capacity=cap)
        pc_s, poses_s = single(frames)

        sharded = MapShardedPointFusion(map_capacity=cap, mesh=mesh)
        smap, poses_m = sharded(frames)
        pc_m = smap.to_pointclouds()

        np.testing.assert_array_equal(np.asarray(poses_m), np.asarray(poses_s))
        # same number of live points (sum over shards == single-device count)
        assert int(np.asarray(smap.num_points).sum()) == int(
            np.asarray(pc_s.num_points).sum()
        )
        # same point set (ordering differs: appends are dealt round-robin)
        np.testing.assert_allclose(
            _sorted_rows(pc_m.points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-5,
        )
        # same confidence mass
        np.testing.assert_allclose(
            float(np.asarray(pc_m.features_list[0]).sum()),
            float(jnp.sum(pc_s.features * pc_s.nonpad_mask[..., None])),
            rtol=1e-5,
        )

    def test_prune_matches_single_device(self, mesh):
        """Sharded Keller map maintenance (prune_every): per-shard
        compaction between scan segments must leave the same point SET and
        live count as the single-device segmented prune."""
        B, L, H, W = 1, 5, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap, thr = 8 * 512, 0.05

        single = PointFusion(
            odom="gt", map_capacity=cap, prune_every=2,
            prune_min_confidence=thr,
        )
        pc_s, _ = single(frames)
        noprune_n = int(np.asarray(
            PointFusion(odom="gt", map_capacity=cap)(frames)[0].num_points
        ).sum())

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, prune_every=2,
            prune_min_confidence=thr,
        )
        smap, poses_m = sharded(frames)
        pc_m = smap.to_pointclouds()

        n_s = int(np.asarray(pc_s.num_points).sum())
        n_m = int(np.asarray(smap.num_points).sum())
        assert n_m == n_s
        assert 0 < n_m < noprune_n  # prune actually removed rows
        np.testing.assert_allclose(
            _sorted_rows(pc_m.points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(np.asarray(pc_m.features_list[0]).sum()),
            float(jnp.sum(pc_s.features * pc_s.nonpad_mask[..., None])),
            rtol=1e-5,
        )

    def test_prune_tracked_matches_single_device(self, mesh):
        """prune_every through the TRACKED sharded path (gradicp odometry):
        trajectories and the pruned map must match single-device."""
        B, L, H, W = 1, 5, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap, thr = 8 * 512, 0.05
        kw = dict(dsratio=2, numiters=4, prune_every=2,
                  prune_min_confidence=thr)

        single = PointFusion(odom="gradicp", map_capacity=cap, **kw)
        pc_s, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            odom="gradicp", map_capacity=cap, mesh=mesh, **kw
        )
        smap, poses_m = sharded(frames)
        pc_m = smap.to_pointclouds()

        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-5
        )
        assert int(np.asarray(smap.num_points).sum()) == int(
            np.asarray(pc_s.num_points).sum()
        )
        np.testing.assert_allclose(
            _sorted_rows(pc_m.points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-4,
        )

    @pytest.mark.parametrize("K", [2, 4])
    def test_shard_count_scaling(self, K):
        """VERDICT r1 #7: K=2 and K=4 shard counts must produce the same map
        as single-device, not just the full 8-device mesh."""
        if len(jax.devices()) < K:
            pytest.skip(f"needs {K} (virtual) devices")
        sub_mesh = make_mesh(jax.devices()[:K], axis_name="map")
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = K * 512

        single = PointFusion(odom="gt", map_capacity=cap)
        pc_s, _ = single(frames)
        sharded = MapShardedPointFusion(map_capacity=cap, mesh=sub_mesh)
        smap, _ = sharded(frames)
        pc_m = smap.to_pointclouds()
        assert int(np.asarray(smap.num_points).sum()) == int(
            np.asarray(pc_s.num_points).sum()
        )
        np.testing.assert_allclose(
            _sorted_rows(pc_m.points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-5,
        )

    def test_batched(self, mesh):
        B, L, H, W = 2, 2, 12, 16
        frames = synthetic_frames(B, L=L, H=H, W=W, seed=3)
        cap = 8 * 128
        single = PointFusion(odom="gt", map_capacity=cap)
        pc_s, _ = single(frames)
        sharded = MapShardedPointFusion(map_capacity=cap, mesh=mesh)
        smap, _ = sharded(frames)
        pc_m = smap.to_pointclouds()
        for b in range(B):
            np.testing.assert_allclose(
                _sorted_rows(pc_m.points_list[b]),
                _sorted_rows(pc_s.points_list[b]),
                atol=1e-5,
            )

    @pytest.mark.slow
    def test_tracked_matches_single_device(self, mesh):
        """GradICP tracking against the sharded map: trajectory must match
        the single-device tracked pipeline (same downsampled clouds, same
        solver; only the ICP-target row ORDER differs)."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="gradicp", dsratio=2, numiters=6,
                             map_capacity=cap)
        pc_s, poses_s = single(frames)

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp", dsratio=2, numiters=6
        )
        smap, poses_m = sharded(frames)

        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        assert int(np.asarray(smap.num_points).sum()) > 0

    def test_tracked_cv_matches_single_device(self, mesh):
        """Constant-velocity motion model in the sharded pipeline: the
        predicted-pose warm start / association window must reproduce the
        single-device trajectory, and the option must be validated."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="gradicp", dsratio=2, numiters=6,
                             map_capacity=cap,
                             motion_model="constant_velocity")
        _, poses_s = single(frames)

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp", dsratio=2,
            numiters=6, motion_model="constant_velocity",
        )
        _, poses_m = sharded(frames)

        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        with pytest.raises(ValueError, match="motion_model"):
            MapShardedPointFusion(map_capacity=cap, mesh=mesh,
                                  motion_model="kalman")

    @pytest.mark.slow
    def test_tracked_pyramid_matches_single_device(self, mesh):
        """Coarse-to-fine odometry on the sharded path: per-level windows
        all-gathered, warm-started solve; trajectory matches the
        single-device pyramid pipeline."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="gradicp", pyramid=[(4, 4), (2, 3)],
                             map_capacity=cap)
        _, poses_s = single(frames)

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            pyramid=[(4, 4), (2, 3)],
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        with pytest.raises(ValueError):
            MapShardedPointFusion(map_capacity=cap, mesh=mesh,
                                  pyramid=[(0, 1)])

    @pytest.mark.slow
    def test_tracked_robust_matches_single_device(self, mesh):
        """robust_loss on the sharded tracked path matches the single-device
        robust pipeline (same IRLS weights, replicated solve)."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="icp", dsratio=2, numiters=4,
                             map_capacity=cap, robust_loss="huber",
                             robust_scale=0.05)
        _, poses_s = single(frames)

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="icp", dsratio=2, numiters=4,
            robust_loss="huber", robust_scale=0.05,
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        with pytest.raises(ValueError):
            MapShardedPointFusion(map_capacity=cap, mesh=mesh,
                                  robust_loss="cauchy")

    def test_quantized_colors_matches_single_device(self, mesh):
        """quantize_colors on the sharded path: same point set as the exact
        single-device run; colors 8-bit-quantized; packed slice is 1-wide."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="gt", map_capacity=cap)
        pc_s, _ = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, quantize_colors=True
        )
        smap, _ = sharded(frames)
        assert smap.colors.shape[-1] == 1  # packed
        pc_m = smap.to_pointclouds()
        assert pc_m.colors.shape[-1] == 3  # unpacked on export
        assert int(np.asarray(smap.num_points).sum()) == int(
            np.asarray(pc_s.num_points).sum()
        )
        np.testing.assert_allclose(
            _sorted_rows(pc_m.points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-5,
        )
        # colors: compare per matched point (sort both sets by coordinates)
        pts_m = np.asarray(pc_m.points_list[0])
        pts_s = np.asarray(pc_s.points_list[0])
        om = np.lexsort((pts_m[:, 2], pts_m[:, 1], pts_m[:, 0]))
        os_ = np.lexsort((pts_s[:, 2], pts_s[:, 1], pts_s[:, 0]))
        np.testing.assert_allclose(
            np.asarray(pc_m.colors_list[0])[om],
            np.asarray(pc_s.colors_list[0])[os_],
            atol=0.02,
        )

    def test_feature_fusion_matches_single_device(self, mesh):
        """Semantic feature channels on the sharded path: fused user features
        match the single-device PointFusion(feature_channels=F) per point."""
        import dataclasses

        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        lab = np.zeros((B, L, H, W, 2), np.float32)
        lab[..., : W // 2, 0] = 1.0
        lab[..., W // 2 :, 1] = 1.0
        frames = dataclasses.replace(frames, feature_image=jnp.asarray(lab))
        cap = 8 * 256

        single = PointFusion(odom="gt", feature_channels=2, map_capacity=cap)
        pc_s, _ = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, feature_channels=2
        )
        smap, _ = sharded(frames)
        assert smap.features.shape[-1] == 3  # [ccount, 2 user]
        pc_m = smap.to_pointclouds()
        assert int(np.asarray(smap.num_points).sum()) == int(
            np.asarray(pc_s.num_points).sum()
        )
        # match point sets, then compare full feature rows per matched point
        pts_m = np.asarray(pc_m.points_list[0])
        pts_s = np.asarray(pc_s.points_list[0])
        om = np.lexsort((pts_m[:, 2], pts_m[:, 1], pts_m[:, 0]))
        os_ = np.lexsort((pts_s[:, 2], pts_s[:, 1], pts_s[:, 0]))
        np.testing.assert_allclose(pts_m[om], pts_s[os_], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(pc_m.features_list[0])[om],
            np.asarray(pc_s.features_list[0])[os_],
            atol=1e-4,
        )

    def test_feature_width_mismatch_raises(self, mesh):
        frames = synthetic_frames(1, L=2, H=8, W=8)
        with pytest.raises(ValueError, match="feature channel"):
            MapShardedPointFusion(map_capacity=8 * 16, mesh=mesh,
                                  feature_channels=2)(frames)

    def test_overflow_accounting(self, mesh):
        """A too-small global capacity must surface in num_dropped, exactly
        as on the single-device path."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        tiny = MapShardedPointFusion(map_capacity=8 * 16, mesh=mesh)
        smap, _ = tiny(frames)
        assert int(np.asarray(smap.num_dropped).sum()) > 0
        pc = smap.to_pointclouds()
        assert int(np.asarray(pc.num_dropped).sum()) > 0
        # and a roomy run drops nothing
        ok = MapShardedPointFusion(map_capacity=8 * 256, mesh=mesh)
        smap2, _ = ok(frames)
        assert int(np.asarray(smap2.num_dropped).sum()) == 0

    def test_capacity_divisibility_raises(self, mesh):
        with pytest.raises(ValueError):
            MapShardedPointFusion(map_capacity=1001, mesh=mesh)

    def test_requires_poses(self, mesh):
        frames = synthetic_frames(1, L=2, H=8, W=8)
        frames = RGBDImages(
            frames.rgb_image, frames.depth_image, frames.intrinsics, None
        )
        sharded = MapShardedPointFusion(map_capacity=8 * 64, mesh=mesh)
        with pytest.raises(ValueError):
            sharded(frames)


class TestCollectiveVolume:
    """The sharded pipeline's interconnect traffic must be frame-sized —
    O(K * B * H * W) winner tables — and INDEPENDENT of map capacity (the map
    itself never rides the ICI). Asserted from the lowered StableHLO."""

    def test_volume_independent_of_capacity(self, mesh):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "collective_report",
            os.path.join(
                os.path.dirname(__file__), "..", "..", "scripts",
                "collective_report.py",
            ),
        )
        cr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cr)

        B, L, H, W = 1, 2, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        small = MapShardedPointFusion(map_capacity=8 * 256, mesh=mesh)
        big = MapShardedPointFusion(map_capacity=8 * 2048, mesh=mesh)
        v_small, ops_small, _, _ = cr.collective_volume(
            small._forward_impl, frames)
        v_big, ops_big, _, _ = cr.collective_volume(big._forward_impl, frames)
        assert v_small == v_big  # capacity-independent
        # exactly the documented winner tables: 2 fusion sites x 3 tables,
        # each (K, B, H*W) 4-byte
        assert len(ops_small) == 6
        assert v_small == 2 * 3 * 8 * B * H * W * 4
        # projective odometry: NO window all_gather (fusion tables only) and
        # the psum-folded normal equations are a few hundred bytes
        # (AtA 6x6 + Atb 6x1 + two error scalars per iteration)
        proj = MapShardedPointFusion(
            map_capacity=8 * 256, mesh=mesh, odom="gradicp",
            odom_assoc="projective", dsratio=2, numiters=2,
        )
        vg, opsg, vr, opsr = cr.collective_volume(proj._forward_impl, frames)
        assert vg == v_small  # fusion winner tables only — no window gather
        assert 0 < vr <= 512, (vr, opsr)


class TestShardedKNN:
    def test_matches_single_device(self, mesh):
        rng = np.random.RandomState(0)
        N, M = 100, 8 * 50
        src = jnp.asarray(rng.randn(N, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(M, 3).astype(np.float32))
        mask = jnp.asarray(rng.rand(M) < 0.8)

        d_ref, i_ref = nn_points(src, tgt, mask)

        from jax.sharding import PartitionSpec as P

        f = jax.jit(
            jax.shard_map(
                lambda s, t, m: nn_points_map_sharded(s, t, m, axis_name="map"),
                mesh=mesh,
                in_specs=(P(), P("map"), P("map")),
                out_specs=(P(), P()),
                # the all_gather + fold makes the result bit-identical on all
                # shards, but the static checker can't prove it
                check_vma=False,
            )
        )
        d, i = f(src, tgt, mask)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


class TestChannelsFirstInput:
    def test_channels_first_matches_channels_last(self, mesh):
        # review regression: forward must normalize layout before reshaping
        # images into (HW, C) rows.
        frames = synthetic_frames(1, L=3, H=16, W=24)
        cap = 8 * 256
        sharded = MapShardedPointFusion(map_capacity=cap, mesh=mesh)
        smap_a, poses_a = sharded(frames)
        smap_b, poses_b = sharded(frames.to_channels_first())
        np.testing.assert_array_equal(np.asarray(poses_a), np.asarray(poses_b))
        np.testing.assert_allclose(
            _sorted_rows(smap_a.to_pointclouds().points_list[0]),
            _sorted_rows(smap_b.to_pointclouds().points_list[0]),
            atol=1e-6,
        )


class TestTwoDMesh:
    """2-D (dp x map) mesh: batch sharding composed with explicit map
    sharding (VERDICT r2 #6). Fusion is independent per batch element, so
    the 2-D layout must reproduce single-device results exactly and add
    zero cross-batch communication (collective_report rows match 1-D at
    equal per-device load; docs/design.md §6)."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        from jax.sharding import Mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("dp", "map"))

    @pytest.mark.parametrize("odom", ["gt", "gradicp"])
    def test_matches_single_device(self, mesh2d, odom):
        B, L, H, W = 2, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 4 * 512
        kw = dict(dsratio=2, numiters=4) if odom != "gt" else {}

        single = PointFusion(odom=odom, map_capacity=cap, **kw)
        pc_s, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh2d, batch_axis="dp", odom=odom, **kw
        )
        smap, poses_m = sharded(frames)
        pc_m = smap.to_pointclouds()

        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-5
        )
        for b in range(B):
            np.testing.assert_allclose(
                _sorted_rows(pc_m.points_list[b]),
                _sorted_rows(pc_s.points_list[b]),
                atol=1e-5,
            )

    def test_batch_divisibility_raises(self, mesh2d):
        sharded = MapShardedPointFusion(
            map_capacity=4 * 256, mesh=mesh2d, batch_axis="dp"
        )
        frames = synthetic_frames(1, L=2, H=16, W=24)  # B=1 not divisible
        with pytest.raises(ValueError, match="divisible by the batch-axis"):
            sharded(frames)

    def test_mesh_validation(self, mesh2d):
        with pytest.raises(ValueError, match="batch_axis"):
            MapShardedPointFusion(map_capacity=4 * 256, mesh=mesh2d)
        with pytest.raises(ValueError, match="no axis"):
            MapShardedPointFusion(
                map_capacity=4 * 256, mesh=mesh2d, batch_axis="nope"
            )


class TestNormalPitchSharded:
    def test_normal_pitch_matches_single_device(self, mesh):
        """normal_pitch threads into the sharded pipeline's normal maps and
        keeps single-device equality (same tracked poses + point sets)."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="icp", dsratio=2, numiters=4,
                             map_capacity=cap, normal_pitch=2)
        pc_s, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="icp", dsratio=2, numiters=4,
            normal_pitch=2,
        )
        smap, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        np.testing.assert_allclose(
            _sorted_rows(smap.to_pointclouds().points_list[0]),
            _sorted_rows(pc_s.points_list[0]),
            atol=1e-5,
        )
        # and the pitch actually changes the map normals vs pitch-1
        smap1, _ = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="icp", dsratio=2, numiters=4,
        )(frames)
        assert not np.allclose(
            np.asarray(smap.normals), np.asarray(smap1.normals)
        )
        with pytest.raises(ValueError, match="normal_pitch"):
            MapShardedPointFusion(map_capacity=cap, mesh=mesh,
                                  normal_pitch=0)


class TestProjectiveSharded:
    """odom_assoc='projective' in the sharded pipeline: each shard builds
    point-to-plane rows for its own window and the 6x6 normal equations are
    psum-folded — the per-iteration collective is ~230 bytes instead of the
    KNN path's all-gathered windows. Trajectories must match the
    single-device projective pipeline (row-order fp noise only)."""

    def test_tracked_projective_matches_single_device(self, mesh):
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256

        single = PointFusion(odom="gradicp", odom_assoc="projective",
                             dsratio=2, numiters=6, map_capacity=cap)
        pc_s, poses_s = single(frames)

        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            odom_assoc="projective", dsratio=2, numiters=6,
        )
        smap, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
        assert int(np.asarray(smap.num_points).sum()) > 0

    def test_projective_gate_and_pyramid(self, mesh):
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256
        single = PointFusion(odom="gradicp", odom_assoc="projective",
                             odom_angle_gate=60.0, pyramid=[(4, 4), (2, 3)],
                             map_capacity=cap)
        _, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            odom_assoc="projective", odom_angle_gate=60.0,
            pyramid=[(4, 4), (2, 3)],
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )


    def test_projective_sym_normals_matches_single_device(self, mesh):
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256
        single = PointFusion(odom="gradicp", odom_assoc="projective",
                             odom_sym_normals=True, dsratio=2, numiters=6,
                             map_capacity=cap)
        _, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            odom_assoc="projective", odom_sym_normals=True,
            dsratio=2, numiters=6,
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )


    def test_hybrid_per_level_assoc_matches_single_device(self, mesh):
        """Mixed projective+KNN pyramid levels in the sharded pipeline must
        match the single-device hybrid trajectories (localize_mixed
        threads the same warm-start correction through both machineries)."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256
        single = PointFusion(odom="gradicp", pyramid=[(4, 4), (2, 3)],
                             odom_assoc=["projective", "knn"],
                             odom_sym_normals=True, map_capacity=cap)
        _, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            pyramid=[(4, 4), (2, 3)],
            odom_assoc=["projective", "knn"], odom_sym_normals=True,
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )

    def test_validation(self, mesh):
        with pytest.raises(ValueError, match="odom_assoc"):
            MapShardedPointFusion(map_capacity=8 * 16, mesh=mesh,
                                  odom_assoc="nearest")
        with pytest.raises(ValueError, match="odom_angle_gate"):
            MapShardedPointFusion(map_capacity=8 * 16, mesh=mesh,
                                  odom="gt", odom_angle_gate=60.0)
        with pytest.raises(ValueError, match="projective"):
            MapShardedPointFusion(map_capacity=8 * 16, mesh=mesh,
                                  odom_sym_normals=True)

    def test_knn_gate_matches_single_device(self, mesh):
        """odom_angle_gate on the sharded KNN mode: the strided frame
        normals ride as 3 extra source channels and gate the per-level
        all-gathered-window solves; trajectories must match the
        single-device gated KNN pipeline."""
        B, L, H, W = 1, 3, 16, 24
        frames = synthetic_frames(B, L=L, H=H, W=W)
        cap = 8 * 256
        single = PointFusion(odom="gradicp", odom_assoc="knn",
                             odom_angle_gate=75.0, dsratio=2, numiters=6,
                             map_capacity=cap)
        _, poses_s = single(frames)
        sharded = MapShardedPointFusion(
            map_capacity=cap, mesh=mesh, odom="gradicp",
            odom_assoc="knn", odom_angle_gate=75.0, dsratio=2, numiters=6,
        )
        _, poses_m = sharded(frames)
        np.testing.assert_allclose(
            np.asarray(poses_m), np.asarray(poses_s), atol=1e-4
        )
