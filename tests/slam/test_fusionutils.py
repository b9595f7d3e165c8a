import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.slam.fusionutils import (
    ActiveMapPoints,
    are_normals_similar,
    are_points_close,
    find_active_map_points,
    find_best_unique_correspondences,
    get_alpha,
    update_map_aggregate,
    update_map_fusion,
)
from gradslam_tpu.structures import Pointclouds, RGBDImages


def tiny_frame(B=1, H=4, W=4, depth_value=1.0):
    """A flat fronto-parallel plane at z=depth with identity pose and
    unit-focal intrinsics centred at the image centre."""
    rgb = jnp.ones((B, 1, H, W, 3)) * 0.5
    depth = jnp.full((B, 1, H, W, 1), depth_value)
    K = jnp.eye(4)
    K = K.at[0, 2].set((W - 1) / 2.0).at[1, 2].set((H - 1) / 2.0)
    intrinsics = jnp.broadcast_to(K, (B, 1, 4, 4))
    poses = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4))
    return RGBDImages(rgb, depth, intrinsics, poses)


class TestGetAlpha:
    def test_formula(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        alpha = get_alpha(pts, sigma=0.6)
        np.testing.assert_allclose(
            np.asarray(alpha), [1.0, np.exp(-1 / (2 * 0.36))], atol=1e-6
        )

    def test_clamp(self):
        pts = jnp.asarray([[100.0, 0.0, 0.0]])
        assert float(get_alpha(pts, sigma=0.6)[0]) == pytest.approx(1e-7)

    def test_raises(self):
        with pytest.raises(ValueError):
            get_alpha(jnp.zeros((5, 4)), sigma=0.6)


class TestPredicates:
    def test_are_points_close(self):
        a = jnp.zeros((3, 3))
        b = jnp.asarray([[0.0, 0, 0.01], [0, 0, 0.2], [0, 0, 0.04]])
        np.testing.assert_array_equal(
            np.asarray(are_points_close(a, b, 0.05)), [True, False, True]
        )

    def test_are_normals_similar(self):
        a = jnp.asarray([[0.0, 0, 1.0], [0.0, 0, 1.0]])
        b = jnp.asarray([[0.0, 0, 1.0], [1.0, 0, 0.0]])
        np.testing.assert_array_equal(
            np.asarray(are_normals_similar(a, b, 0.9)), [True, False]
        )

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            are_points_close(jnp.zeros((2, 3)), jnp.zeros((3, 3)), 0.1)


class TestFindActiveMapPoints:
    def test_points_project_where_expected(self):
        frame = tiny_frame(H=4, W=4, depth_value=2.0)
        # map points at z=2 in front of the camera, at pixel (h, w) = (1, 2):
        # x = (u - cx) * z, y = (v - cy) * z with fx=fy=1
        cx, cy = 1.5, 1.5
        pts = jnp.asarray([[[(2 - cx) * 2.0, (1 - cy) * 2.0, 2.0]]])  # (1, 1, 3)
        pc = Pointclouds(
            points=pts, num_points=jnp.asarray([1], dtype=jnp.int32)
        )
        active = find_active_map_points(pc, frame)
        assert bool(active.valid[0, 0])
        assert int(active.pix_h[0, 0]) == 1
        assert int(active.pix_w[0, 0]) == 2

    def test_behind_camera_invalid(self):
        frame = tiny_frame()
        pts = jnp.asarray([[[0.0, 0.0, -1.0]]])
        pc = Pointclouds(points=pts, num_points=jnp.asarray([1], dtype=jnp.int32))
        active = find_active_map_points(pc, frame)
        assert not bool(active.valid[0, 0])

    def test_out_of_bounds_invalid(self):
        frame = tiny_frame(H=4, W=4)
        pts = jnp.asarray([[[100.0, 0.0, 1.0]]])
        pc = Pointclouds(points=pts, num_points=jnp.asarray([1], dtype=jnp.int32))
        active = find_active_map_points(pc, frame)
        assert not bool(active.valid[0, 0])

    def test_padding_invalid(self):
        frame = tiny_frame()
        pts = jnp.zeros((1, 4, 3)).at[:, :, 2].set(1.0)
        pc = Pointclouds(points=pts, num_points=jnp.asarray([2], dtype=jnp.int32))
        active = find_active_map_points(pc, frame)
        np.testing.assert_array_equal(
            np.asarray(active.valid[0]), [True, True, False, False]
        )


class TestWinnerSelection:
    """Hand-computed winner tables (mirrors the reference's literal-table tests
    tests/slam/test_fusionutils.py:672-785)."""

    def _make(self, ccounts, ray_points, frame_point):
        """All candidates project to pixel (0, 0) of a 2x2 frame."""
        n = len(ccounts)
        pts = jnp.asarray([ray_points])  # (1, n, 3)
        pc = Pointclouds(
            points=pts,
            num_points=jnp.asarray([n], dtype=jnp.int32),
            normals=jnp.zeros((1, n, 3)).at[..., 2].set(1.0),
            colors=jnp.zeros((1, n, 3)),
            features=jnp.asarray([[[c] for c in ccounts]]),
        )
        frame = tiny_frame(H=2, W=2)
        # put the frame's (0,0) global vertex at frame_point by choosing depth
        active = ActiveMapPoints(
            valid=jnp.ones((1, n), dtype=bool),
            pix_h=jnp.zeros((1, n), dtype=jnp.int32),
            pix_w=jnp.zeros((1, n), dtype=jnp.int32),
        )
        return pc, frame, active

    def test_max_ccount_wins(self):
        pc, frame, active = self._make(
            ccounts=[1.0, 3.0, 2.0],
            ray_points=[[0, 0, 1.0]] * 3,
            frame_point=[0, 0, 1.0],
        )
        winner, corr = find_best_unique_correspondences(pc, frame, active)
        np.testing.assert_array_equal(np.asarray(winner[0]), [False, True, False])
        assert bool(corr[0, 0])

    def test_tie_break_min_ray_dist(self):
        # frame vertex at pixel (0,0) is the backprojection of depth 1:
        # ((0 - 0.5) * 1, (0 - 0.5) * 1, 1)
        fp = [-0.5, -0.5, 1.0]
        pc, frame, active = self._make(
            ccounts=[2.0, 2.0, 2.0],
            ray_points=[
                [fp[0], fp[1], 1.3],  # dist 0.09
                [fp[0], fp[1], 1.1],  # dist 0.01  <- winner
                [fp[0], fp[1], 1.2],  # dist 0.04
            ],
            frame_point=fp,
        )
        winner, _ = find_best_unique_correspondences(pc, frame, active)
        np.testing.assert_array_equal(np.asarray(winner[0]), [False, True, False])

    def test_tie_break_min_index(self):
        fp = [-0.5, -0.5, 1.0]
        pc, frame, active = self._make(
            ccounts=[2.0, 2.0],
            ray_points=[[fp[0], fp[1], 1.1], [fp[0], fp[1], 1.1]],
            frame_point=fp,
        )
        winner, _ = find_best_unique_correspondences(pc, frame, active)
        np.testing.assert_array_equal(np.asarray(winner[0]), [True, False])

    def test_uncorresponded_pixels(self):
        pc, frame, active = self._make(
            ccounts=[1.0], ray_points=[[0, 0, 1.0]], frame_point=[0, 0, 1.0]
        )
        winner, corr = find_best_unique_correspondences(pc, frame, active)
        corr = np.asarray(corr).reshape(2, 2)
        assert corr[0, 0] and not corr.ravel()[1:].any()


class TestMapUpdates:
    def test_aggregate_appends_valid_points(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        pc = Pointclouds.empty(2, 120 * 160, feature_dim=None)
        out = update_map_aggregate(pc, frames[:, 0])
        valid = (msrd["depths"][:, 0] > 0).reshape(2, -1).sum(-1)
        np.testing.assert_array_equal(np.asarray(out.num_points), valid)

    def test_fusion_first_frame_appends_all(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        pc = Pointclouds.empty(2, 120 * 160)
        out = update_map_fusion(pc, frames[:, 0], 0.05, np.cos(np.radians(20)), 0.6)
        valid = (msrd["depths"][:, 0] > 0).reshape(2, -1).sum(-1)
        np.testing.assert_array_equal(np.asarray(out.num_points), valid)

    def test_fusion_same_frame_twice_merges(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        pc = Pointclouds.empty(2, 2 * 120 * 160)
        out1 = update_map_fusion(pc, frames[:, 0], 0.05, np.cos(np.radians(20)), 0.6)
        out2 = update_map_fusion(out1, frames[:, 0], 0.05, np.cos(np.radians(20)), 0.6)
        # re-fusing the same frame should merge (almost) everything, not append
        n1 = np.asarray(out1.num_points)
        n2 = np.asarray(out2.num_points)
        assert np.all(n2 <= n1 * 1.05)
        # merged points keep their position (average of identical points)
        np.testing.assert_allclose(
            out2.points_list[0][: n1[0]][:100],
            out1.points_list[0][:100],
            atol=1e-4,
        )

    @pytest.mark.slow
    def test_fusion_differentiable(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"][:1, :1]),
            depth_image=jnp.asarray(msrd["depths"][:1, :1]),
            intrinsics=jnp.asarray(msrd["intrinsics"][:1]),
            poses=jnp.asarray(msrd["poses"][:1, :1]),
        )
        pc = Pointclouds.empty(1, 120 * 160)
        pc = update_map_fusion(pc, frames, 0.05, np.cos(np.radians(20)), 0.6)

        def loss(depth):
            fr = RGBDImages(frames.rgb_image, depth, frames.intrinsics, frames.poses)
            out = update_map_fusion(pc, fr, 0.05, np.cos(np.radians(20)), 0.6)
            return jnp.sum(out.points**2)

        g = jax.grad(loss)(frames.depth_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestFastPathConsistency:
    """The windowed/sorted TPU fast path (update_map_fusion) must agree with
    the dense parity path (find_correspondences + fuse_with_map)."""

    def test_windowed_equals_dense(self, msrd):
        from gradslam_tpu.slam.fusionutils import (
            find_correspondences,
            fuse_with_map,
        )

        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        dist_th, dot_th, sigma = 0.05, float(np.cos(np.radians(20))), 0.6
        pc = Pointclouds.empty(2, 2 * 120 * 160)
        pc = update_map_fusion(pc, frames[:, 0], dist_th, dot_th, sigma)

        fast = update_map_fusion(pc, frames[:, 1], dist_th, dot_th, sigma)

        active, winner, corresponded = find_correspondences(
            pc, frames[:, 1], dist_th, dot_th
        )
        dense = fuse_with_map(pc, frames[:, 1], active, winner, corresponded, sigma)

        np.testing.assert_array_equal(
            np.asarray(fast.num_points), np.asarray(dense.num_points)
        )
        # same point set (fast path may order appends identically here)
        for b in range(2):
            np.testing.assert_allclose(
                np.sort(fast.points_list[b], axis=0),
                np.sort(dense.points_list[b], axis=0),
                atol=1e-5,
            )
        np.testing.assert_allclose(
            float(jnp.sum(fast.features * fast.nonpad_mask[..., None])),
            float(jnp.sum(dense.features * dense.nonpad_mask[..., None])),
            rtol=1e-5,
        )


class TestAssociationModes:
    """'sort_full' and 'windowed' association must agree when the window is
    large enough to hold all active points."""

    def test_modes_agree(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        dist_th, dot_th, sigma = 0.05, float(np.cos(np.radians(20))), 0.6
        pc = Pointclouds.empty(2, 2 * 120 * 160)
        pc = update_map_fusion(pc, frames[:, 0], dist_th, dot_th, sigma)
        a = update_map_fusion(pc, frames[:, 1], dist_th, dot_th, sigma,
                              association="sort_full")
        b = update_map_fusion(pc, frames[:, 1], dist_th, dot_th, sigma,
                              association="windowed")
        np.testing.assert_array_equal(np.asarray(a.num_points), np.asarray(b.num_points))
        np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features), atol=1e-6)

    def test_bad_mode_raises(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"][:1, :1]),
            depth_image=jnp.asarray(msrd["depths"][:1, :1]),
            intrinsics=jnp.asarray(msrd["intrinsics"][:1]),
            poses=jnp.asarray(msrd["poses"][:1, :1]),
        )
        with pytest.raises(ValueError):
            update_map_fusion(Pointclouds.empty(1, 64), frames, 0.05, 0.9, 0.6,
                              association="bogus")
        with pytest.raises(ValueError):
            update_map_fusion(Pointclouds.empty(1, 64), frames, 0.05, 0.9, 0.6,
                              merge="bogus")


class TestMergeModes:
    """'scatter' and 'gather' write-back must produce identical maps (the
    gather mode rebuilds the buffer instead of scattering into it)."""

    def test_modes_agree(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
            poses=jnp.asarray(msrd["poses"]),
        )
        dist_th, dot_th, sigma = 0.05, float(np.cos(np.radians(20))), 0.6
        pc = Pointclouds.empty(2, 2 * 120 * 160)
        pc = update_map_fusion(pc, frames[:, 0], dist_th, dot_th, sigma)
        for association in ("sort_full", "windowed"):
            a = update_map_fusion(pc, frames[:, 1], dist_th, dot_th, sigma,
                                  association=association, merge="scatter")
            b = update_map_fusion(pc, frames[:, 1], dist_th, dot_th, sigma,
                                  association=association, merge="gather")
            np.testing.assert_array_equal(
                np.asarray(a.num_points), np.asarray(b.num_points)
            )
            np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
            np.testing.assert_array_equal(np.asarray(a.normals), np.asarray(b.normals))
            np.testing.assert_array_equal(np.asarray(a.colors), np.asarray(b.colors))
            np.testing.assert_array_equal(
                np.asarray(a.features), np.asarray(b.features)
            )

    def test_gather_differentiable(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"][:1]),
            depth_image=jnp.asarray(msrd["depths"][:1]),
            intrinsics=jnp.asarray(msrd["intrinsics"][:1]),
            poses=jnp.asarray(msrd["poses"][:1]),
        )
        dist_th, dot_th, sigma = 0.05, float(np.cos(np.radians(20))), 0.6
        pc = Pointclouds.empty(1, 2 * 120 * 160)
        pc = update_map_fusion(pc, frames[:, 0], dist_th, dot_th, sigma,
                               merge="gather")

        def loss(depth):
            f = RGBDImages(
                rgb_image=frames.rgb_image[:, 1:2],
                depth_image=depth,
                intrinsics=frames.intrinsics,
                poses=frames.poses[:, 1:2],
            )
            out = update_map_fusion(pc, f, dist_th, dot_th, sigma,
                                    merge="gather")
            return jnp.sum(out.points * out.nonpad_mask[..., None])

        g = jax.grad(loss)(frames.depth_image[:, 1:2])
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


class TestPruneMap:
    def test_removes_low_confidence(self):
        from gradslam_tpu.slam import prune_map

        pc = Pointclouds(
            points=jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3),
            num_points=jnp.asarray([4], jnp.int32),
            normals=jnp.ones((1, 4, 3)),
            colors=jnp.ones((1, 4, 3)),
            features=jnp.asarray([[[2.0], [0.5], [3.0], [0.1]]]),
        )
        out = prune_map(pc, min_confidence=1.0)
        assert int(out.num_points[0]) == 2
        np.testing.assert_allclose(
            np.asarray(out.points[0, :2]),
            np.asarray(pc.points[0, jnp.asarray([0, 2])]),
        )
        np.testing.assert_allclose(np.asarray(out.features[0, :2, 0]), [2.0, 3.0])

    def test_requires_features(self):
        from gradslam_tpu.slam import prune_map

        pc = Pointclouds.empty(1, 4, feature_dim=None)
        with pytest.raises(ValueError):
            prune_map(pc, 1.0)

    def test_jittable_and_differentiable(self):
        from gradslam_tpu.slam import prune_map

        pc = Pointclouds(
            points=jnp.ones((1, 8, 3)),
            num_points=jnp.asarray([8], jnp.int32),
            normals=jnp.ones((1, 8, 3)),
            colors=jnp.ones((1, 8, 3)),
            features=jnp.ones((1, 8, 1)) * 2.0,
        )
        out = jax.jit(lambda p: prune_map(p, 1.0))(pc)
        assert int(out.num_points[0]) == 8

        def loss(pts):
            p2 = Pointclouds(pts, pc.num_points, pc.normals, pc.colors, pc.features)
            return jnp.sum(prune_map(p2, 1.0).points ** 2)

        g = jax.grad(loss)(pc.points)
        assert np.all(np.isfinite(np.asarray(g)))


class TestVoxelDownsample:
    """voxel_downsample: open3d-style grid decimation (map-maintenance
    companion to prune_map; the reference has neither)."""

    def _cloud(self):
        from gradslam_tpu.slam import voxel_downsample  # noqa: F401
        # two voxels at size 1.0: three points in [0,1)^3, two in [1,2)x[0,1)^2
        pts = [np.array(
            [[0.1, 0.1, 0.1],
             [0.2, 0.2, 0.2],
             [0.9, 0.4, 0.3],
             [1.1, 0.1, 0.1],
             [1.9, 0.2, 0.4]], np.float32)]
        cols = [np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [0, 1, 1]],
            np.float32)]
        return Pointclouds.from_list(pts, colors=cols, capacity=8)

    def test_first_mode(self):
        from gradslam_tpu.slam import voxel_downsample

        out = voxel_downsample(self._cloud(), 1.0, reduce="first")
        assert int(out.num_points[0]) == 2
        got = np.asarray(out.points_list[0])
        # lowest-index point of each voxel, voxels in lexicographic order
        np.testing.assert_allclose(got[0], [0.1, 0.1, 0.1], atol=1e-6)
        np.testing.assert_allclose(got[1], [1.1, 0.1, 0.1], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.colors_list[0])[0], [1, 0, 0], atol=1e-6)

    def test_mean_mode(self):
        from gradslam_tpu.slam import voxel_downsample

        out = voxel_downsample(self._cloud(), 1.0)  # default 'mean'
        assert int(out.num_points[0]) == 2
        got = np.asarray(out.points_list[0])
        np.testing.assert_allclose(got[0], [0.4, 0.7 / 3, 0.2], atol=1e-6)
        np.testing.assert_allclose(got[1], [1.5, 0.15, 0.25], atol=1e-6)
        # colors averaged per voxel
        np.testing.assert_allclose(
            np.asarray(out.colors_list[0])[0], [1 / 3, 1 / 3, 1 / 3],
            atol=1e-6)

    def test_padding_excluded_and_batched(self):
        from gradslam_tpu.slam import voxel_downsample

        pts = [np.zeros((3, 3), np.float32),
               np.array([[0.1, 0, 0], [5.0, 5.0, 5.0]], np.float32)]
        pc = Pointclouds.from_list(pts, capacity=6)
        out = voxel_downsample(pc, 1.0)
        assert int(out.num_points[0]) == 1
        assert int(out.num_points[1]) == 2
        # padded rows must not produce voxels
        assert np.all(np.asarray(out.nonpad_mask).sum(-1) == [1, 2])

    def test_jit_and_grad(self):
        import jax

        from gradslam_tpu.slam import voxel_downsample

        pc = self._cloud()

        @jax.jit
        def f(points):
            import dataclasses
            out = voxel_downsample(
                dataclasses.replace(pc, points=points), 1.0)
            return jnp.sum(out.points**2)

        g = jax.grad(f)(pc.points)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0

    def test_normals_renormalized(self):
        from gradslam_tpu.slam import voxel_downsample

        pts = [np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)]
        nrm = [np.array([[1, 0, 0], [0, 1, 0]], np.float32)]
        pc = Pointclouds.from_list(pts, normals=nrm, capacity=4)
        out = voxel_downsample(pc, 1.0)
        n = np.asarray(out.normals_list[0])[0]
        np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)

    def test_validation(self):
        from gradslam_tpu.slam import voxel_downsample

        with pytest.raises(ValueError):
            voxel_downsample(self._cloud(), 0.0)
        with pytest.raises(ValueError):
            voxel_downsample(self._cloud(), 1.0, reduce="median")


class TestFusionValidationRegressions:
    """Round-2 review: loud failures for misuse of the fusion entry points."""

    def _quantized_map(self, n=6):
        import numpy as np

        from gradslam_tpu.slam.fusionutils import pack_colors

        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(1, 8, 3), jnp.float32)
        nrm = jnp.asarray(rng.rand(1, 8, 3), jnp.float32)
        cols = jnp.asarray(rng.rand(1, 8, 3), jnp.float32)
        feats = jnp.concatenate(
            [jnp.ones((1, 8, 1)), pack_colors(cols)], axis=-1
        )
        return Pointclouds(
            points=pts, num_points=jnp.asarray([n]), normals=nrm,
            features=feats,
        ), cols

    def test_update_map_fusion_requires_poses(self, synthetic_clip):
        from gradslam_tpu.slam.fusionutils import update_map_fusion

        frames = synthetic_clip(B=1, L=1, H=8, W=12)
        frames = RGBDImages(
            frames.rgb_image, frames.depth_image, frames.intrinsics
        )  # poses=None
        pc = Pointclouds.empty(1, 64, has_normals=True, has_colors=True,
                               feature_dim=1)
        with pytest.raises(ValueError, match="poses"):
            update_map_fusion(pc, frames, 0.05, 0.9, 0.6)

    def test_update_map_fusion_requires_seqlen_one(self, synthetic_clip):
        from gradslam_tpu.slam.fusionutils import update_map_fusion

        frames = synthetic_clip(B=1, L=3, H=8, W=12)
        pc = Pointclouds.empty(1, 64, has_normals=True, has_colors=True,
                               feature_dim=1)
        with pytest.raises(ValueError, match="sequence length"):
            update_map_fusion(pc, frames, 0.05, 0.9, 0.6)

    def test_update_map_fusion_requires_normals_features(self, synthetic_clip):
        from gradslam_tpu.slam.fusionutils import update_map_fusion

        frames = synthetic_clip(B=1, L=1, H=8, W=12)
        bare = Pointclouds.empty(
            1, 64, has_normals=False, has_colors=True, feature_dim=None
        )
        with pytest.raises(ValueError, match="normals and features"):
            update_map_fusion(bare, frames, 0.05, 0.9, 0.6)

    def test_fuse_with_map_rejects_quantized_layout(self, synthetic_clip):
        from gradslam_tpu.slam.fusionutils import (
            ActiveMapPoints, fuse_with_map,
        )

        frames = synthetic_clip(B=1, L=1, H=8, W=12)
        pc, _ = self._quantized_map()
        active = ActiveMapPoints(
            valid=jnp.zeros((1, 8), bool),
            pix_h=jnp.zeros((1, 8), jnp.int32),
            pix_w=jnp.zeros((1, 8), jnp.int32),
        )
        with pytest.raises(ValueError, match="quantized"):
            fuse_with_map(
                pc, frames, active,
                jnp.zeros((1, 8), bool), jnp.zeros((1, 8 * 12), bool), 0.6,
            )

    def test_voxel_downsample_quantized_colors(self):
        import numpy as np

        from gradslam_tpu.slam.fusionutils import (
            pack_colors, unpack_colors, voxel_downsample,
        )

        # two points in ONE voxel with different colors + one lone point
        pts = jnp.asarray(
            [[[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [5.0, 5.0, 5.0]]],
            jnp.float32,
        )
        cols = jnp.asarray(
            [[[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]], jnp.float32
        )
        feats = jnp.concatenate(
            [jnp.ones((1, 3, 1)), pack_colors(cols)], axis=-1
        )
        pc = Pointclouds(
            points=pts, num_points=jnp.asarray([3]),
            normals=jnp.ones((1, 3, 3)), features=feats,
        )
        # Explicit flag and default auto-detection (colors=None + 2-channel
        # features IS the quantized layout — review r2: the default must not
        # silently average packed integers) must agree.
        for kwargs in ({"quantized_colors": True}, {}):
            out = voxel_downsample(pc, 0.1, **kwargs)
            assert int(out.num_points[0]) == 2
            got = np.asarray(unpack_colors(out.features[..., 1:2]))[0, :2]
            # shared voxel: mean of red+blue (8-bit quantized); lone: green
            rows = {tuple(np.round(r, 2)) for r in got}
            assert (0.5, 0.0, 0.5) in rows and (0.0, 1.0, 0.0) in rows, got

    def test_voxel_downsample_quantized_validation(self):
        pc = Pointclouds(
            points=jnp.zeros((1, 4, 3)), num_points=jnp.asarray([4]),
            colors=jnp.zeros((1, 4, 3)),
        )
        from gradslam_tpu.slam.fusionutils import voxel_downsample

        with pytest.raises(ValueError, match="quantized_colors"):
            voxel_downsample(pc, 0.1, quantized_colors=True)
