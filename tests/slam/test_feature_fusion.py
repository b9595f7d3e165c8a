"""Semantic / user feature-channel fusion (PointFusion(feature_channels=F),
RGBDImages.feature_image). No reference equivalent: the reference's ScanNet
loader returns per-pixel labels but its pipelines drop them on the floor."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import PointFusion, Pointclouds, RGBDImages
from gradslam_tpu.datasets import synthetic_sequence
from gradslam_tpu.slam.fusionutils import (
    update_map_aggregate,
    update_map_fusion,
    voxel_downsample,
)
from gradslam_tpu.structures.utils import pointclouds_from_rgbdimages


def _frames_with_halves(B=1, L=3, H=24, W=32, seed=1):
    """Synthetic clip + 2-class one-hot feature plane (left/right halves)."""
    rgb, depths, K, poses = synthetic_sequence(B, L, H, W, seed=seed)
    lab = np.zeros((B, L, H, W, 2), np.float32)
    lab[..., : W // 2, 0] = 1.0
    lab[..., W // 2 :, 1] = 1.0
    return RGBDImages(
        jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(K),
        jnp.asarray(poses), feature_image=jnp.asarray(lab),
    )


class TestRGBDImagesFeaturePlane:
    def test_layout_roundtrip_and_indexing(self):
        frames = _frames_with_halves()
        cf = frames.to_channels_first()
        assert cf.feature_image.shape == (1, 3, 2, 24, 32)
        back = cf.to_channels_last()
        assert jnp.array_equal(back.feature_image, frames.feature_image)
        assert frames[:, 1].feature_image.shape == (1, 1, 24, 32, 2)
        assert frames.feature_channels == 2 and frames.has_features

    def test_from_channels_first(self):
        frames = _frames_with_halves()
        cf = frames.to_channels_first()
        rt = RGBDImages.from_channels_first(
            cf.rgb_image, cf.depth_image, cf.intrinsics, cf.poses,
            feature_image=cf.feature_image,
        )
        assert jnp.array_equal(rt.feature_image, frames.feature_image)

    def test_positional_channels_first_still_binds(self):
        # The reference's positional order (rgb, depth, K, poses,
        # channels_first) must keep working — feature_image is declared
        # after the layout flag.
        frames = _frames_with_halves()
        cf = frames.to_channels_first()
        rt = RGBDImages(cf.rgb_image, cf.depth_image, cf.intrinsics,
                        cf.poses, True)
        assert rt.channels_first and rt.feature_image is None

    def test_bad_shape_raises(self):
        frames = _frames_with_halves()
        with pytest.raises(ValueError, match="feature_image"):
            RGBDImages(
                frames.rgb_image, frames.depth_image, frames.intrinsics,
                frames.poses,
                feature_image=jnp.zeros((1, 3, 24, 7, 2)),
            )


class TestFeatureFusionPipeline:
    @pytest.mark.parametrize("quantize", [False, True])
    def test_onehot_features_stay_convex_and_pure(self, quantize):
        # A static-in-image-space label field: every fused point only ever
        # sees one class, so fused one-hots must stay EXACTLY one-hot-ish
        # convex (sum 1) and pure where depth never crosses the halves.
        frames = _frames_with_halves()
        slam = PointFusion(
            odom="gt", feature_channels=2, quantize_colors=quantize,
            use_jit=False,
        )
        pc, _ = slam(frames)
        n = int(pc.num_points[0])
        base = 2 if quantize else 1
        uf = np.asarray(pc.features[0, :n, base:])
        assert uf.shape[1] == 2
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-5)

    def test_feature_width_mismatch_raises(self):
        frames = _frames_with_halves()
        with pytest.raises(ValueError, match="feature channel"):
            PointFusion(odom="gt", use_jit=False)(frames)
        with pytest.raises(ValueError, match="feature channel"):
            PointFusion(odom="gt", feature_channels=3, use_jit=False)(frames)

    def test_negative_feature_channels_raises(self):
        with pytest.raises(ValueError, match="feature_channels"):
            PointFusion(feature_channels=-1)

    def test_step_matches_forward(self):
        frames = _frames_with_halves()
        slam = PointFusion(odom="gt", feature_channels=2, use_jit=False)
        pc_fwd, _ = slam(frames)
        B, L, H, W = frames.shape
        pc = slam.empty_map(B, L * H * W)
        for s in range(L):
            pc, _ = slam.step(pc, frames[:, s])
        assert int(pc.num_points[0]) == int(pc_fwd.num_points[0])
        n = int(pc.num_points[0])
        np.testing.assert_allclose(
            np.asarray(pc.features[0, :n]), np.asarray(pc_fwd.features[0, :n]),
            atol=1e-6,
        )

    @pytest.mark.slow
    def test_tracked_odometry_carries_features(self):
        frames = _frames_with_halves(L=3)
        slam = PointFusion(
            odom="gradicp", feature_channels=2, dsratio=2, numiters=3,
            use_jit=False,
        )
        pc, poses = slam(frames)
        n = int(pc.num_points[0])
        uf = np.asarray(pc.features[0, :n, 1:])
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-5)

    def test_merge_modes_agree(self):
        frames = _frames_with_halves()
        maps = {}
        for merge in ("scatter", "gather"):
            slam = PointFusion(
                odom="gt", feature_channels=2, merge=merge, use_jit=False
            )
            pc, _ = slam(frames)
            n = int(pc.num_points[0])
            maps[merge] = np.asarray(pc.features[0, :n])
        np.testing.assert_allclose(
            maps["scatter"], maps["gather"], atol=1e-5
        )

    def test_gradients_flow_to_feature_image(self):
        # Differentiable semantic fusion: d(map features)/d(frame features).
        frames = _frames_with_halves(L=2)
        slam = PointFusion(odom="gt", feature_channels=2, use_jit=False)

        def loss(feat):
            f = dataclasses.replace(frames, feature_image=feat)
            pc, _ = slam(f)
            return jnp.sum(pc.features[..., 1:] ** 2)

        g = jax.grad(loss)(frames.feature_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestICPSLAMFeatureChannels:
    def test_aggregate_pipeline_carries_features(self):
        from gradslam_tpu import ICPSLAM

        frames = _frames_with_halves()
        slam = ICPSLAM(odom="gt", feature_channels=2, use_jit=False)
        pc, _ = slam(frames)
        n = int(pc.num_points[0])
        assert pc.features.shape[-1] == 3  # [alpha, 2 user]
        uf = np.asarray(pc.features[0, :n, 1:])
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-5)

    def test_mismatch_raises(self):
        from gradslam_tpu import ICPSLAM

        frames = _frames_with_halves()
        with pytest.raises(ValueError, match="feature channel"):
            ICPSLAM(odom="gt", use_jit=False)(frames)


class TestFeatureFusionSemantics:
    def test_weighted_average_hand_computed(self):
        # One map point, one frame pixel hitting it: fused user feature must
        # be (cc*f_map + alpha*f_frame) / (cc + alpha) — same rule as colors.
        H = W = 4
        fx = 10.0
        K = jnp.asarray(
            [[fx, 0, (W - 1) / 2, 0], [0, fx, (H - 1) / 2, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32
        )[None, None]
        depth = jnp.ones((1, 1, H, W, 1), jnp.float32)
        rgb = jnp.full((1, 1, H, W, 3), 0.5, jnp.float32)
        pose = jnp.eye(4, dtype=jnp.float32)[None, None]
        feat = jnp.full((1, 1, H, W, 1), 2.0, jnp.float32)
        frames = RGBDImages(rgb, depth, K, pose, feature_image=feat)

        # Map: the exact backprojection of the center pixel (h=1, w=1 say),
        # normal facing the camera, ccount 3, user feature value 8.
        v = frames.vertex_map[0, 0, 1, 1]
        n_frame = frames.global_normal_map[0, 0, 1, 1]
        cc0, f0 = 3.0, 8.0
        cap = 8
        pts = jnp.zeros((1, cap, 3)).at[0, 0].set(v)
        # same normal as the frame computes there (passes the dot gate)
        nrm = jnp.zeros((1, cap, 3)).at[0, 0].set(n_frame)
        col = jnp.zeros((1, cap, 3))
        fea = jnp.zeros((1, cap, 2)).at[0, 0].set(jnp.asarray([cc0, f0]))
        pc = Pointclouds(
            points=pts, num_points=jnp.asarray([1]), normals=nrm,
            colors=col, features=fea, num_dropped=jnp.asarray([0]),
        )
        out = update_map_fusion(pc, frames, 0.1, 0.5, 0.6)
        alpha = float(
            jnp.exp(-jnp.sum(v**2) / (2 * 0.6**2)).clip(1e-7, 1.01)
        )
        expect = (cc0 * f0 + alpha * 2.0) / (cc0 + alpha)
        got = float(out.features[0, 0, 1])
        assert got == pytest.approx(expect, rel=1e-5)
        # and its ccount accumulated
        assert float(out.features[0, 0, 0]) == pytest.approx(
            cc0 + alpha, rel=1e-5
        )

    def test_aggregate_map_appends_features(self):
        frames = _frames_with_halves(L=1)
        B, L, H, W = frames.shape
        pc = Pointclouds.empty(B, H * W, has_normals=True, has_colors=True,
                               feature_dim=3)
        out = update_map_aggregate(pc, frames)
        n = int(out.num_points[0])
        uf = np.asarray(out.features[0, :n, 1:])
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-6)

    def test_aggregate_width_mismatch_raises(self):
        frames = _frames_with_halves(L=1)
        B, L, H, W = frames.shape
        pc = Pointclouds.empty(B, H * W, has_normals=True, has_colors=True,
                               feature_dim=4)
        with pytest.raises(ValueError, match="feature channel"):
            update_map_aggregate(pc, frames)

    def test_pointclouds_from_rgbdimages_carries_features(self):
        frames = _frames_with_halves(L=1)
        pc = pointclouds_from_rgbdimages(frames[:, 0], sigma=0.6)
        n = int(pc.num_points[0])
        assert pc.features.shape[-1] == 3  # [alpha, 2 user channels]
        uf = np.asarray(pc.features[0, :n, 1:])
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-6)
        pc2 = pointclouds_from_rgbdimages(frames[:, 0])
        assert pc2.features.shape[-1] == 2  # user channels alone

    def test_voxel_downsample_quantized_with_user_features(self):
        frames = _frames_with_halves()
        slam = PointFusion(
            odom="gt", feature_channels=2, quantize_colors=True, use_jit=False
        )
        pc, _ = slam(frames)
        # a colorless 3+-channel layout is ambiguous: explicit flag required
        with pytest.raises(ValueError, match="quantized_colors"):
            voxel_downsample(pc, 0.05)
        out = voxel_downsample(pc, 0.05, quantized_colors=True)
        n = int(out.num_points[0])
        assert n > 0
        uf = np.asarray(out.features[0, :n, 2:])
        np.testing.assert_allclose(uf.sum(1), 1.0, atol=1e-4)

    def test_decode_map_keeps_user_features(self):
        frames = _frames_with_halves(L=2)
        slam = PointFusion(
            odom="gt", feature_channels=2, quantize_colors=True, use_jit=False
        )
        pc, _ = slam(frames)
        dec = PointFusion.decode_map(pc)
        assert dec.colors is not None
        assert dec.features.shape[-1] == 3  # [ccount, 2 user channels]
        np.testing.assert_allclose(
            np.asarray(dec.features[..., 1:]), np.asarray(pc.features[..., 2:])
        )
