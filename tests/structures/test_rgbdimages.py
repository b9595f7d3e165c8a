import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.structures import RGBDImages


def make_frames(msrd):
    return RGBDImages(
        rgb_image=jnp.asarray(msrd["colors"]),
        depth_image=jnp.asarray(msrd["depths"]),
        intrinsics=jnp.asarray(msrd["intrinsics"]),
        poses=jnp.asarray(msrd["poses"]),
    )


class TestGoldenParity:
    """Parity with the reference's precomputed maps (tests/data/msrd_b2s3)."""

    def test_vertex_map(self, msrd):
        frames = make_frames(msrd)
        np.testing.assert_allclose(
            np.asarray(frames.vertex_map), msrd["vertex_map"], atol=1e-4
        )

    def test_global_vertex_map(self, msrd):
        frames = make_frames(msrd)
        np.testing.assert_allclose(
            np.asarray(frames.global_vertex_map), msrd["global_vertex_map"], atol=1e-4
        )

    def test_normal_map(self, msrd):
        frames = make_frames(msrd)
        np.testing.assert_allclose(
            np.asarray(frames.normal_map), msrd["normal_map"], atol=1e-3
        )

    def test_global_normal_map(self, msrd):
        frames = make_frames(msrd)
        np.testing.assert_allclose(
            np.asarray(frames.global_normal_map), msrd["global_normal_map"], atol=1e-3
        )

    def test_maps_jittable(self, msrd):
        frames = make_frames(msrd)
        f = jax.jit(lambda fr: (fr.vertex_map, fr.global_normal_map))
        v, n = f(frames)
        np.testing.assert_allclose(np.asarray(v), msrd["vertex_map"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(n), msrd["global_normal_map"], atol=1e-3)


class TestStructure:
    def test_shape_and_len(self, msrd):
        frames = make_frames(msrd)
        assert frames.shape == (2, 3, 120, 160)
        assert len(frames) == 2
        assert frames.h == 120 and frames.w == 160

    def test_valid_depth_mask(self, msrd):
        frames = make_frames(msrd)
        mask = np.asarray(frames.valid_depth_mask)
        np.testing.assert_array_equal(mask, msrd["depths"] > 0)

    def test_indexing(self, msrd):
        frames = make_frames(msrd)
        sub = frames[:, 1]
        assert sub.shape == (2, 1, 120, 160)
        np.testing.assert_allclose(
            np.asarray(sub.vertex_map[:, 0]), msrd["vertex_map"][:, 1], atol=1e-4
        )
        sub2 = frames[0, 0:2]
        assert sub2.shape == (1, 2, 120, 160)

    def test_channels_first_construction(self, msrd):
        cf_rgb = np.moveaxis(msrd["colors"], -1, 2)
        cf_depth = np.moveaxis(msrd["depths"], -1, 2)
        frames = RGBDImages.from_channels_first(
            cf_rgb, cf_depth, msrd["intrinsics"], msrd["poses"]
        )
        np.testing.assert_allclose(np.asarray(frames.rgb_image), msrd["colors"])

    def test_no_poses_global_equals_local(self, msrd):
        frames = RGBDImages(
            rgb_image=jnp.asarray(msrd["colors"]),
            depth_image=jnp.asarray(msrd["depths"]),
            intrinsics=jnp.asarray(msrd["intrinsics"]),
        )
        np.testing.assert_allclose(
            np.asarray(frames.global_vertex_map), np.asarray(frames.vertex_map)
        )

    def test_raises_on_bad_shapes(self, msrd):
        with pytest.raises(ValueError):
            RGBDImages(
                rgb_image=jnp.asarray(msrd["colors"][..., :1]),
                depth_image=jnp.asarray(msrd["depths"]),
                intrinsics=jnp.asarray(msrd["intrinsics"]),
            )
        with pytest.raises(ValueError):
            RGBDImages(
                rgb_image=jnp.asarray(msrd["colors"]),
                depth_image=jnp.asarray(msrd["depths"][:, :1]),
                intrinsics=jnp.asarray(msrd["intrinsics"]),
            )

    def test_pytree_roundtrip(self, msrd):
        frames = make_frames(msrd)
        leaves, treedef = jax.tree_util.tree_flatten(frames)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(
            np.asarray(rebuilt.rgb_image), np.asarray(frames.rgb_image)
        )

    def test_vertex_map_differentiable(self, msrd):
        frames = make_frames(msrd)

        def loss(depth):
            fr = RGBDImages(
                frames.rgb_image, depth, frames.intrinsics, frames.poses
            )
            return jnp.sum(fr.global_vertex_map**2)

        g = jax.grad(loss)(frames.depth_image)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestChannelsFirstLayout:
    """Reference layout parity (rgbdimages.py:242-257, 543-617): the
    channels_first ctor flag, cdim, to_channels_first/last (+ `_` variants),
    and layout-following derived maps."""

    def test_roundtrip_and_cdim(self, msrd):
        frames = make_frames(msrd)
        assert not frames.channels_first and frames.cdim == 4
        cf = frames.to_channels_first()
        assert cf.channels_first and cf.cdim == 2
        assert cf.rgb_image.shape == (2, 3, 3, 120, 160)
        assert cf.depth_image.shape == (2, 3, 1, 120, 160)
        assert cf.shape == frames.shape
        back = cf.to_channels_last()
        np.testing.assert_array_equal(
            np.asarray(back.rgb_image), np.asarray(frames.rgb_image)
        )
        # `_` variants are aliases (pytrees are immutable)
        assert cf.to_channels_first_() is cf
        assert frames.to_channels_last_() is frames

    def test_ctor_flag(self, msrd):
        frames = make_frames(msrd)
        cf = RGBDImages(
            jnp.moveaxis(frames.rgb_image, -1, 2),
            jnp.moveaxis(frames.depth_image, -1, 2),
            frames.intrinsics,
            frames.poses,
            channels_first=True,
        )
        np.testing.assert_array_equal(
            np.asarray(cf.to_channels_last().rgb_image),
            np.asarray(frames.rgb_image),
        )

    def test_derived_maps_follow_layout(self, msrd):
        frames = make_frames(msrd)
        cf = frames.to_channels_first()
        vm = cf.global_vertex_map
        assert vm.shape == (2, 3, 3, 120, 160)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(vm), 2, -1),
            np.asarray(frames.global_vertex_map),
            atol=1e-6,
        )
        nm = cf.normal_map
        assert nm.shape == (2, 3, 3, 120, 160)
        assert cf.valid_depth_mask.shape == (2, 3, 1, 120, 160)
        assert cf[0, 1].channels_first and cf[0, 1].shape == (1, 1, 120, 160)

    def test_jit_static_flag(self, msrd):
        frames = make_frames(msrd)
        cf = frames.to_channels_first()
        out = jax.jit(lambda f: f.to_channels_last().vertex_map)(cf)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(frames.vertex_map), atol=1e-6
        )

    def test_pipeline_accepts_channels_first(self, msrd):
        from gradslam_tpu import PointFusion

        frames = make_frames(msrd)
        slam = PointFusion(odom="gt", map_capacity=120 * 160 * 3)
        pc1, tr1 = slam(frames)
        pc2, tr2 = slam(frames.to_channels_first())
        np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2))
        np.testing.assert_allclose(
            np.asarray(pc1.points), np.asarray(pc2.points)
        )


class TestNormalPitch:
    """Wider-baseline normals (``normal_pitch``): depth-noise normal error
    scales with sigma*fx/(pitch*z), so pitch-1 reference normals degrade as
    resolution rises — 5 mm noise at 320x240 breaks point-to-plane tracking
    outright (docs/design.md §4). Pitch-k differences recover the coarser
    resolution's normal quality at full point density."""

    def _noisy_plane(self, pitch=1, H=60, W=80):
        rng = np.random.RandomState(0)
        rgb = rng.rand(1, 1, H, W, 3).astype(np.float32)
        K = np.eye(4, dtype=np.float32)[None, None]
        K[:, :, 0, 0] = K[:, :, 1, 1] = W
        K[:, :, 0, 2], K[:, :, 1, 2] = W / 2, H / 2
        depth = (1.5 + 0.005 * rng.randn(1, 1, H, W, 1)).astype(np.float32)
        return RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(K),
            normal_pitch=pitch,
        )

    def test_pitch1_is_default_exactly(self, msrd):
        frames = make_frames(msrd)
        import dataclasses

        f1 = dataclasses.replace(frames, normal_pitch=1)
        np.testing.assert_array_equal(
            np.asarray(f1.normal_map), np.asarray(frames.normal_map)
        )

    def test_wider_pitch_denoises_plane_normals(self):
        # true plane normal is +-z; mean |cos(angle)| should rise with pitch
        cos = {}
        for k in (1, 4):
            n = np.asarray(self._noisy_plane(k).normal_map)[0, 0, 8:-8, 8:-8]
            cos[k] = np.abs(n[..., 2]).mean()
        assert cos[4] > cos[1] + 0.05, cos  # measured: 0.89 -> 0.99
        assert cos[4] > 0.97, cos

    def test_pitch_validation(self):
        with pytest.raises(ValueError, match="normal_pitch"):
            self._noisy_plane(pitch=0)
        with pytest.raises(ValueError, match="normal_pitch"):
            _ = self._noisy_plane(pitch=60).normal_map  # >= min(H, W)

    def test_pipeline_threads_pitch(self, msrd):
        # pipeline knob overrides the frames' own pitch; map normals change,
        # and a pitch-1 pipeline equals the default exactly
        from gradslam_tpu import PointFusion

        frames = make_frames(msrd)
        cap = 120 * 160 * 3
        pc_def, _ = PointFusion(odom="gt", map_capacity=cap)(frames)
        pc_p1, _ = PointFusion(odom="gt", map_capacity=cap, normal_pitch=1)(
            frames
        )
        np.testing.assert_array_equal(
            np.asarray(pc_def.normals), np.asarray(pc_p1.normals)
        )
        pc_p3, _ = PointFusion(odom="gt", map_capacity=cap, normal_pitch=3)(
            frames
        )
        assert not np.allclose(
            np.asarray(pc_def.normals), np.asarray(pc_p3.normals)
        )
        # the merged map differs only through the normal-angle fusion gate —
        # same order of magnitude of surviving points, zero drops
        np.testing.assert_allclose(
            np.asarray(pc_p3.num_points), np.asarray(pc_def.num_points),
            rtol=0.2,
        )
        assert int(np.asarray(pc_p3.num_dropped).sum()) == 0

    def test_pitch_rejected_values(self):
        from gradslam_tpu import PointFusion

        with pytest.raises(ValueError, match="normal_pitch"):
            PointFusion(odom="gt", normal_pitch=0)
