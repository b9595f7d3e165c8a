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
