"""Tensor-aliasing semantics of clone/detach/to/__getitem__ — the analogue of
the reference's assertSeparate/assertNotSeparate suite
(/root/reference/tests/common_testing.py:39-87).

JAX arrays are immutable, so "shares storage" can't corrupt data the way a
torch view can; what remains observable (and is asserted here) is the
documented contract:

- ``clone``   -> NEW buffers, equal values, gradients still flow;
- ``detach``  -> equal values, gradients STOPPED;
- ``to``      -> same values on the target device;
- ``__getitem__`` -> selected values equal the source (no copy-on-write
  surprises possible), and the source is unaffected by anything done with
  the slice.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gradslam_tpu import Pointclouds, RGBDImages


def make_pc():
    rng = np.random.RandomState(0)
    return Pointclouds.from_list(
        [rng.randn(5, 3), rng.randn(3, 3)],
        normals=[rng.randn(5, 3), rng.randn(3, 3)],
        colors=[rng.rand(5, 3), rng.rand(3, 3)],
        capacity=8,
    )


def make_frames():
    rng = np.random.RandomState(1)
    return RGBDImages(
        jnp.asarray(rng.rand(1, 2, 6, 8, 3), dtype=jnp.float32),
        jnp.asarray(rng.rand(1, 2, 6, 8, 1), dtype=jnp.float32),
        jnp.asarray(np.eye(4, dtype=np.float32)[None, None]),
        jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (1, 2, 4, 4))),
    )


def _leaves(obj):
    return jax.tree_util.tree_leaves(obj)


class TestPointcloudsAliasing:
    def test_clone_is_separate_and_equal(self):
        pc = make_pc()
        c = pc.clone()
        for a, b in zip(_leaves(pc), _leaves(c)):
            assert a is not b  # separate buffers (assertSeparate)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_clone_keeps_gradients(self):
        pc = make_pc()

        def loss(pts):
            import dataclasses

            return jnp.sum(dataclasses.replace(pc, points=pts).clone().points ** 2)

        g = jax.grad(loss)(pc.points)
        assert float(jnp.abs(g).max()) > 0

    def test_detach_equal_values_but_stops_grad(self):
        pc = make_pc()
        d = pc.detach()
        for a, b in zip(_leaves(pc), _leaves(d)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(pts):
            import dataclasses

            return jnp.sum(dataclasses.replace(pc, points=pts).detach().points ** 2)

        g = jax.grad(loss)(pc.points)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_to_preserves_values(self):
        pc = make_pc()
        moved = pc.to(jax.devices()[0])
        for a, b in zip(_leaves(pc), _leaves(moved)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_getitem_values_match_and_source_unaffected(self):
        pc = make_pc()
        before = [np.asarray(x).copy() for x in _leaves(pc)]
        sub = pc[1]
        assert len(sub) == 1
        np.testing.assert_array_equal(
            np.asarray(sub.points[0]), np.asarray(pc.points[1])
        )
        _ = sub.offset(jnp.ones(3))  # derived work cannot touch the source
        for a, b in zip(before, _leaves(pc)):
            np.testing.assert_array_equal(a, np.asarray(b))


class TestRGBDImagesAliasing:
    def test_clone_is_separate_and_equal(self):
        fr = make_frames()
        c = fr.clone()
        for a, b in zip(_leaves(fr), _leaves(c)):
            assert a is not b
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_detach_stops_grad_through_vertex_map(self):
        fr = make_frames()

        def loss(depth):
            import dataclasses

            f = dataclasses.replace(fr, depth_image=depth).detach()
            return jnp.sum(f.vertex_map**2)

        g = jax.grad(loss)(fr.depth_image)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_getitem_keeps_source(self):
        fr = make_frames()
        before = np.asarray(fr.rgb_image).copy()
        sub = fr[:, 0]
        assert sub.shape[1] == 1
        np.testing.assert_array_equal(
            np.asarray(sub.rgb_image[:, 0]), np.asarray(fr.rgb_image[:, 0])
        )
        np.testing.assert_array_equal(before, np.asarray(fr.rgb_image))
