import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.ops import knn_points, nn_points


def brute_force(src, tgt):
    d = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


class TestNNPoints:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        src = rng.randn(157, 3).astype(np.float32)
        tgt = rng.randn(411, 3).astype(np.float32)
        d, i = nn_points(jnp.asarray(src), jnp.asarray(tgt), tile_size=64)
        bd, bi = brute_force(src, tgt)
        np.testing.assert_array_equal(np.asarray(i), bi)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)

    def test_masked_targets_never_win(self):
        rng = np.random.RandomState(1)
        src = rng.randn(50, 3).astype(np.float32)
        tgt = rng.randn(100, 3).astype(np.float32)
        # make the first 10 targets coincide with sources but mask them out
        tgt[:10] = src[:10]
        mask = np.ones(100, dtype=bool)
        mask[:10] = False
        d, i = nn_points(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        assert np.all(np.asarray(i) >= 10)
        bd, bi = brute_force(src, tgt[10:])
        np.testing.assert_array_equal(np.asarray(i), bi + 10)

    def test_batched(self):
        rng = np.random.RandomState(2)
        src = rng.randn(3, 40, 3).astype(np.float32)
        tgt = rng.randn(3, 70, 3).astype(np.float32)
        d, i = nn_points(jnp.asarray(src), jnp.asarray(tgt))
        for b in range(3):
            bd, bi = brute_force(src[b], tgt[b])
            np.testing.assert_array_equal(np.asarray(i[b]), bi)

    def test_non_multiple_tile(self):
        rng = np.random.RandomState(3)
        src = rng.randn(17, 3).astype(np.float32)
        tgt = rng.randn(33, 3).astype(np.float32)
        d, i = nn_points(jnp.asarray(src), jnp.asarray(tgt), tile_size=32)
        bd, bi = brute_force(src, tgt)
        np.testing.assert_array_equal(np.asarray(i), bi)

    def test_differentiable(self):
        rng = np.random.RandomState(4)
        src = jnp.asarray(rng.randn(20, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(30, 3).astype(np.float32))

        def loss(s):
            d, _ = nn_points(s, tgt)
            return jnp.sum(d)

        g = jax.grad(loss)(src)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_chamferdist_compatible_alias(self):
        rng = np.random.RandomState(5)
        src = jnp.asarray(rng.randn(1, 20, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(1, 30, 3).astype(np.float32))
        res = knn_points(src, tgt)
        assert res.dists.shape == (1, 20, 1)
        assert res.idx.shape == (1, 20, 1)

    def test_raises_on_bad_shapes(self):
        with pytest.raises(ValueError):
            nn_points(jnp.zeros((10, 2)), jnp.zeros((10, 3)))
        with pytest.raises(ValueError):
            nn_points(jnp.zeros((10, 3)), jnp.zeros((2, 10, 3)))
