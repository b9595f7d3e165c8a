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

    def test_nan_in_first_row_does_not_poison_other_rows(self):
        # Review r2 (confirmed by execution): the shard_map vma-coupling term
        # 0.0 * (src[0,0] + tgt[0,0]) turned the init best-dist NaN whenever
        # either first element was non-finite, degrading EVERY row's
        # association to index 0.
        rng = np.random.RandomState(6)
        src = rng.randn(40, 3).astype(np.float32)
        tgt = rng.randn(60, 3).astype(np.float32)
        bd, bi = brute_force(src, tgt)
        src_nan = src.copy()
        src_nan[0] = np.nan
        d, i = nn_points(jnp.asarray(src_nan), jnp.asarray(tgt), tile_size=32)
        # rows 1.. keep their true nearest neighbour
        np.testing.assert_array_equal(np.asarray(i)[1:], bi[1:])
        np.testing.assert_allclose(np.asarray(d)[1:], bd[1:], atol=1e-5)

    def test_auto_accepts_non_array_inputs(self):
        # Review r2: _resolve_backend reads .dtype/.shape — a Python-list
        # src (accepted by both kernels via jnp.asarray) must not crash the
        # auto front door.
        from gradslam_tpu.ops import nn_points_auto

        d, i = nn_points_auto([[0.0, 0.0, 0.0]], jnp.zeros((5, 3), jnp.float32))
        assert d.shape == (1,) and i.shape == (1,)
        # malformed rank still raises the clean ValueError, not IndexError
        with pytest.raises(ValueError):
            nn_points_auto(jnp.zeros((3,)), jnp.zeros((5, 3)))

    def test_nan_in_masked_target_rows_is_harmless(self):
        # Non-finite garbage in PADDING rows must not NaN its whole target
        # tile (which would exclude that tile's valid targets from the min).
        rng = np.random.RandomState(7)
        src = rng.randn(30, 3).astype(np.float32)
        tgt = rng.randn(64, 3).astype(np.float32)
        mask = np.ones(64, dtype=bool)
        mask[50:] = False
        tgt_nan = tgt.copy()
        tgt_nan[50:] = np.nan
        d, i = nn_points(
            jnp.asarray(src), jnp.asarray(tgt_nan), jnp.asarray(mask),
            tile_size=32,
        )
        bd, bi = brute_force(src, tgt[:50])
        np.testing.assert_array_equal(np.asarray(i), bi)
        np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)


class TestKNNPointsK:
    """chamferdist-compatible K-NN (K > 1 via the streaming top-K path)."""

    def brute_topk(self, src, tgt, K):
        d = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :K]
        return np.take_along_axis(d, idx, axis=1), idx

    def test_matches_brute_force_topk(self):
        rng = np.random.RandomState(1)
        src = rng.randn(83, 3).astype(np.float32)
        tgt = rng.randn(301, 3).astype(np.float32)
        K = 5
        res = knn_points(jnp.asarray(src), jnp.asarray(tgt), K=K, tile_size=64)
        bd, bi = self.brute_topk(src, tgt, K)
        np.testing.assert_allclose(np.asarray(res.dists), bd, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(res.idx), bi)

    def test_nan_in_masked_rows_and_k_independent_nn_padding(self):
        # Review r2: (a) non-finite garbage past lengths2 must not poison the
        # top-K merge; (b) with return_nn, the values gathered for masked
        # slots must not depend on K (K==1 used to gather from the RAW tgt,
        # K>1 from the zeroed copy).
        rng = np.random.RandomState(11)
        src = rng.randn(20, 3).astype(np.float32)
        tgt = rng.randn(64, 3).astype(np.float32)
        tgt_nan = tgt.copy()
        tgt_nan[40:] = np.nan
        for K in (1, 3):
            res = knn_points(
                jnp.asarray(src), jnp.asarray(tgt_nan),
                lengths2=jnp.asarray(40), K=K, return_nn=True, tile_size=32,
            )
            bd, bi = self.brute_topk(src, tgt[:40], K)
            np.testing.assert_array_equal(np.asarray(res.idx), bi)
            np.testing.assert_allclose(np.asarray(res.dists), bd, atol=1e-4)
            assert np.isfinite(np.asarray(res.knn)).all(), f"K={K}"

    def test_batched_with_lengths_and_nn(self):
        rng = np.random.RandomState(2)
        src = rng.randn(2, 40, 3).astype(np.float32)
        tgt = rng.randn(2, 100, 3).astype(np.float32)
        lengths1 = np.asarray([40, 25])
        lengths2 = np.asarray([100, 60])
        K = 3
        res = knn_points(
            jnp.asarray(src), jnp.asarray(tgt),
            lengths1=jnp.asarray(lengths1), lengths2=jnp.asarray(lengths2),
            K=K, return_nn=True, tile_size=32,
        )
        assert res.dists.shape == (2, 40, K)
        assert res.knn.shape == (2, 40, K, 3)
        for b in range(2):
            bd, bi = self.brute_topk(src[b], tgt[b, : lengths2[b]], K)
            n1 = lengths1[b]
            np.testing.assert_allclose(
                np.asarray(res.dists[b, :n1]), bd[:n1], atol=1e-4
            )
            np.testing.assert_array_equal(np.asarray(res.idx[b, :n1]), bi[:n1])
            # rows past lengths1 are zeroed (chamferdist convention)
            np.testing.assert_array_equal(np.asarray(res.dists[b, n1:]), 0.0)
            # gathered neighbours match the indices
            np.testing.assert_allclose(
                np.asarray(res.knn[b, :n1]),
                tgt[b][np.asarray(res.idx[b, :n1])],
                atol=1e-6,
            )

    def test_k1_equals_nn_points(self):
        rng = np.random.RandomState(3)
        src = rng.randn(50, 3).astype(np.float32)
        tgt = rng.randn(70, 3).astype(np.float32)
        res = knn_points(jnp.asarray(src), jnp.asarray(tgt))
        d, i = nn_points(jnp.asarray(src), jnp.asarray(tgt))
        np.testing.assert_allclose(np.asarray(res.dists[..., 0]), np.asarray(d))
        np.testing.assert_array_equal(np.asarray(res.idx[..., 0]), np.asarray(i))

    def test_tie_break_smallest_index(self):
        tgt = np.asarray([[1.0, 0, 0], [0, 0, 0], [0, 0, 0], [1, 0, 0]],
                         dtype=np.float32)
        src = np.zeros((1, 3), dtype=np.float32)
        res = knn_points(jnp.asarray(src), jnp.asarray(tgt), K=4, tile_size=2)
        np.testing.assert_array_equal(np.asarray(res.idx[0]), [1, 2, 0, 3])

    def test_validation(self):
        src = jnp.zeros((4, 3))
        tgt = jnp.zeros((5, 3))
        with pytest.raises(ValueError):
            knn_points(src, tgt, K=0)
        with pytest.raises(ValueError):
            knn_points(src, tgt, K=6)

    def test_chamferdist_positional_order(self):
        """Reference code calls knn_points(p1, p2, lengths1, lengths2, K,
        return_nn) positionally (chamferdist/pytorch3d order) — ADVICE r1:
        lengths must NOT be swallowed by a mask parameter."""
        rng = np.random.RandomState(4)
        src = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
        l1 = jnp.asarray([10, 6])
        l2 = jnp.asarray([20, 15])
        pos = knn_points(src, tgt, l1, l2, 2, True)
        kw = knn_points(
            src, tgt, lengths1=l1, lengths2=l2, K=2, return_nn=True
        )
        np.testing.assert_array_equal(np.asarray(pos.dists), np.asarray(kw.dists))
        np.testing.assert_array_equal(np.asarray(pos.idx), np.asarray(kw.idx))
        np.testing.assert_array_equal(np.asarray(pos.knn), np.asarray(kw.knn))
        # lengths actually took effect: rows past lengths1 zeroed
        np.testing.assert_array_equal(np.asarray(pos.dists[1, 6:]), 0.0)

    def test_fewer_than_k_valid_targets_zero_padded(self):
        """Slots beyond the valid-target count return dist 0 / idx 0
        (pytorch3d zero-pad), not the internal 1e30 sentinel."""
        tgt = jnp.asarray(
            [[[1.0, 0, 0], [2.0, 0, 0], [9.0, 0, 0], [9.0, 0, 0]]]
        )
        src = jnp.zeros((1, 2, 3))
        res = knn_points(src, tgt, lengths2=jnp.asarray([2]), K=3)
        d = np.asarray(res.dists)
        i = np.asarray(res.idx)
        np.testing.assert_allclose(d[0, :, :2], [[1.0, 4.0]] * 2)
        np.testing.assert_array_equal(d[0, :, 2], 0.0)
        np.testing.assert_array_equal(i[0, :, 2], 0)
        # same via tgt_mask (keyword-only)
        mask = jnp.asarray([[True, True, False, False]])
        res2 = knn_points(src, tgt, K=3, tgt_mask=mask)
        np.testing.assert_array_equal(np.asarray(res2.dists), d)
        np.testing.assert_array_equal(np.asarray(res2.idx), i)

    def test_unbatched_scalar_lengths(self):
        """Scalar (0-d) lengths are the natural unbatched form — must not
        crash on promotion (ADVICE r1)."""
        rng = np.random.RandomState(5)
        src = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(12, 3).astype(np.float32))
        res = knn_points(src, tgt, 8, 12, 2)
        res_scalar = knn_points(
            src, tgt, jnp.asarray(8), jnp.asarray(12), 2
        )
        np.testing.assert_array_equal(
            np.asarray(res.dists), np.asarray(res_scalar.dists)
        )
        assert res_scalar.dists.shape == (8, 2)
