"""Pallas KNN kernel tests — run in interpreter mode on CPU (the kernel is
exercised compiled on real TPU by the benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.ops import get_knn_backend, nn_points, set_knn_backend
from gradslam_tpu.ops.knn_pallas import nn_points_pallas


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


class TestPallasKNN:
    def test_matches_xla(self):
        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(600, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(1100, 3).astype(np.float32))
        d1, i1 = nn_points(src, tgt)
        d2, i2 = nn_points_pallas(src, tgt)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)

    def test_masked(self):
        rng = np.random.RandomState(1)
        src = jnp.asarray(rng.randn(100, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(300, 3).astype(np.float32))
        mask = jnp.asarray(rng.rand(300) < 0.5)
        d1, i1 = nn_points(src, tgt, mask)
        d2, i2 = nn_points_pallas(src, tgt, mask)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_nan_in_masked_target_rows_is_harmless(self):
        # Review r2: non-finite padding garbage must not NaN its whole
        # target tile in the Pallas kernel either (shared _apply_tgt_mask).
        rng = np.random.RandomState(8)
        src = rng.randn(30, 3).astype(np.float32)
        tgt = rng.randn(64, 3).astype(np.float32)
        mask = np.ones(64, dtype=bool)
        mask[50:] = False
        tgt_nan = tgt.copy()
        tgt_nan[50:] = np.nan
        d1, i1 = nn_points(jnp.asarray(src), jnp.asarray(tgt[:50]))
        d2, i2 = nn_points_pallas(
            jnp.asarray(src), jnp.asarray(tgt_nan), jnp.asarray(mask)
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)

    def test_batched(self):
        rng = np.random.RandomState(2)
        src = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(2, 80, 3).astype(np.float32))
        d1, i1 = nn_points(src, tgt)
        d2, i2 = nn_points_pallas(src, tgt)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestBackendSwitch:
    def test_set_get(self):
        assert get_knn_backend() == "auto"
        set_knn_backend("pallas")
        assert get_knn_backend() == "pallas"
        set_knn_backend("xla")
        assert get_knn_backend() == "xla"
        with pytest.raises(ValueError):
            set_knn_backend("cuda")
        set_knn_backend("auto")

    def test_auto_resolves_to_xla_on_cpu(self):
        # On a CPU backend, auto must dispatch to the XLA streaming kernel.
        from gradslam_tpu.ops import _resolve_backend

        tgt = jnp.zeros((128, 3), jnp.float32)
        if jax.default_backend() != "tpu":
            assert _resolve_backend(tgt, tgt) == "xla"

    def test_auto_guards_src_vmem_and_dtype(self):
        # Review r2: the guard must bound the SOURCE side too (the kernel
        # keeps all of src in VMEM) and must not route non-f32 inputs to the
        # f32-only kernel. Exercise the guard logic directly (host-side
        # arithmetic; holds on any backend).
        import gradslam_tpu.ops as ops

        small = jnp.zeros((1000, 3), jnp.float32)
        huge_src = jnp.zeros((900_000, 3), jnp.float32)  # ~14 MB padded src4
        resident = (
            ops.knn_pallas._round_up(900_000, ops.knn_pallas._SRC_TILE) * 24
            + ops.knn_pallas._round_up(1000, ops.knn_pallas._TGT_TILE) * 20
            + ops.knn_pallas._SRC_TILE * ops.knn_pallas._TGT_TILE * 4
        )
        assert resident > ops._PALLAS_VMEM_BUDGET
        assert ops._resolve_backend(huge_src, small) == "xla"
        f64 = jnp.zeros((128, 3), jnp.float64)  # x64 disabled -> f32; checks dtype path
        if f64.dtype != jnp.float32:
            assert ops._resolve_backend(f64, f64) == "xla"
