"""PLY export/import round-trips (gradslam_tpu.structures.io)."""

import numpy as np
import pytest

from gradslam_tpu import Pointclouds
from gradslam_tpu.structures import load_ply, save_ply


@pytest.fixture
def cloud():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    nrm = rng.randn(100, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    col = rng.rand(100, 3).astype(np.float32)
    return pts, nrm, col


class TestPlyRoundTrip:
    @pytest.mark.parametrize("binary", [True, False])
    def test_full_roundtrip(self, tmp_path, cloud, binary):
        pts, nrm, col = cloud
        path = str(tmp_path / "cloud.ply")
        save_ply(path, pts, normals=nrm, colors=col, binary=binary)
        out = load_ply(path)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-5)
        np.testing.assert_allclose(out["normals"], nrm, rtol=1e-5)
        # colors quantized to uchar: 1/255 resolution
        np.testing.assert_allclose(out["colors"], col, atol=1.0 / 255.0 + 1e-6)

    def test_points_only(self, tmp_path, cloud):
        pts, _, _ = cloud
        path = str(tmp_path / "pts.ply")
        save_ply(path, pts)
        out = load_ply(path)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-5)
        assert "normals" not in out and "colors" not in out

    def test_255_range_colors(self, tmp_path, cloud):
        pts, _, col = cloud
        path = str(tmp_path / "c255.ply")
        save_ply(path, pts, colors=(col * 255).astype(np.uint8))
        out = load_ply(path)
        np.testing.assert_allclose(out["colors"], col, atol=1.0 / 255.0 + 1e-6)

    def test_color_convention_is_dtype_driven(self, tmp_path, cloud):
        """ADVICE r1: no value-range guessing — float dtypes are [0, 1],
        integer dtypes are [0, 255]. A nearly-black int image must NOT be
        brightened 255x; an out-of-range float must be clipped."""
        pts, _, _ = cloud
        n = pts.shape[0]
        # int colors, all values <= 1 (nearly black): stay nearly black
        dark = np.ones((n, 3), dtype=np.int32)
        path = str(tmp_path / "dark.ply")
        save_ply(path, pts, colors=dark)
        out = load_ply(path)
        np.testing.assert_allclose(out["colors"], 1.0 / 255.0, atol=1e-6)
        # float colors out of [0, 1]: clipped, not passed through as 0-255
        bright = np.full((n, 3), 2.0, dtype=np.float32)
        path = str(tmp_path / "bright.ply")
        save_ply(path, pts, colors=bright)
        out = load_ply(path)
        np.testing.assert_allclose(out["colors"], 1.0, atol=1e-6)

    def test_bad_shapes_raise(self, tmp_path, cloud):
        pts, nrm, _ = cloud
        with pytest.raises(ValueError):
            save_ply(str(tmp_path / "x.ply"), pts[:, :2])
        with pytest.raises(ValueError):
            save_ply(str(tmp_path / "x.ply"), pts, normals=nrm[:50])

    def test_not_a_ply_raises(self, tmp_path):
        path = tmp_path / "bogus.ply"
        path.write_text("hello\nworld\n")
        with pytest.raises(ValueError):
            load_ply(str(path))


class TestPointcloudsSavePly:
    def test_method_exports_valid_points(self, tmp_path, cloud):
        pts, nrm, col = cloud
        pc = Pointclouds.from_list(
            points=[pts[:60], pts[60:]],
            normals=[nrm[:60], nrm[60:]],
            colors=[col[:60], col[60:]],
        )
        path = str(tmp_path / "b1.ply")
        pc.save_ply(path, index=1)
        out = load_ply(path)
        assert out["points"].shape == (40, 3)
        np.testing.assert_allclose(out["points"], pts[60:], rtol=1e-5)
        np.testing.assert_allclose(out["normals"], nrm[60:], rtol=1e-5)


class TestParityAttributes:
    """Torch-style attributes found by the reference API audit."""

    def test_device_and_equisized(self):
        import jax

        pc = Pointclouds.from_list(
            points=[np.zeros((5, 3), np.float32), np.zeros((5, 3), np.float32)]
        )
        assert pc.device in jax.devices()
        assert pc.equisized is True
        pc2 = Pointclouds.from_list(
            points=[np.zeros((5, 3), np.float32), np.zeros((3, 3), np.float32)]
        )
        assert pc2.equisized is False

    def test_rgbdimages_device(self):
        import jax
        import jax.numpy as jnp

        from gradslam_tpu import RGBDImages

        fr = RGBDImages(
            jnp.zeros((1, 1, 4, 6, 3)), jnp.zeros((1, 1, 4, 6, 1)),
            jnp.eye(4)[None, None],
        )
        assert fr.device in jax.devices()
