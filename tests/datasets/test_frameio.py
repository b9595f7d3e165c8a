"""Native frameio loader tests (skipped when native/build.sh hasn't run)."""

import numpy as np
import pytest

from gradslam_tpu.datasets import frameio

pytestmark = pytest.mark.skipif(
    not frameio.is_available(), reason="native frameio library not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    depth = (rng.rand(48, 64) * 5000 + 500).astype(np.uint16)
    cpath = str(root / "c.png")
    dpath = str(root / "d.png")
    imageio.imwrite(cpath, rgb)
    imageio.imwrite(dpath, depth)
    return cpath, dpath, rgb, depth


class TestDecode:
    def test_color_same_size(self, images):
        cpath, _, rgb, _ = images
        out = frameio.decode_color(cpath, 48, 64)
        assert out.shape == (48, 64, 3)
        np.testing.assert_allclose(out, rgb.astype(np.float32), atol=1e-3)

    def test_color_resize_matches_cv2(self, images):
        import cv2

        cpath, _, rgb, _ = images
        out = frameio.decode_color(cpath, 24, 32)
        ref = cv2.resize(rgb, (32, 24), interpolation=cv2.INTER_LINEAR)
        # bilinear implementations agree closely
        assert np.abs(out - ref.astype(np.float32)).mean() < 2.0

    def test_color_normalized(self, images):
        cpath, _, rgb, _ = images
        out = frameio.decode_color(cpath, 48, 64, normalize=True)
        np.testing.assert_allclose(out, rgb.astype(np.float32) / 255.0, atol=1e-5)

    def test_depth_scaled(self, images):
        _, dpath, _, depth = images
        out = frameio.decode_depth(dpath, 48, 64, 5000.0)
        np.testing.assert_allclose(out, depth.astype(np.float32) / 5000.0, atol=1e-6)

    def test_missing_file(self):
        assert frameio.decode_color("/nonexistent.png", 4, 4) is None


class TestDatasetNativeLoader:
    """loader='native' threads the whole sample through the C++ prefetching
    loader; at the stored resolution (no resize) it must match the default
    cv2/imageio path bit-closely."""

    def test_tum_native_matches_cv2(self, tmp_path):
        import imageio.v2 as imageio

        from gradslam_tpu.datasets import TUM

        root = tmp_path / "tum"
        seqdir = root / "rgbd_dataset_freiburg1_fake"
        (seqdir / "rgb").mkdir(parents=True)
        (seqdir / "depth").mkdir()
        rng = np.random.RandomState(0)
        rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
        for i in range(4):
            t = 1000.0 + i * 0.05
            rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            depth = (rng.rand(48, 64) * 5000 + 1000).astype(np.uint16)
            imageio.imwrite(str(seqdir / "rgb" / f"{t:.6f}.png"), rgb)
            imageio.imwrite(str(seqdir / "depth" / f"{t + 0.003:.6f}.png"), depth)
            rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
            depth_lines.append(f"{t + 0.003:.6f} depth/{t + 0.003:.6f}.png")
            gt_lines.append(f"{t + 0.001:.6f} {0.01 * i:.4f} 0 0 0 0 0 1")
        (seqdir / "rgb.txt").write_text("\n".join(rgb_lines))
        (seqdir / "depth.txt").write_text("\n".join(depth_lines))
        (seqdir / "groundtruth.txt").write_text("\n".join(gt_lines))
        (seqdir / "accelerometer.txt").write_text("#")

        ref_ds = TUM(str(root), seqlen=4, height=48, width=64)
        nat_ds = TUM(str(root), seqlen=4, height=48, width=64, loader="native")
        c0, d0, *rest0 = ref_ds[0]
        c1, d1, *rest1 = nat_ds[0]
        np.testing.assert_allclose(c1, c0, atol=1e-3)
        np.testing.assert_allclose(d1, d0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rest1[1]), np.asarray(rest0[1]))

    def test_bad_loader_name_raises(self):
        from gradslam_tpu.datasets.base import RGBDSequenceDataset

        with pytest.raises(ValueError):
            RGBDSequenceDataset(loader="gpu")


class TestLoader:
    def test_prefetch_roundtrip(self, images):
        cpath, dpath, rgb, depth = images
        loader = frameio.FrameLoader(48, 64, depth_scale=5000.0, num_threads=2)
        loader.submit_sequence([cpath] * 4, [dpath] * 4)
        for i in range(4):
            r, d = loader.fetch(i)
            np.testing.assert_allclose(r, rgb.astype(np.float32), atol=1e-3)
            np.testing.assert_allclose(d, depth.astype(np.float32) / 5000.0, atol=1e-6)
        loader.close()

    def test_out_of_order_fetch(self, images):
        cpath, dpath, rgb, _ = images
        loader = frameio.FrameLoader(24, 32, depth_scale=1000.0, num_threads=3)
        loader.submit_sequence([cpath] * 6, [dpath] * 6)
        for i in reversed(range(6)):
            r, _ = loader.fetch(i)
            assert r.shape == (24, 32, 3)
        loader.close()
