"""Dataset tests against tiny on-disk fake TUM/ICL trees — the reference's
weakest spot (its dataset tests only run against hardcoded developer paths,
SURVEY §4.7)."""

import os

import numpy as np
import pytest

from gradslam_tpu.datasets import ICL, TUM, chunk_sequence
from gradslam_tpu.datasets import datautils, tumutils


@pytest.fixture(scope="session")
def fake_tum(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("tum")
    seqdir = root / "rgbd_dataset_freiburg1_fake"
    (seqdir / "rgb").mkdir(parents=True)
    (seqdir / "depth").mkdir()
    rng = np.random.RandomState(0)
    n = 8
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(n):
        t = 1000.0 + i * 0.05
        rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        depth = (rng.rand(48, 64) * 5000 + 1000).astype(np.uint16)
        imageio.imwrite(str(seqdir / "rgb" / f"{t:.6f}.png"), rgb)
        imageio.imwrite(str(seqdir / "depth" / f"{t + 0.003:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.003:.6f} depth/{t + 0.003:.6f}.png")
        # slowly translating camera
        gt_lines.append(
            f"{t + 0.001:.6f} {0.01 * i:.4f} 0 0 0 0 0 1"
        )
    (seqdir / "rgb.txt").write_text("\n".join(rgb_lines))
    (seqdir / "depth.txt").write_text("\n".join(depth_lines))
    (seqdir / "groundtruth.txt").write_text("\n".join(gt_lines))
    (seqdir / "accelerometer.txt").write_text("#")
    return str(root)


@pytest.fixture(scope="session")
def fake_icl(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("icl")
    trajdir = root / "living_room_traj1_frei_png"
    (trajdir / "rgb").mkdir(parents=True)
    (trajdir / "depth").mkdir()
    rng = np.random.RandomState(1)
    n = 6
    assoc, gt = [], []
    for i in range(n):
        rgb = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        depth = (rng.rand(48, 64) * 5000 + 1000).astype(np.uint16)
        imageio.imwrite(str(trajdir / "rgb" / f"{i}.png"), rgb)
        imageio.imwrite(str(trajdir / "depth" / f"{i}.png"), depth)
        assoc.append(f"{i} depth/{i}.png {i} rgb/{i}.png")
        gt.append(f"{i} {0.02 * i:.4f} 0 0 0 0 0 1")
    (trajdir / "associations.txt").write_text("\n".join(assoc))
    (trajdir / "livingRoom1.gt.freiburg").write_text("\n".join(gt))
    return str(root)


class TestChunking:
    def test_reference_diagram(self):
        # seqlen=4, dilation=1, stride=3, start=2 (tum.py:46-57)
        chunks = chunk_sequence(12, seqlen=4, dilation=1, stride=3, start=2, end=None)
        assert chunks[0] == [2, 4, 6, 8]
        assert chunks[1] == [5, 7, 9, 11]

    def test_defaults_non_overlapping(self):
        chunks = chunk_sequence(8, seqlen=4, dilation=None, stride=None, start=None, end=None)
        assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_raises(self):
        with pytest.raises(ValueError):
            chunk_sequence(8, seqlen=4, dilation=-1, stride=None, start=None, end=None)
        with pytest.raises(ValueError):
            chunk_sequence(8, seqlen=4, dilation=None, stride=None, start=5, end=3)


class TestTUM:
    def test_loads_and_shapes(self, fake_tum):
        ds = TUM(fake_tum, seqlen=4, height=24, width=32)
        assert len(ds) == 2
        colors, depths, intrinsics, poses, transforms, name, stamps = ds[0]
        assert colors.shape == (4, 24, 32, 3)
        assert depths.shape == (4, 24, 32, 1)
        assert intrinsics.shape == (4, 4)
        assert poses.shape == (4, 4, 4)
        assert transforms.shape == (4, 4, 4)
        assert name == "rgbd_dataset_freiburg1_fake"

    def test_intrinsics_scaled(self, fake_tum):
        ds = TUM(fake_tum, seqlen=2, height=240, width=320)
        _, _, intrinsics, *_ = ds[0]
        np.testing.assert_allclose(intrinsics[0, 0], 525.0 * 320 / 640)
        np.testing.assert_allclose(intrinsics[1, 2], 239.5 * 240 / 480)

    def test_poses_rebased_to_identity(self, fake_tum):
        ds = TUM(fake_tum, seqlen=4, height=24, width=32)
        _, _, _, poses, *_ = ds[0]
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        # camera translates +x by 0.01/frame in the fake data
        assert poses[1][0, 3] == pytest.approx(0.01, abs=1e-5)

    def test_depth_scaled_to_meters(self, fake_tum):
        ds = TUM(fake_tum, seqlen=2, height=48, width=64)
        _, depths, *_ = ds[0]
        assert depths.max() <= (5000 + 1000) / 5000.0 + 1e-6

    def test_channels_first(self, fake_tum):
        ds = TUM(fake_tum, seqlen=2, height=24, width=32, channels_first=True)
        colors, depths, *_ = ds[0]
        assert colors.shape == (2, 3, 24, 32)
        assert depths.shape == (2, 1, 24, 32)

    def test_missing_basedir_raises(self):
        with pytest.raises(ValueError):
            TUM("/nonexistent/path")


class TestICL:
    def test_loads_and_shapes(self, fake_icl):
        ds = ICL(fake_icl, seqlen=3, height=24, width=32)
        assert len(ds) == 2
        colors, depths, intrinsics, poses, transforms, name = ds[0]
        assert colors.shape == (3, 24, 32, 3)
        assert intrinsics[1, 1] < 0  # the negative fy quirk is preserved
        assert name == "living_room_traj1_frei_png"

    def test_negative_fy_value(self, fake_icl):
        ds = ICL(fake_icl, seqlen=2, height=480, width=640)
        _, _, intrinsics, *_ = ds[0]
        np.testing.assert_allclose(intrinsics[0, 0], 481.2)
        np.testing.assert_allclose(intrinsics[1, 1], -480.0)


class TestDatautils:
    def test_scale_intrinsics(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 525.0, 520.0, 319.5, 239.5
        out = datautils.scale_intrinsics(K, 0.5, 0.25)
        assert out[0, 0] == pytest.approx(525.0 * 0.25)
        assert out[1, 1] == pytest.approx(520.0 * 0.5)
        assert out[0, 2] == pytest.approx(319.5 * 0.25)
        # input untouched
        assert K[0, 0] == 525.0

    def test_pointquaternion_to_homogeneous(self):
        pq = np.asarray([[1.0, 2.0, 3.0, 0, 0, 0, 1]])
        T = datautils.pointquaternion_to_homogeneous(pq)
        np.testing.assert_allclose(T[0][:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(T[0][:3, 3], [1, 2, 3])

    def test_poses_to_transforms_roundtrip(self):
        rng = np.random.RandomState(0)
        from scipy.linalg import expm

        def rand_se3():
            xi = rng.randn(6) * 0.1
            X = np.zeros((4, 4))
            X[:3, :3] = [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]], [-xi[4], xi[3], 0]]
            X[:3, 3] = xi[:3]
            return expm(X)

        poses = [np.eye(4)]
        for _ in range(4):
            poses.append(poses[-1] @ rand_se3())
        poses = np.stack(poses).astype(np.float32)
        transforms = datautils.poses_to_transforms(poses)
        # recompose
        acc = transforms[0]
        for i in range(1, 5):
            acc = acc @ transforms[i]
            np.testing.assert_allclose(acc, poses[i], atol=1e-4)

    def test_normalize_image(self):
        img = np.asarray([[0, 255]], dtype=np.uint8)
        np.testing.assert_allclose(datautils.normalize_image(img), [[0.0, 1.0]])

    def test_create_label_image(self):
        pred = np.asarray([[0, 1], [1, 0]])
        out = datautils.create_label_image(pred, {0: (0, 0, 0), 1: (255, 0, 0)})
        assert out[0, 1].tolist() == [255, 0, 0]

    def test_labels_to_onehot(self):
        lab = np.asarray([[0, 2], [1, 7]])  # 7 out of range
        out = datautils.labels_to_onehot(lab, 3)
        assert out.shape == (2, 2, 3) and out.dtype == np.float32
        np.testing.assert_allclose(out[0, 0], [1, 0, 0])
        np.testing.assert_allclose(out[0, 1], [0, 0, 1])
        np.testing.assert_allclose(out[1, 1], [0, 0, 0])  # no evidence

    def test_labels_to_onehot_raises(self):
        with pytest.raises(TypeError):
            datautils.labels_to_onehot(np.zeros((2, 2), np.float32), 3)
        with pytest.raises(ValueError):
            datautils.labels_to_onehot(np.zeros((2, 2), np.int32), 0)


class TestTumutils:
    def test_read_file_list_and_associate(self, tmp_path):
        f1 = tmp_path / "a.txt"
        f1.write_text("# header\n1.00 a\n2.00 b\n3.00 c")
        f2 = tmp_path / "b.txt"
        f2.write_text("1.01 x\n2.02 y\n5.00 z")
        l1 = tumutils.read_file_list(str(f1))
        l2 = tumutils.read_file_list(str(f2))
        matches = tumutils.associate(l1, l2, 0.0, 0.05)
        assert matches == [(1.00, 1.01), (2.00, 2.02)]

    def test_transform44_small_norm(self):
        # degenerate quaternion -> identity rotation (crashes in the reference)
        T = tumutils.transform44([0.0, 1.0, 2.0, 3.0, 0, 0, 0, 0])
        np.testing.assert_allclose(T[:3, :3], np.eye(3))
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3])

    def test_read_trajectory(self, tmp_path):
        f = tmp_path / "traj.txt"
        f.write_text("1.0 0 0 0 0 0 0 1\n2.0 1 0 0 0 0 0 1")
        traj = tumutils.read_trajectory(str(f))
        assert len(traj) == 2
        np.testing.assert_allclose(traj[2.0][:3, 3], [1, 0, 0])


class TestSyntheticRGBD:
    def test_dataset_contract(self):
        from gradslam_tpu.datasets import SyntheticRGBD

        ds = SyntheticRGBD(num_sequences=2, seqlen=3, height=24, width=32)
        assert len(ds) == 2
        colors, depths, intrinsics, poses, transforms, name = ds[0]
        assert colors.shape == (3, 24, 32, 3)
        assert depths.shape == (3, 24, 32, 1)
        assert intrinsics.shape == (4, 4)
        assert poses.shape == (3, 4, 4)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        assert name == "synthetic_0"

    def test_static_scene_consistency(self):
        """Backprojected frames must land on the same world surface (the
        property that makes the benchmark workload honest)."""
        import jax.numpy as jnp
        from gradslam_tpu.datasets import synthetic_sequence
        from gradslam_tpu import RGBDImages

        rgb, depths, K, poses = synthetic_sequence(1, 3, 60, 80)
        frames = RGBDImages(
            jnp.asarray(rgb), jnp.asarray(depths), jnp.asarray(K), jnp.asarray(poses)
        )
        gvm = np.asarray(frames.global_vertex_map)
        # same pixel across frames tracks a (nearly) static surface point:
        # world z at the surface changes < 2 mm between consecutive frames
        z0, z1 = gvm[0, 0, 30, 40, 2], gvm[0, 1, 30, 40, 2]
        assert abs(z0 - z1) < 2e-3
