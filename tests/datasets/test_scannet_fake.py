"""ScanNet loader test against a tiny fake on-disk scene tree."""

import numpy as np
import pytest

from gradslam_tpu.datasets import Scannet


@pytest.fixture(scope="module")
def fake_scannet(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("scannet")
    scans = root / "scans"
    meta = root / "seqmeta"
    meta.mkdir()
    scene = scans / "scene0000_00"
    for sub in ("color", "depth", "pose", "label-filt", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 4
    lines = []
    np.savetxt(str(scene / "intrinsic" / "intrinsic_depth.txt"),
               np.diag([400.0, 400.0, 1.0, 1.0]))
    for i in range(n):
        imageio.imwrite(str(scene / "color" / f"{i}.jpg"),
                        (rng.rand(48, 64, 3) * 255).astype(np.uint8))
        imageio.imwrite(str(scene / "depth" / f"{i}.png"),
                        (rng.rand(48, 64) * 3000 + 500).astype(np.uint16))
        imageio.imwrite(str(scene / "label-filt" / f"{i}.png"),
                        rng.randint(0, 41, (48, 64)).astype(np.uint8))
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        np.savetxt(str(scene / "pose" / f"{i}.txt"), pose)
        lines.append(
            f"color scene0000_00/color/{i}.jpg depth scene0000_00/depth/{i}.png "
            f"pose scene0000_00/pose/{i}.txt label-filt scene0000_00/label-filt/{i}.png "
            f"intrinsic_color x extrinsic_color y extrinsic_depth z "
            f"intrinsic_depth scene0000_00/intrinsic/intrinsic_depth.txt"
        )
    (meta / "scene0000_00-seq_0.txt").write_text("\n".join(lines))
    return str(scans), str(meta)


class TestScannetFake:
    def test_loads_and_shapes(self, fake_scannet):
        scans, meta = fake_scannet
        ds = Scannet(scans, meta, scenes=("scene0000_00",), start=0, end=4,
                     height=24, width=32)
        assert len(ds) == 1
        colors, depths, intrinsics, poses, transforms, name, labels = ds[0]
        assert colors.shape == (4, 24, 32, 3)
        assert depths.shape == (4, 24, 32, 1)
        assert labels.shape == (4, 24, 32, 1)
        assert name == "scene0000_00-seq_0"
        # depth scaled by 1/1000
        assert depths.max() <= 3.6
        # poses re-based to identity
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(poses[1][0, 3], 0.05, atol=1e-5)
        # intrinsics scaled for resize (400 * 32/640)
        np.testing.assert_allclose(intrinsics[0, 0], 400.0 * 32 / 640, atol=1e-4)

    def test_scene_filter(self, fake_scannet):
        scans, meta = fake_scannet
        ds = Scannet(scans, meta, scenes=("scene9999_99",), height=24, width=32)
        assert len(ds) == 0

    def test_labels_remapped_to_scannet20(self, fake_scannet):
        scans, meta = fake_scannet
        ds = Scannet(scans, meta, scenes=None, height=24, width=32,
                     seg_classes="scannet20")
        *_, labels = ds[0]
        assert labels.max() <= 20

    def test_nyu40_labels_not_remapped(self, fake_scannet):
        scans, meta = fake_scannet
        ds = Scannet(scans, meta, scenes=None, height=48, width=64,
                     seg_classes="nyu40")
        *_, labels = ds[0]
        assert labels.max() <= 40

    def test_semantic_fusion_end_to_end(self, fake_scannet):
        # ScanNet labels -> one-hot feature plane -> PointFusion semantic
        # map (the capability the reference drops: its loader returns labels
        # but its pipelines ignore them).
        import jax.numpy as jnp

        from gradslam_tpu import PointFusion, RGBDImages
        from gradslam_tpu.datasets.datautils import labels_to_onehot

        scans, meta = fake_scannet
        ds = Scannet(scans, meta, scenes=None, start=0, end=3,
                     height=24, width=32, seg_classes="scannet20")
        colors, depths, intrinsics, poses, _, _, labels = ds[0]
        onehot = labels_to_onehot(np.asarray(labels).squeeze(-1), 21)
        frames = RGBDImages(
            jnp.asarray(colors)[None], jnp.asarray(depths)[None],
            jnp.asarray(intrinsics)[None, None], jnp.asarray(poses)[None],
            feature_image=jnp.asarray(onehot)[None],
        )
        slam = PointFusion(odom="gt", feature_channels=21, use_jit=False)
        pc, _ = slam(frames)
        n = int(pc.num_points[0])
        assert n > 0
        fused = np.asarray(pc.features[0, :n, 1:])
        # every fused one-hot stays a convex combination over classes
        np.testing.assert_allclose(fused.sum(-1), 1.0, atol=1e-5)
        map_labels = fused.argmax(-1)
        assert map_labels.min() >= 0 and map_labels.max() <= 20
