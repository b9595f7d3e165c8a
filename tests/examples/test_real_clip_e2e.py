"""End-to-end regression on the REAL golden clip through the on-disk dataset
path (VERDICT r1 #6).

The msrd_b2s3 golden (vendored from the reference test suite) is the ICL
living-room clip at quarter resolution — its intrinsics are exactly the ICL
fixed intrinsics scaled to 120x160 (fx 481.2/4 = 120.3, fy -480/4 = -120).
That means it can be written to disk as a real ICL trajectory tree and pulled
back through the FULL production path: PNG decode -> association parsing ->
pose conversion/re-basing -> intrinsics scaling -> RGBDImages -> tracked SLAM
-> ATE. Previous rounds only constructed RGBDImages in memory.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data", "ref_golden")


def _quat_from_rot(R):
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(R).as_quat()  # (x, y, z, w)


@pytest.fixture(scope="module")
def icl_tree_from_golden(tmp_path_factory, request):
    """Write msrd sequence 0 to disk as living_room_traj1_frei_png."""
    imageio = pytest.importorskip("imageio.v2")
    msrd_dir = os.path.join(os.path.dirname(__file__), "..", "data", "msrd_b2s3")
    colors = np.load(os.path.join(msrd_dir, "colors.npy"))[0]  # (3, 120, 160, 3)
    depths = np.load(os.path.join(msrd_dir, "depths.npy"))[0, ..., 0]
    poses = np.load(os.path.join(msrd_dir, "poses.npy"))[0]  # (3, 4, 4)

    root = tmp_path_factory.mktemp("icl_real")
    traj = root / "living_room_traj1_frei_png"
    (traj / "rgb").mkdir(parents=True)
    (traj / "depth").mkdir()
    assoc, gt = [], []
    for i in range(colors.shape[0]):
        rgb8 = np.clip(colors[i], 0, 255).astype(np.uint8)
        d16 = np.round(depths[i] * 5000.0).astype(np.uint16)
        imageio.imwrite(str(traj / "rgb" / f"{i}.png"), rgb8)
        imageio.imwrite(str(traj / "depth" / f"{i}.png"), d16)
        assoc.append(f"{i} depth/{i}.png {i} rgb/{i}.png")
        t = poses[i, :3, 3]
        q = _quat_from_rot(poses[i, :3, :3])
        gt.append(
            f"{i} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
        )
    (traj / "associations.txt").write_text("\n".join(assoc))
    (traj / "livingRoom1.gt.freiburg").write_text("\n".join(gt))
    return str(root), colors, depths, poses


class TestRealClipThroughDatasetPath:
    def test_loader_roundtrip_matches_golden(self, icl_tree_from_golden):
        from gradslam_tpu.datasets import ICL

        root, colors, depths, poses = icl_tree_from_golden
        ds = ICL(root, seqlen=3, height=120, width=160)
        c, d, K, p, *_ = ds[0]
        # depth: uint16 round-trip quantizes at 1/5000 m
        np.testing.assert_allclose(
            np.asarray(d)[..., 0], depths, atol=1.01 / 5000.0
        )
        # intrinsics: the ICL fixed intrinsics scaled to 120x160 ARE the
        # golden intrinsics (this is what identifies the clip as ICL data)
        golden_K = np.load(
            os.path.join(
                os.path.dirname(__file__), "..", "data", "msrd_b2s3",
                "intrinsics.npy",
            )
        )[0, 0]
        np.testing.assert_allclose(np.asarray(K), golden_K, atol=1e-4)
        # poses: frame-0-rebased, quaternion round-trip
        np.testing.assert_allclose(np.asarray(p), poses, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c)[0], colors[0], atol=1.0)

    @pytest.mark.slow
    def test_tracked_slam_ate_regression(self, icl_tree_from_golden):
        """GradICP-tracked PointFusion on the disk-loaded real clip: the
        trajectory must match the reference's tracked run (ref_golden) and
        ground truth to the same tolerances as the in-memory parity tests."""
        from gradslam_tpu import PointFusion, RGBDImages
        from gradslam_tpu.datasets import ICL
        from gradslam_tpu.metrics import ate_rmse

        root, _, _, gt_poses = icl_tree_from_golden
        ds = ICL(root, seqlen=3, height=120, width=160)
        c, d, K, p, *_ = ds[0]
        frames = RGBDImages(
            jnp.asarray(c)[None], jnp.asarray(d)[None],
            jnp.asarray(K)[None, None], jnp.asarray(p)[None],
        )
        slam = PointFusion(odom="gradicp", dsratio=4, numiters=20)
        pc, poses = slam(frames)
        ref = np.load(os.path.join(GOLDEN, "pointfusion_gradicp_poses.npy"))
        # parity with the reference tracked run on the same data
        assert np.abs(np.asarray(poses)[0] - ref[0]).max() < 2e-3
        ate = float(ate_rmse(poses[0], jnp.asarray(gt_poses), align=False))
        assert ate < 5e-3, ate
        assert int(np.asarray(pc.num_dropped).sum()) == 0
