"""Long-sequence dataset exercise (VERDICT r2 weak #6): 40-frame on-disk
trees pulled through the REAL loaders, so sequence chunking, timestamp
association, and per-chunk pose re-basing are exercised at scale — the
3-frame golden tree (test_real_clip_e2e.py) cannot see chunk boundaries or
association drop-outs. Reference semantics under test: chunking diagram
/root/reference/gradslam/datasets/tum.py:46-57, association
tumutils.associate (max_difference=0.02), per-chunk re-basing tum.py:497-499.
"""

import os

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from gradslam_tpu.datasets import ICL, TUM  # noqa: E402

N_FRAMES = 40
H, W = 24, 32


def _rand_frames(rng, n):
    rgb = (rng.rand(n, H, W, 3) * 255).astype(np.uint8)
    depth = (rng.rand(n, H, W) * 5000 + 1000).astype(np.uint16)
    return rgb, depth


@pytest.fixture(scope="module")
def long_tum_tree(tmp_path_factory):
    """40 rgb frames; depth timestamps jittered, and every 10th depth frame
    MISSING — association must drop those rgb frames, not mis-pair them."""
    root = tmp_path_factory.mktemp("tum_long")
    seqdir = root / "rgbd_dataset_freiburg1_long"
    (seqdir / "rgb").mkdir(parents=True)
    (seqdir / "depth").mkdir()
    rng = np.random.RandomState(7)
    rgb, depth = _rand_frames(rng, N_FRAMES)
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    dropped = set(range(0, N_FRAMES, 10))  # frames with no depth at all
    for i in range(N_FRAMES):
        t = 1000.0 + i * 0.05
        imageio.imwrite(str(seqdir / "rgb" / f"{t:.6f}.png"), rgb[i])
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        if i not in dropped:
            td = t + 0.001 + 0.014 * rng.rand()  # jitter within the 0.02 gate
            imageio.imwrite(str(seqdir / "depth" / f"{td:.6f}.png"), depth[i])
            depth_lines.append(f"{td:.6f} depth/{td:.6f}.png")
        gt_lines.append(f"{t + 0.002:.6f} {0.01 * i:.4f} 0 0 0 0 0 1")
    (seqdir / "rgb.txt").write_text("\n".join(rgb_lines))
    (seqdir / "depth.txt").write_text("\n".join(depth_lines))
    (seqdir / "groundtruth.txt").write_text("\n".join(gt_lines))
    (seqdir / "accelerometer.txt").write_text("#")
    return str(root), dropped


@pytest.fixture(scope="module")
def long_icl_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("icl_long")
    traj = root / "living_room_traj2_frei_png"
    (traj / "rgb").mkdir(parents=True)
    (traj / "depth").mkdir()
    rng = np.random.RandomState(8)
    rgb, depth = _rand_frames(rng, N_FRAMES)
    assoc, gt = [], []
    for i in range(N_FRAMES):
        imageio.imwrite(str(traj / "rgb" / f"{i}.png"), rgb[i])
        imageio.imwrite(str(traj / "depth" / f"{i}.png"), depth[i])
        assoc.append(f"{i} depth/{i}.png {i} rgb/{i}.png")
        gt.append(f"{i} {0.02 * i:.4f} {0.005 * i:.4f} 0 0 0 0 1")
    (traj / "associations.txt").write_text("\n".join(assoc))
    (traj / "livingRoom2.gt.freiburg").write_text("\n".join(gt))
    return str(root), depth


class TestLongTUM:
    def test_association_drops_depthless_frames(self, long_tum_tree):
        root, dropped = long_tum_tree
        n_assoc = N_FRAMES - len(dropped)  # 36
        # seqlen=6, non-overlapping default stride -> floor(36/6) = 6 chunks
        ds = TUM(root, seqlen=6, height=H, width=W)
        assert len(ds) == n_assoc // 6
        colors, depths, K, poses, *_ = ds[0]
        assert colors.shape == (6, H, W, 3)
        # depth scaling: uint16 / 5000 -> meters
        assert 0.19 < float(np.asarray(depths).min()) < 0.21 * 1.3
        assert float(np.asarray(depths).max()) <= 6000 / 5000.0

    def test_chunk_poses_rebased_per_chunk(self, long_tum_tree):
        root, dropped = long_tum_tree
        ds = TUM(root, seqlen=6, height=H, width=W)
        for chunk in (0, 3, len(ds) - 1):
            _, _, _, poses, *_ = ds[chunk]
            p = np.asarray(poses)
            # frame 0 of EVERY chunk is re-based to identity
            np.testing.assert_allclose(p[0], np.eye(4), atol=1e-6)
            # camera walks +x at 1 cm per SOURCE frame; within a chunk the
            # associated frames are consecutive non-dropped frames, so each
            # step is 1 cm or 2 cm (when a dropped frame is skipped)
            steps = np.diff(p[:, 0, 3])
            assert np.all(steps > 0.009) and np.all(steps < 0.021), steps
            np.testing.assert_allclose(p[:, 1:3, 3], 0, atol=1e-6)

    def test_dilation_and_stride_at_scale(self, long_tum_tree):
        root, _ = long_tum_tree
        # 36 associated frames, seqlen=4 dilation=1 (every 2nd) stride=3:
        # span = 1 + (4-1)*2 = 7; starts at 0,3,6,... while start+7 <= 36
        ds = TUM(root, seqlen=4, dilation=1, stride=3, height=H, width=W)
        expected = len([s for s in range(0, 36, 3) if s + 7 <= 36])
        assert len(ds) == expected
        _, _, _, poses, *_ = ds[0]
        steps = np.diff(np.asarray(poses)[:, 0, 3])
        # dilated by 2 source steps -> ~2 cm (3 cm across a dropout)
        assert np.all(steps > 0.019) and np.all(steps < 0.031), steps


class TestLongICL:
    def test_chunks_tile_the_sequence_exactly(self, long_icl_tree):
        root, depth16 = long_icl_tree
        ds = ICL(root, seqlen=10, height=H, width=W)
        assert len(ds) == N_FRAMES // 10
        for chunk in range(len(ds)):
            _, depths, _, poses, *_ = ds[chunk]
            # chunk k serves exactly source frames [10k, 10k+10) in order
            np.testing.assert_allclose(
                np.asarray(depths)[..., 0],
                depth16[10 * chunk:10 * (chunk + 1)] / 5000.0,
                atol=1e-6,
            )
            p = np.asarray(poses)
            np.testing.assert_allclose(p[0], np.eye(4), atol=1e-6)
            # re-based translation restarts from 0 each chunk
            np.testing.assert_allclose(
                p[:, 0, 3], 0.02 * np.arange(10), atol=1e-5
            )

    @pytest.mark.slow
    def test_full_chunked_slam_run(self, long_icl_tree):
        """Every chunk of the 40-frame tree through PointFusion(gt) — the
        production long-video pattern (chunked loading, one SLAM run per
        chunk, map checkpointed between runs is covered elsewhere)."""
        import jax.numpy as jnp

        from gradslam_tpu import PointFusion, RGBDImages

        root, _ = long_icl_tree
        ds = ICL(root, seqlen=10, height=H, width=W)
        slam = PointFusion(odom="gt", map_capacity=10 * H * W)
        for chunk in range(len(ds)):
            c, d, K, p, *_ = ds[chunk]
            frames = RGBDImages(
                jnp.asarray(c)[None] / 255.0, jnp.asarray(d)[None],
                jnp.asarray(K)[None, None], jnp.asarray(p)[None],
            )
            pc, poses = slam(frames)
            assert int(np.asarray(pc.num_dropped).sum()) == 0
            np.testing.assert_allclose(
                np.asarray(poses)[0], np.asarray(p), atol=1e-6
            )
            assert np.all(np.isfinite(np.asarray(pc.points)))
