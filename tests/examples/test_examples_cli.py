"""End-to-end CLI integration tests: run the example scripts as subprocesses
against a tiny fake TUM tree (the reference has no runnable example tests)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


@pytest.fixture(scope="module")
def fake_tum(tmp_path_factory):
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("tum_cli")
    seqdir = root / "rgbd_dataset_freiburg9_cli"
    (seqdir / "rgb").mkdir(parents=True)
    (seqdir / "depth").mkdir()
    rng = np.random.RandomState(0)
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(6):
        t = 10.0 + i * 0.05
        imageio.imwrite(
            str(seqdir / "rgb" / f"{t:.4f}.png"),
            (rng.rand(48, 64, 3) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            str(seqdir / "depth" / f"{t:.4f}.png"),
            (rng.rand(48, 64) * 4000 + 2000).astype(np.uint16),
        )
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.01 * i:.4f} 0 0 0 0 0 1")
    (seqdir / "rgb.txt").write_text("\n".join(rgb_lines))
    (seqdir / "depth.txt").write_text("\n".join(depth_lines))
    (seqdir / "groundtruth.txt").write_text("\n".join(gt_lines))
    return str(root)


def run_example(script, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )


class TestExampleCLIs:
    def test_pointfusion_gt(self, fake_tum):
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gt", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout

    def test_pointfusion_robust_cv_flags(self, fake_tum):
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gradicp", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32", "--robust-loss", "tukey",
            "--motion-model", "constant_velocity",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout

    def test_pointfusion_quantized_flag(self, fake_tum):
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gt", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32", "--quantize-colors",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout
        assert "WARNING: map overflowed" not in r.stdout

    def test_pointfusion_projective_flags(self, fake_tum):
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gradicp", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
            "--odom-assoc", "projective", "--odom-angle-gate", "60",
            "--relocalize-below", "0.2",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout

    def test_pointfusion_sym_normals_and_point_weight(self, fake_tum):
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gradicp", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
            "--odom-assoc", "projective", "--odom-sym-normals",
            "--odom-point-weight", "0.25", "--odom-angle-gate", "45",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout

    def test_pointfusion_hybrid_and_prune_flags(self, fake_tum):
        """Round-5 production recipe on the CLI: hybrid per-level odometry
        association (comma list) + Keller-style map maintenance."""
        r = run_example(
            "pointfusion.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gradicp", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
            "--pyramid", "4:3,2:2", "--odom-assoc", "projective,knn",
            "--odom-sym-normals", "--prune-every", "2",
            "--prune-min-confidence", "0.5",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points per sequence" in r.stdout

    def test_icpslam_reports_ate(self, fake_tum):
        r = run_example(
            "icpslam.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gt", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ATE-RMSE" in r.stdout


class TestOnlineSlamCLI:
    @pytest.mark.slow
    def test_constant_velocity_tracked_stream(self, fake_tum, tmp_path):
        # tracked odometry with the constant-velocity prior threaded through
        # the stateless step API (--motion-model constant_velocity),
        # including resume (the prior is re-derived from the checkpointed
        # trajectory, review r2)
        out = str(tmp_path / "cv")
        common = [
            "--dataset_path", fake_tum, "--odometry", "icp",
            "--motion-model", "constant_velocity",
            "--height", "24", "--width", "32",
            "--map_capacity", "4000", "--out", out,
        ]
        r = run_example(
            "online_slam.py", *common, "--seqlen", "3",
            "--checkpoint-every", "1",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "frame 2:" in r.stdout
        r = run_example("online_slam.py", *common, "--seqlen", "4", "--resume")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "resumed from" in r.stdout and "frame 3:" in r.stdout
        assert os.path.exists(os.path.join(out, "trajectory.txt"))

    def test_relocalize_gated_stream(self, fake_tum, tmp_path):
        # decomposed serving loop: localize -> health gate -> fuse
        # (--relocalize-below). Threshold 1.01 forces the relocalizer to run
        # every tracked frame, exercising the full recovery path end-to-end;
        # the run must still complete and export.
        out = str(tmp_path / "reloc")
        r = run_example(
            "online_slam.py", "--dataset_path", fake_tum,
            "--odometry", "icp", "--seqlen", "3",
            "--height", "24", "--width", "32", "--map_capacity", "4000",
            "--relocalize-below", "1.01", "--out", out,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "relocalized (inliers" in r.stdout
        assert "frame 2:" in r.stdout
        assert os.path.exists(os.path.join(out, "trajectory.txt"))

    @pytest.mark.slow
    def test_stream_checkpoint_resume_and_evaluate(self, fake_tum, tmp_path):
        out = str(tmp_path / "run")
        common = [
            "--dataset_path", fake_tum, "--odometry", "gt",
            "--height", "24", "--width", "32", "--map_capacity", "4000",
            "--out", out,
        ]
        # Interrupted run: 2 frames, checkpointed.
        r = run_example(
            "online_slam.py", *common, "--seqlen", "2", "--checkpoint-every", "1",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "checkpointed" in r.stdout
        assert os.path.exists(os.path.join(out, "state.npz"))

        # Resume and continue to 4 frames; exports map + trajectories.
        r = run_example(
            "online_slam.py", *common, "--seqlen", "4", "--resume",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "resumed from" in r.stdout
        assert "frame 2:" in r.stdout and "frame 3:" in r.stdout
        assert os.path.exists(os.path.join(out, "map.ply"))
        traj = os.path.join(out, "trajectory.txt")
        gt = os.path.join(out, "groundtruth.txt")
        assert os.path.exists(traj) and os.path.exists(gt)

        # The exported map is a loadable PLY with points.
        from gradslam_tpu.structures import load_ply

        cloud = load_ply(os.path.join(out, "map.ply"))
        assert cloud["points"].shape[0] > 0

        # evaluate_traj CLI: gt-odometry trajectory == groundtruth -> ATE ~ 0.
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "evaluate_traj.py"),
             gt, traj, "--max-difference", "0.5", "--json"],
            capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        import json

        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["pairs"] == 4
        assert stats["ate_rmse_m"] < 1e-5
        assert stats["rpe_trans_rmse_m"] < 1e-5


@pytest.fixture(scope="module")
def fake_scannet_cli(tmp_path_factory):
    """Tiny fake ScanNet tree (pattern from tests/datasets/test_scannet_fake)."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("scannet_cli")
    scans, meta = root / "scans", root / "seqmeta"
    scene = scans / "scene0000_00"
    for sub in ("color", "depth", "pose", "label-filt", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    meta.mkdir()
    rng = np.random.RandomState(0)
    np.savetxt(str(scene / "intrinsic" / "intrinsic_depth.txt"),
               np.diag([400.0, 400.0, 1.0, 1.0]))
    lines = []
    for i in range(4):
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
            f"pose scene0000_00/pose/{i}.txt "
            f"label-filt scene0000_00/label-filt/{i}.png "
            f"intrinsic_color x extrinsic_color y extrinsic_depth z "
            f"intrinsic_depth scene0000_00/intrinsic/intrinsic_depth.txt")
    (meta / "scene0000_00-seq_0.txt").write_text("\n".join(lines))
    return str(scans), str(meta)


class TestScannetCLI:
    def test_fuse_labels(self, fake_scannet_cli):
        scans, meta = fake_scannet_cli
        r = run_example(
            "pointfusion_scannet.py", "--dataset_path", scans,
            "--seqmeta_path", meta, "--start", "0", "--end", "4",
            "--height", "24", "--width", "32", "--fuse-labels",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "map points:" in r.stdout
        assert "fused map class counts:" in r.stdout
