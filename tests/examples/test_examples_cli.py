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

    def test_icpslam_reports_ate(self, fake_tum):
        r = run_example(
            "icpslam.py", "--dataset", "tum", "--dataset_path", fake_tum,
            "--odometry", "gt", "--seqlen", "4", "--batch_size", "1",
            "--height", "24", "--width", "32",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ATE-RMSE" in r.stdout
