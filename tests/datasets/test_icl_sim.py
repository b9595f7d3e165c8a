"""ICL .gt.sim pose-format coverage (3x4 blocks, 4 lines per pose)."""

import numpy as np
import pytest

from gradslam_tpu.datasets.icl import _load_sim_poses


def test_load_sim_poses(tmp_path):
    f = tmp_path / "livingRoom0.gt.sim"
    lines = []
    for i in range(3):
        lines += [
            f"1 0 0 {0.1 * i:.3f}",
            "0 1 0 0.000",
            "0 0 1 0.000",
            "",
        ]
    f.write_text("\n".join(lines))
    poses = _load_sim_poses(str(f))
    assert poses.shape == (3, 4, 4)
    np.testing.assert_allclose(poses[2][0, 3], 0.2, atol=1e-6)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(poses[1][3], [0, 0, 0, 1])
