import jax.numpy as jnp
import numpy as np

from gradslam_tpu.structures import Pointclouds
from gradslam_tpu.utils.checkpoint import load_state, save_state


def test_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pc = Pointclouds.from_list(
        [rng.randn(5, 3).astype(np.float32), rng.randn(3, 3).astype(np.float32)],
        normals=[rng.randn(5, 3).astype(np.float32), rng.randn(3, 3).astype(np.float32)],
        capacity=8,
    )
    poses = jnp.asarray(rng.randn(2, 4, 4).astype(np.float32))
    path = str(tmp_path / "state.npz")
    save_state(path, pc, poses)
    pc2, poses2 = load_state(path)
    np.testing.assert_allclose(np.asarray(pc2.points), np.asarray(pc.points))
    np.testing.assert_array_equal(np.asarray(pc2.num_points), np.asarray(pc.num_points))
    np.testing.assert_allclose(np.asarray(pc2.normals), np.asarray(pc.normals))
    assert pc2.colors is None
    np.testing.assert_allclose(np.asarray(poses2), np.asarray(poses))


def test_save_load_without_poses(tmp_path):
    pc = Pointclouds.empty(1, 4)
    path = str(tmp_path / "state2.npz")
    save_state(path, pc)
    pc2, poses2 = load_state(path)
    assert poses2 is None
    assert pc2.capacity == 4


class TestTrajectoryIO:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from gradslam_tpu.geometry import se3_exp
        from gradslam_tpu.utils.trajectory_io import (
            load_trajectory_tum,
            save_trajectory_tum,
        )

        rng = np.random.RandomState(0)
        poses = np.stack(
            [np.asarray(se3_exp(jnp.asarray(rng.randn(6) * 0.3))) for _ in range(5)]
        )
        path = str(tmp_path / "traj.txt")
        save_trajectory_tum(path, poses, timestamps=np.arange(5) * 0.1)
        stamps, loaded = load_trajectory_tum(path)
        np.testing.assert_allclose(stamps, np.arange(5) * 0.1, atol=1e-6)
        np.testing.assert_allclose(loaded, poses, atol=1e-4)

    def test_bad_shape_raises(self, tmp_path):
        import pytest
        from gradslam_tpu.utils.trajectory_io import save_trajectory_tum

        with pytest.raises(ValueError):
            save_trajectory_tum(str(tmp_path / "x.txt"), np.zeros((5, 3, 4)))
