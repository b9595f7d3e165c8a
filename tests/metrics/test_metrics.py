import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import se3_exp
from gradslam_tpu.metrics import ate_rmse, chamfer_distance, rpe


def make_trajectory(n=10, seed=0):
    rng = np.random.RandomState(seed)
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        xi = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
        poses.append(poses[-1] @ np.asarray(se3_exp(xi)))
    return jnp.asarray(np.stack(poses))


class TestATE:
    def test_zero_for_identical(self):
        traj = make_trajectory()
        assert float(ate_rmse(traj, traj)) == pytest.approx(0.0, abs=1e-6)

    def test_invariant_to_rigid_offset(self):
        traj = make_trajectory()
        offset = se3_exp(jnp.asarray([0.5, -0.3, 0.2, 0.4, 0.1, -0.2]))
        moved = jnp.matmul(offset[None], traj)
        assert float(ate_rmse(moved, traj, align=True)) == pytest.approx(0.0, abs=1e-5)
        assert float(ate_rmse(moved, traj, align=False)) > 0.1

    def test_detects_error(self):
        traj = make_trajectory()
        noisy = traj.at[:, :3, 3].add(
            jnp.asarray(np.random.RandomState(1).randn(10, 3) * 0.01)
        )
        v = float(ate_rmse(noisy, traj))
        assert 0.001 < v < 0.05

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            ate_rmse(make_trajectory(5), make_trajectory(6))


class TestRPE:
    def test_zero_for_identical(self):
        traj = make_trajectory()
        t, r = rpe(traj, traj)
        assert float(t) == pytest.approx(0.0, abs=1e-6)
        assert float(r) == pytest.approx(0.0, abs=1e-3)

    def test_detects_drift(self):
        traj = make_trajectory()
        drift = jnp.stack(
            [
                jnp.asarray(np.asarray(se3_exp(jnp.asarray([0.01 * i, 0, 0, 0, 0, 0]))))
                @ traj[i]
                for i in range(10)
            ]
        )
        t, _ = rpe(drift, traj)
        assert float(t) > 0.005

    def test_delta_validation(self):
        traj = make_trajectory(5)
        with pytest.raises(ValueError):
            rpe(traj, traj, delta=5)

    def test_reduce_false_returns_per_pair_errors(self):
        traj = make_trajectory()
        drift = jnp.stack(
            [
                jnp.asarray(np.asarray(se3_exp(jnp.asarray([0.01 * i, 0, 0, 0, 0, 0]))))
                @ traj[i]
                for i in range(10)
            ]
        )
        trans, rot = rpe(drift, traj, reduce=False)
        assert trans.shape == (9,) and rot.shape == (9,)
        t_rmse, r_rmse = rpe(drift, traj)
        assert float(t_rmse) == pytest.approx(
            float(jnp.sqrt(jnp.mean(trans**2))), rel=1e-6
        )
        assert float(r_rmse) == pytest.approx(
            float(jnp.sqrt(jnp.mean(rot**2))), rel=1e-5
        )


class TestChamfer:
    def test_zero_for_identical(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(100, 3).astype(np.float32))
        assert float(chamfer_distance(pts, pts)) == pytest.approx(0.0, abs=1e-3)

    def test_known_offset(self):
        pts = jnp.zeros((1, 3))
        other = jnp.full((1, 3), 1.0)
        assert float(chamfer_distance(pts, other)) == pytest.approx(
            2 * np.sqrt(3.0), abs=1e-5
        )

    def test_masked(self):
        a = jnp.asarray([[0.0, 0, 0], [100.0, 0, 0]])
        b = jnp.asarray([[0.0, 0, 0], [0.0, 0, 0]])
        mask_a = jnp.asarray([True, False])
        v = chamfer_distance(a, b, mask_a=mask_a)
        assert float(v) == pytest.approx(0.0, abs=1e-5)

    def test_differentiable(self):
        a = jnp.asarray(np.random.RandomState(2).randn(20, 3).astype(np.float32))
        b = a + 0.01
        g = jax.grad(lambda x: chamfer_distance(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))
