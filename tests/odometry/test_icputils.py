import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu import Pointclouds
from gradslam_tpu.geometry import se3_exp, transform_pointcloud
from gradslam_tpu.odometry import (
    gauss_newton_solve,
    point_to_plane_ICP,
    point_to_plane_gradICP,
    solve_linear_system,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data", "ref_golden")


def wavy_surface():
    """Structured target surface with analytic normals."""
    x, y = np.meshgrid(np.linspace(-1, 1, 40), np.linspace(-1, 1, 40))
    z = 0.3 * np.sin(2 * x) + 0.2 * np.cos(3 * y) + 2.0
    tgt = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    nx = -0.6 * np.cos(2 * x)
    ny = 0.6 * np.sin(3 * y)
    nz = np.ones_like(x)
    n = np.stack([nx, ny, nz], -1).reshape(-1, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return tgt, n


class TestSolveLinearSystem:
    def test_matches_lstsq(self):
        rng = np.random.RandomState(0)
        A = rng.randn(100, 6).astype(np.float32)
        b = rng.randn(100, 1).astype(np.float32)
        x = solve_linear_system(jnp.asarray(A), jnp.asarray(b), damp=0.0)
        expected, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)

    def test_raises(self):
        with pytest.raises(ValueError):
            solve_linear_system(jnp.zeros((10, 6, 1)), jnp.zeros((10, 1)))
        with pytest.raises(ValueError):
            solve_linear_system(jnp.zeros((10, 6)), jnp.zeros((10, 2)))
        with pytest.raises(ValueError):
            solve_linear_system(jnp.zeros((10, 6)), jnp.zeros((9, 1)))


class TestGaussNewton:
    def test_zero_at_optimum(self):
        tgt, n = wavy_surface()
        A, b, idx = gauss_newton_solve(jnp.asarray(tgt), jnp.asarray(tgt), jnp.asarray(n))
        # at the optimum (src == tgt), residual is zero
        np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(tgt.shape[0]))

    def test_masked_rows_are_zero(self):
        tgt, n = wavy_surface()
        src = tgt + 0.01
        mask = np.zeros(tgt.shape[0], dtype=bool)
        mask[:5] = True
        A, b, _ = gauss_newton_solve(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n),
            src_mask=jnp.asarray(mask),
        )
        assert np.allclose(np.asarray(A)[5:], 0.0)
        assert np.allclose(np.asarray(b)[5:], 0.0)
        assert not np.allclose(np.asarray(A)[:5], 0.0)

    def test_dist_thresh_filters(self):
        tgt, n = wavy_surface()
        src = np.array(tgt)
        src[0] += 100.0  # outlier
        A, b, _ = gauss_newton_solve(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n), dist_thresh=1.0
        )
        assert np.allclose(np.asarray(A)[0], 0.0)


class TestRobustLoss:
    """IRLS robust kernels (huber/tukey) — beyond-reference capability."""

    def test_weight_values(self):
        from gradslam_tpu.odometry.icputils import robust_weights

        r = jnp.asarray([0.0, 0.05, 0.1, -0.2])
        # huber, scale 0.1: w = min(1, scale/|r|); returned sqrt(w)
        w_h = np.asarray(robust_weights(r, "huber", 0.1)) ** 2
        np.testing.assert_allclose(w_h, [1.0, 1.0, 1.0, 0.5], atol=1e-6)
        # tukey, scale 0.1: w = (1-(r/c)^2)^2 inside, 0 outside
        w_t = np.asarray(robust_weights(r, "tukey", 0.1)) ** 2
        np.testing.assert_allclose(w_t, [1.0, 0.5625, 0.0, 0.0], atol=1e-6)
        # None = all ones
        np.testing.assert_array_equal(np.asarray(robust_weights(r, None, 0.1)), 1.0)
        with pytest.raises(ValueError):
            robust_weights(r, "cauchy", 0.1)

    @pytest.mark.parametrize("solver", [point_to_plane_ICP, point_to_plane_gradICP])
    @pytest.mark.parametrize("loss", ["huber", "tukey"])
    def test_outlier_recovery(self, solver, loss):
        """With 15% of SOURCE points displaced far off the surface (every
        source row contributes a residual via its nearest neighbour — e.g. a
        dynamic object in the live frame), the robust solve must recover the
        transform much better than plain least squares."""
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.02, -0.03, 0.01, 0.02, -0.015, 0.025])
        T_true = se3_exp(xi_true)
        src = np.asarray(
            transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true))
        )
        rng = np.random.RandomState(3)
        bad = rng.rand(len(src)) < 0.15
        src_bad = src.copy()
        src_bad[bad] += (
            rng.randn(bad.sum(), 3).astype(np.float32) * 0.3
            + np.asarray([0.0, 0.0, 0.4], np.float32)  # biased: drags the fit
        )
        T_plain, _ = solver(jnp.asarray(src_bad), jnp.asarray(tgt),
                            jnp.asarray(n), numiters=20)
        T_rob, _ = solver(jnp.asarray(src_bad), jnp.asarray(tgt),
                          jnp.asarray(n), numiters=20,
                          robust_loss=loss, robust_scale=0.05)
        err_plain = np.abs(np.asarray(T_plain) - np.asarray(T_true)).max()
        err_rob = np.abs(np.asarray(T_rob) - np.asarray(T_true)).max()
        assert err_rob < 0.5 * err_plain, (err_rob, err_plain)
        # tukey fully rejects outliers; huber only down-weights them, so a
        # small residual bias remains under this biased corruption
        assert err_rob < (5e-3 if loss == "tukey" else 2e-2), err_rob

    def test_clean_data_unaffected(self):
        """On clean data the huber solve (scale >= residuals) equals plain."""
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.01, -0.01, 0.005, 0.01, -0.005, 0.01])
        T_true = se3_exp(xi_true)
        src = transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true))
        T, _ = point_to_plane_ICP(src, jnp.asarray(tgt), jnp.asarray(n),
                                  numiters=20, robust_loss="huber",
                                  robust_scale=10.0)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)

    @pytest.mark.parametrize("loss", ["huber", "tukey"])
    def test_gradicp_robust_differentiable(self, loss):
        """Finite gradients even with rows AT the tukey cutoff (w == 0, where
        a naive sqrt(w) backward would produce inf * 0 = NaN)."""
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.01, -0.01, 0.005, 0.0, 0.01, -0.005])
        T_true = se3_exp(xi_true)
        src = np.array(
            transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true))
        )
        src[:50] += 1.0  # rows far beyond the cutoff -> zero tukey weight

        def loss_fn(s):
            T, _ = point_to_plane_gradICP(s, jnp.asarray(tgt), jnp.asarray(n),
                                          numiters=3, robust_loss=loss)
            return jnp.sum((T - jnp.eye(4)) ** 2)

        g = jax.grad(loss_fn)(jnp.asarray(src))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0

    def test_robust_loss_validation(self):
        from gradslam_tpu import ICPSLAM
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", robust_loss="cauchy")
        # robust_scale=0 would zero every IRLS weight -> silent no-op solver
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", robust_loss="huber", robust_scale=0.0)
        # fine-to-coarse pyramid order would discard the fine refinement
        with pytest.raises(ValueError):
            ICPSLAM(odom="icp", pyramid=[(2, 4), (8, 6)])

    def test_pipeline_robust_tracks(self):
        """A robust-loss pipeline actually tracks (kwargs reach the solver)."""
        import jax.numpy as jnp2

        from gradslam_tpu import ICPSLAM, RGBDImages
        from gradslam_tpu.datasets import synthetic_sequence

        rgb, depths, intr, poses = synthetic_sequence(1, 4, 16, 24, seed=7)
        frames = RGBDImages(
            jnp2.asarray(rgb), jnp2.asarray(depths), jnp2.asarray(intr),
            jnp2.asarray(poses),
        )
        slam = ICPSLAM(odom="icp", dsratio=2, numiters=6,
                       robust_loss="huber", robust_scale=0.1)
        _, tr = slam(frames)
        err = np.abs(np.asarray(tr) - np.asarray(poses)).max()
        # clean data: robust tracking must stay in the same regime as plain
        plain = ICPSLAM(odom="icp", dsratio=2, numiters=6)
        _, tr_p = plain(frames)
        err_p = np.abs(np.asarray(tr_p) - np.asarray(poses)).max()
        assert err < max(2 * err_p, 1e-3), (err, err_p)


class TestICPRecovery:
    @pytest.mark.parametrize("solver", [point_to_plane_ICP, point_to_plane_gradICP])
    def test_recovers_known_transform(self, solver):
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.02, -0.03, 0.01, 0.02, -0.015, 0.025])
        T_true = se3_exp(xi_true)
        src = transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true))
        T, _ = solver(src, jnp.asarray(tgt), jnp.asarray(n), numiters=20)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)

    def test_recovery_with_masked_padding(self):
        """Padded (masked-out) source and target rows must not affect the solve."""
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.01, -0.02, 0.015, 0.01, -0.01, 0.02])
        T_true = se3_exp(xi_true)
        src = np.asarray(transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true)))
        # pad with garbage
        src_p = np.concatenate([src, np.full((100, 3), 77.0, np.float32)])
        tgt_p = np.concatenate([tgt, np.full((50, 3), -55.0, np.float32)])
        n_p = np.concatenate([n, np.zeros((50, 3), np.float32)])
        src_mask = np.concatenate([np.ones(len(src), bool), np.zeros(100, bool)])
        tgt_mask = np.concatenate([np.ones(len(tgt), bool), np.zeros(50, bool)])
        T, _ = point_to_plane_ICP(
            jnp.asarray(src_p), jnp.asarray(tgt_p), jnp.asarray(n_p),
            numiters=20,
            src_mask=jnp.asarray(src_mask), tgt_mask=jnp.asarray(tgt_mask),
        )
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)

    @pytest.mark.parametrize("solver", [point_to_plane_ICP, point_to_plane_gradICP])
    def test_reuse_lookahead_recovers(self, solver):
        """lookahead_assoc='reuse' (half the KNN calls) must still recover the
        transform to the same tolerance."""
        tgt, n = wavy_surface()
        xi_true = jnp.asarray([0.02, -0.03, 0.01, 0.02, -0.015, 0.025])
        T_true = se3_exp(xi_true)
        src = transform_pointcloud(jnp.asarray(tgt), jnp.linalg.inv(T_true))
        T, _ = solver(src, jnp.asarray(tgt), jnp.asarray(n), numiters=20,
                      lookahead_assoc="reuse")
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)

    def test_bad_lookahead_mode_raises(self):
        tgt, n = wavy_surface()
        with pytest.raises(ValueError):
            point_to_plane_ICP(jnp.asarray(tgt), jnp.asarray(tgt),
                               jnp.asarray(n), lookahead_assoc="bogus")
        with pytest.raises(ValueError):
            point_to_plane_gradICP(jnp.asarray(tgt), jnp.asarray(tgt),
                                   jnp.asarray(n), lookahead_assoc="bogus")

    def test_gradicp_differentiable(self):
        tgt, n = wavy_surface()
        src = tgt + 0.01

        def loss(s):
            T, _ = point_to_plane_gradICP(s, jnp.asarray(tgt), jnp.asarray(n), numiters=3)
            return jnp.sum(T[:3, 3] ** 2)

        g = jax.grad(loss)(jnp.asarray(src))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_jittable_and_vmappable(self):
        tgt, n = wavy_surface()
        src = np.stack([tgt + 0.01, tgt - 0.01]).astype(np.float32)
        tgts = np.stack([tgt, tgt])
        ns = np.stack([n, n])

        @jax.jit
        def solve(s, t, nn):
            return jax.vmap(
                lambda a, b, c: point_to_plane_ICP(a, b, c, numiters=3)[0]
            )(s, t, nn)

        T = solve(jnp.asarray(src), jnp.asarray(tgts), jnp.asarray(ns))
        assert T.shape == (2, 4, 4)
        assert np.all(np.isfinite(np.asarray(T)))


class TestReferenceParity:
    """Bit-level trajectory parity with the reference solvers, via goldens
    generated by scripts/reference_shim.py."""

    def test_icp_matches_reference(self):
        src = np.load(os.path.join(GOLDEN, "icp_src.npy"))
        tgt = np.load(os.path.join(GOLDEN, "icp_tgt.npy"))
        n = np.load(os.path.join(GOLDEN, "icp_tgt_normals.npy"))
        expected = np.load(os.path.join(GOLDEN, "icp_transform.npy"))
        T, _ = point_to_plane_ICP(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n), numiters=10
        )
        np.testing.assert_allclose(np.asarray(T), expected, atol=1e-5)

    def test_gradicp_matches_reference(self):
        src = np.load(os.path.join(GOLDEN, "icp_src.npy"))
        tgt = np.load(os.path.join(GOLDEN, "icp_tgt.npy"))
        n = np.load(os.path.join(GOLDEN, "icp_tgt_normals.npy"))
        expected = np.load(os.path.join(GOLDEN, "gradicp_transform.npy"))
        T, _ = point_to_plane_gradICP(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n), numiters=10
        )
        np.testing.assert_allclose(np.asarray(T), expected, atol=1e-5)


class TestDownsampleOverflowAccounting:
    def test_num_dropped_counts_capacity_overflow(self):
        from gradslam_tpu.odometry.icputils import downsample_pointclouds

        B, CAP = 1, 40
        pts = jnp.asarray(np.random.RandomState(0).rand(B, CAP, 3), jnp.float32)
        pc = Pointclouds(points=pts, num_points=jnp.asarray([CAP]))
        active = jnp.ones((B, CAP), bool)
        pix = jnp.zeros((B, CAP), jnp.int32)  # all stride-aligned
        out = downsample_pointclouds(pc, active, pix, pix, 2, 16)
        assert int(out.num_points[0]) == 16
        assert int(out.num_dropped[0]) == CAP - 16

    def test_num_dropped_zero_when_fits(self):
        from gradslam_tpu.odometry.icputils import downsample_pointclouds

        B, CAP = 1, 10
        pts = jnp.asarray(np.random.RandomState(1).rand(B, CAP, 3), jnp.float32)
        pc = Pointclouds(points=pts, num_points=jnp.asarray([CAP]))
        active = jnp.ones((B, CAP), bool)
        pix = jnp.zeros((B, CAP), jnp.int32)
        out = downsample_pointclouds(pc, active, pix, pix, 2, 16)
        assert int(out.num_points[0]) == CAP
        assert int(out.num_dropped[0]) == 0


class TestKnnDotGate:
    """Normal-compatibility gate on the KNN association (odom_angle_gate for
    odom_assoc='knn' — the same wrong-surface rejection the projective mode
    carries; VERDICT r3 #5's resolution-scalable gating for the KNN path)."""

    def _rigid(self):
        theta = 0.03
        R = np.array(
            [[np.cos(theta), -np.sin(theta), 0],
             [np.sin(theta), np.cos(theta), 0],
             [0, 0, 1]], np.float32)
        t = np.array([0.02, -0.01, 0.015], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        return T

    @pytest.mark.parametrize("solver", [point_to_plane_ICP,
                                        point_to_plane_gradICP])
    def test_gate_minus_one_equals_ungated(self, solver):
        tgt, n = wavy_surface()
        T = self._rigid()
        src = transform_pointcloud(jnp.asarray(tgt), jnp.asarray(T))
        src_n = np.asarray(n) @ T[:3, :3].T
        T0, _ = solver(src, tgt, n, numiters=8)
        Tg, _ = solver(src, tgt, n, numiters=8,
                       src_normals=jnp.asarray(src_n), dot_gate=-1.0)
        np.testing.assert_allclose(np.asarray(T0), np.asarray(Tg), atol=1e-7)

    @pytest.mark.parametrize("solver,lookahead", [
        (point_to_plane_ICP, "fresh"),
        (point_to_plane_gradICP, "fresh"),
        (point_to_plane_gradICP, "reuse"),
    ])
    def test_gate_rejects_wrong_surface(self, solver, lookahead):
        """Decoy points sit EXACTLY at half the source positions (nearest by
        construction, zero residual) but with orthogonal normals: their rows
        pin the ungated solve near its start (zero-b rows act as constraints
        against any motion along the decoy normal); the gated solve rejects
        them and recovers the exact transform from the true-surface rows.
        Measured: ungated ~2.4e-2 (the injected transform's magnitude),
        gated ~1e-6."""
        tgt, n = wavy_surface()
        T = self._rigid()
        src = np.asarray(
            transform_pointcloud(jnp.asarray(tgt), jnp.asarray(T)))
        src_n = (n @ T[:3, :3].T).astype(np.float32)
        k = len(src) // 2
        idx = np.random.RandomState(0).choice(len(src), k, replace=False)
        decoy = src[idx]
        decoy_n = np.stack(  # orthogonal to the (mostly +z) surface normals
            [np.ones(k), np.zeros(k), np.zeros(k)], -1).astype(np.float32)
        tgt_aug = np.concatenate([tgt, decoy], 0)
        n_aug = np.concatenate([n, decoy_n], 0)
        expected = np.linalg.inv(T)

        T_un, _ = solver(src, tgt_aug, n_aug, numiters=12,
                         lookahead_assoc=lookahead)
        T_gate, _ = solver(src, tgt_aug, n_aug, numiters=12,
                           lookahead_assoc=lookahead,
                           src_normals=src_n,
                           dot_gate=float(np.cos(np.radians(60))))
        err_un = np.abs(np.asarray(T_un) - expected).max()
        err_gate = np.abs(np.asarray(T_gate) - expected).max()
        assert err_gate < 1e-4
        assert err_un > 50 * err_gate  # decoys pin the ungated solve

    def test_validation(self):
        tgt, n = wavy_surface()
        with pytest.raises(ValueError, match="src_normals"):
            gauss_newton_solve(jnp.asarray(tgt), jnp.asarray(tgt),
                               jnp.asarray(n), dot_gate=0.5)
        for solver in (point_to_plane_ICP, point_to_plane_gradICP):
            with pytest.raises(ValueError, match="src_normals"):
                solver(tgt, tgt, n, dot_gate=0.5)
        from gradslam_tpu.odometry import (
            GradICPOdometryProvider,
            ICPOdometryProvider,
        )
        for prov_cls in (ICPOdometryProvider, GradICPOdometryProvider):
            with pytest.raises(ValueError, match="dot_gate"):
                prov_cls(dot_gate=2.0)
            prov = prov_cls(dot_gate=0.5)
            pc_nonorm = Pointclouds(points=jnp.zeros((1, 8, 3)),
                                    num_points=jnp.asarray([8]))
            pc = Pointclouds(points=jnp.zeros((1, 8, 3)),
                             normals=jnp.zeros((1, 8, 3)),
                             num_points=jnp.asarray([8]))
            with pytest.raises(ValueError, match="normals"):
                prov.provide(pc, pc_nonorm)

    def test_pipeline_gate_matches_ungated_on_clean_clip(self):
        """odom_angle_gate on the KNN pipeline: a wide gate must not perturb
        tracking on a clean clip (every true association passes), and the
        plumbing must run end-to-end through the scanned forward."""
        from gradslam_tpu import PointFusion, RGBDImages
        from gradslam_tpu.datasets import synthetic_sequence
        from gradslam_tpu.metrics import ate_rmse

        B, L, H, W = 1, 5, 60, 80
        rgb, d, K, poses = synthetic_sequence(B, L, H, W, seed=3)
        fr = RGBDImages(jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(K),
                        jnp.asarray(poses))
        ates = {}
        for gate in (None, 75.0):
            pf = PointFusion(odom="gradicp", odom_assoc="knn",
                             odom_angle_gate=gate, dsratio=2, numiters=6,
                             map_capacity=L * H * W)
            _, op = pf(fr)
            ates[gate] = float(ate_rmse(op[0], fr.poses[0]))
        assert ates[75.0] < 5e-3
        assert abs(ates[75.0] - ates[None]) < 2e-3
