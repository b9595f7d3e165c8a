import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradslam_tpu.geometry import (
    compose_transformations,
    create_meshgrid,
    homogenize_points,
    inverse_intrinsics,
    inverse_transformation,
    project_points,
    quaternion_to_rotation_matrix,
    relative_transformation,
    se3_exp,
    se3_hat,
    so3_exp,
    so3_hat,
    transform_normals,
    transform_pointcloud,
    unhomogenize_points,
    unproject_points,
)


def random_se3(key, batch=()):
    """Random SE(3) matrices via se3_exp of small twists."""
    xi = jax.random.normal(key, batch + (6,)) * 0.3
    return se3_exp(xi)


class TestProjUtils:
    def test_homogenize_roundtrip(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32))
        homo = homogenize_points(pts)
        assert homo.shape == (10, 4)
        assert jnp.allclose(homo[..., -1], 1.0)
        back = unhomogenize_points(homo)
        assert jnp.allclose(back, pts, atol=1e-6)

    def test_unhomogenize_points_at_infinity(self):
        pts = jnp.asarray([[1.0, 2.0, 0.0], [2.0, 4.0, 2.0]])
        out = unhomogenize_points(pts)
        # w ~ 0 -> scale 1 (OpenCV convention)
        np.testing.assert_allclose(out[0], [1.0, 2.0], atol=1e-6)
        np.testing.assert_allclose(out[1], [1.0, 2.0], atol=1e-6)

    def test_homogenize_raises(self):
        with pytest.raises(ValueError):
            homogenize_points(jnp.ones(3))
        with pytest.raises(TypeError):
            homogenize_points(None)

    def test_project_unproject_roundtrip(self):
        K = jnp.asarray(
            [
                [525.0, 0, 319.5, 0],
                [0, 525.0, 239.5, 0],
                [0, 0, 1, 0],
                [0, 0, 0, 1],
            ],
            dtype=jnp.float32,
        )
        rng = np.random.RandomState(1)
        pts = jnp.asarray(
            np.stack(
                [rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50), rng.uniform(0.5, 3, 50)],
                axis=-1,
            ).astype(np.float32)
        )
        uv = project_points(pts, K)
        Kinv = inverse_intrinsics(K)[..., :3, :3]
        back = unproject_points(uv, Kinv, pts[..., 2])
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)

    def test_project_points_zero_z_guard(self):
        K = jnp.eye(4)
        pts = jnp.asarray([[1.0, 2.0, 0.0]])
        uv = project_points(pts, K)
        np.testing.assert_allclose(np.asarray(uv), [[1.0, 2.0]])

    def test_inverse_intrinsics_matches_linalg_inverse(self):
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 525.0, 525.0, 319.5, 239.5
        Kinv = inverse_intrinsics(jnp.asarray(K))
        np.testing.assert_allclose(
            np.asarray(Kinv), np.linalg.inv(K), rtol=1e-4, atol=1e-5
        )

    def test_inverse_intrinsics_batched(self):
        K = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1, 1))
        K[..., 0, 0] = 481.2
        K[..., 1, 1] = -480.0  # ICL's negative fy must be handled
        K[..., 0, 2] = 319.5
        K[..., 1, 2] = 239.5
        Kinv = inverse_intrinsics(jnp.asarray(K))
        prod = np.einsum("bnij,bnjk->bnik", np.asarray(Kinv), K)
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (2, 1, 1, 1)), atol=1e-3)


class TestGeometryUtils:
    def test_create_meshgrid_unnormalized(self):
        grid = create_meshgrid(3, 4, normalized_coords=False)
        assert grid.shape == (1, 3, 4, 2)
        # grid[..., 0] -> row, grid[..., 1] -> col (reference convention)
        np.testing.assert_allclose(np.asarray(grid[0, 2, 1]), [2.0, 1.0])

    def test_create_meshgrid_normalized(self):
        grid = create_meshgrid(3, 4, normalized_coords=True)
        np.testing.assert_allclose(np.asarray(grid[0, 0, 0]), [-1.0, -1.0])
        np.testing.assert_allclose(np.asarray(grid[0, 2, 3]), [1.0, 1.0])

    def test_inverse_transformation(self):
        T = random_se3(jax.random.PRNGKey(0))
        Tinv = inverse_transformation(T)
        np.testing.assert_allclose(
            np.asarray(compose_transformations(T, Tinv)), np.eye(4), atol=1e-5
        )

    def test_orthonormalize_rotations(self):
        from gradslam_tpu.geometry import orthonormalize_rotations

        T = random_se3(jax.random.PRNGKey(7))
        # already-orthonormal input is (numerically) a fixed point
        T_fix = orthonormalize_rotations(T)
        np.testing.assert_allclose(np.asarray(T_fix), np.asarray(T), atol=1e-6)
        # a drifted rotation (the CV-carry failure mode: det(R) creeping off
        # 1 through repeated f32 compositions) is pulled back onto SO(3)
        T_bad = np.array(T)
        T_bad[:3, :3] *= 1.01  # det 1.03, |R R^T - I| ~ 0.02
        T_good = np.asarray(orthonormalize_rotations(jnp.asarray(T_bad)))
        R = T_good[:3, :3]
        # ONE Newton step is quadratic: a 3% orthonormality error drops to
        # ~1e-3; in the CV carry the pre-projection error is ~2x f32 eps per
        # frame so the projected error stays at the eps noise floor
        assert abs(np.linalg.det(R) - 1) < 1e-3
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
        before = np.abs(T_bad[:3, :3] @ T_bad[:3, :3].T - np.eye(3)).max()
        after = np.abs(R @ R.T - np.eye(3)).max()
        assert after < 0.05 * before, (before, after)
        # translation untouched
        np.testing.assert_allclose(T_good[:3, 3], T_bad[:3, 3])
        # batched + validation
        batch = jnp.stack([T, jnp.asarray(T_bad)])
        out = orthonormalize_rotations(batch)
        assert out.shape == (2, 4, 4)
        with pytest.raises(ValueError):
            orthonormalize_rotations(jnp.eye(3))

    def test_relative_transformation(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        T1, T2 = random_se3(k1), random_se3(k2)
        T12 = relative_transformation(T1, T2)
        np.testing.assert_allclose(
            np.asarray(compose_transformations(T1, T12)), np.asarray(T2), atol=1e-5
        )

    def test_transform_pointcloud_roundtrip(self):
        T = random_se3(jax.random.PRNGKey(2))
        pts = jax.random.normal(jax.random.PRNGKey(3), (100, 3))
        out = transform_pointcloud(pts, T)
        back = transform_pointcloud(out, inverse_transformation(T))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

    def test_transform_pointcloud_batched(self):
        T = random_se3(jax.random.PRNGKey(4), (2,))
        pts = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 3))
        out = transform_pointcloud(pts, T)
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(out[b]),
                np.asarray(transform_pointcloud(pts[b], T[b])),
                atol=1e-5,
            )

    def test_transform_normals_preserves_norm(self):
        T = random_se3(jax.random.PRNGKey(6))
        n = jax.random.normal(jax.random.PRNGKey(7), (50, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        out = transform_normals(n, T)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(out, axis=-1)), np.ones(50), atol=1e-5
        )

    def test_quaternion_to_rotation_matrix_identity(self):
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(quaternion_to_rotation_matrix(q)), np.eye(3), atol=1e-6
        )

    def test_quaternion_to_rotation_matrix_is_rotation(self):
        q = jax.random.normal(jax.random.PRNGKey(8), (5, 4))
        R = quaternion_to_rotation_matrix(q)
        eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        np.testing.assert_allclose(
            np.asarray(eye), np.tile(np.eye(3), (5, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(5), atol=1e-5)


class TestSE3:
    def test_so3_hat_antisymmetric(self):
        w = jnp.asarray([1.0, 2.0, 3.0])
        h = so3_hat(w)
        np.testing.assert_allclose(np.asarray(h), -np.asarray(h).T)

    def test_se3_hat_layout(self):
        xi = jnp.arange(6, dtype=jnp.float32)
        h = se3_hat(xi)
        np.testing.assert_allclose(np.asarray(h[:3, 3]), [0.0, 1.0, 2.0])
        np.testing.assert_allclose(np.asarray(h[3]), np.zeros(4))

    def test_so3_exp_is_rotation(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        R = so3_exp(w)
        eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        np.testing.assert_allclose(
            np.asarray(eye), np.tile(np.eye(3), (10, 1, 1)), atol=1e-5
        )

    def test_so3_exp_small_angle(self):
        w = jnp.asarray([1e-8, 0.0, 0.0])
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3) + np.asarray(so3_hat(w)))

    def test_se3_exp_identity(self):
        T = se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.eye(4))

    def test_se3_exp_matches_matrix_exp(self):
        from scipy.linalg import expm

        rng = np.random.RandomState(0)
        for _ in range(5):
            xi = rng.randn(6).astype(np.float32) * 0.7
            ours = np.asarray(se3_exp(jnp.asarray(xi)))
            theirs = expm(np.asarray(se3_hat(jnp.asarray(xi))))
            np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_se3_exp_column_vector_parity(self):
        """Reference ICP calls se3_exp on a (6, 1) solver output."""
        xi = jnp.arange(6, dtype=jnp.float32).reshape(6, 1) * 0.1
        np.testing.assert_allclose(
            np.asarray(se3_exp(xi)), np.asarray(se3_exp(xi[:, 0])), atol=1e-6
        )

    def test_se3_exp_batched(self):
        xi = jax.random.normal(jax.random.PRNGKey(1), (4, 6)) * 0.5
        batched = se3_exp(xi)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(se3_exp(xi[i])), atol=1e-6
            )

    def test_se3_exp_grad_finite_at_zero(self):
        g = jax.grad(lambda xi: jnp.sum(se3_exp(xi)))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_se3_exp_jittable(self):
        f = jax.jit(se3_exp)
        xi = jnp.ones(6) * 0.1
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(se3_exp(xi)), atol=1e-6)


class TestReferenceCompatNames:
    """The reference's geometryutils public surface kept verbatim
    (inverse_transfom_3d:205 [sic], compose_transforms_3d:244,
    relative_transform_3d:393, cam2pixel_KF:703)."""

    def test_inverse_compose_relative(self):
        from gradslam_tpu.geometry.geometryutils import (
            compose_transforms_3d,
            inverse_transfom_3d,
            relative_transform_3d,
        )

        T1 = np.eye(4, dtype=np.float32)
        T1[:3, 3] = [1.0, 2.0, 3.0]
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = np.array(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32
        )
        T2[:3, 3] = [4.0, 5.0, 6.0]
        np.testing.assert_allclose(
            np.asarray(compose_transforms_3d(T1, T2)), T1 @ T2, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(inverse_transfom_3d(T2)) @ T2, np.eye(4), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(relative_transform_3d(T1, T2)),
            np.linalg.inv(T1) @ T2,
            atol=1e-6,
        )
        with pytest.raises(ValueError):
            compose_transforms_3d(T1, np.stack([T2, T2]))

    def test_cam2pixel_KF(self):
        from gradslam_tpu.geometry.geometryutils import cam2pixel_KF

        pts = np.array([[0.0, 0.0, 2.0], [1.0, 1.0, 0.0]], dtype=np.float32)
        P = np.eye(4, dtype=np.float32)
        P[:3, 3] = [1.0, 2.0, 3.0]
        uv = np.asarray(cam2pixel_KF(pts, P))
        np.testing.assert_allclose(uv[0], [1.0 / 5.0, 2.0 / 5.0], atol=1e-6)
        # z == 0 guard: divide by 1 instead of 0
        np.testing.assert_allclose(uv[1], [2.0 / 3.0, 3.0 / 3.0], atol=1e-6)


class TestBatchedGridTransforms:
    """Round-2 review fix: (B, 4, 4) matrices must broadcast over grid-shaped
    points (the reference's documented cam2pixel/pixel2cam shapes)."""

    def test_pixel2cam_batched(self):
        from gradslam_tpu.geometry.geometryutils import pixel2cam

        B, H, W = 2, 3, 5
        rng = np.random.RandomState(0)
        depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) + 0.5)
        Kinv = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        pix = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        cam = pixel2cam(depth, Kinv, pix)
        assert cam.shape == (B, H, W, 3)
        np.testing.assert_allclose(
            np.asarray(cam), np.asarray(pix) * np.asarray(depth)[..., None],
            atol=1e-6,
        )

    def test_cam2pixel_batched(self):
        from gradslam_tpu.geometry.geometryutils import cam2pixel

        B, H, W = 2, 3, 4
        rng = np.random.RandomState(1)
        cam = rng.rand(B, H, W, 3).astype(np.float32) + 1.0
        P = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4))
        uv = cam2pixel(jnp.asarray(cam), jnp.asarray(P))
        assert uv.shape == (B, H, W, 2)
        np.testing.assert_allclose(
            np.asarray(uv), cam[..., :2] / cam[..., 2:3], atol=1e-5
        )

    def test_transform_pts_nd_grid_broadcast(self):
        from gradslam_tpu.geometry.geometryutils import transform_pts_nd

        # B == H used to broadcast BY ACCIDENT and apply matrix b to image
        # row h=b; distinct per-batch translations catch that silently-wrong
        # case as well as the crash.
        B = H = 3
        W = 5
        rng = np.random.RandomState(2)
        pts = rng.rand(B, H, W, 3).astype(np.float32)
        T = np.stack([np.eye(4, dtype=np.float32)] * B)
        for b in range(B):
            T[b, :3, 3] = [b, 2.0 * b, -b]
        out = transform_pts_nd(jnp.asarray(pts), jnp.asarray(T))
        assert out.shape == (B, H, W, 3)
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(out)[b], pts[b] + T[b, :3, 3], atol=1e-6
            )
