"""ops/linalg tests (ref math/gauss_jordan_test.cpp,
matrix_square_root_test.cpp, rq_decomposition usage in base/projection)."""
import numpy as np
import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import linalg


class TestGaussJordan:
    def test_inverse(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(0, 1, (6, 6)) + 6 * np.eye(6))
        _, X = linalg.gauss_jordan(A)
        np.testing.assert_allclose(np.asarray(A @ X), np.eye(6),
                                   atol=1e-10)

    def test_solve(self):
        rng = np.random.default_rng(1)
        A = jnp.asarray(rng.normal(0, 1, (5, 5)) + 5 * np.eye(5))
        b = jnp.asarray(rng.normal(0, 1, (5, 2)))
        _, X = linalg.gauss_jordan(A, b)
        np.testing.assert_allclose(np.asarray(A @ X), np.asarray(b),
                                   atol=1e-10)


class TestRQ:
    def test_reconstructs(self):
        rng = np.random.default_rng(2)
        M = jnp.asarray(rng.normal(0, 1, (3, 3)))
        R, Q = linalg.rq_decomposition(M)
        np.testing.assert_allclose(np.asarray(R @ Q), np.asarray(M),
                                   atol=1e-10)
        # upper triangular, orthonormal
        np.testing.assert_allclose(np.tril(np.asarray(R), -1), 0,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(3),
                                   atol=1e-10)
        assert np.all(np.diag(np.asarray(R)) >= 0)

    def test_decompose_projection(self):
        rng = np.random.default_rng(3)
        K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
        from dagsfm_tpu.ops import rotations as rops
        R = np.asarray(rops.angleaxis_to_rotmat(
            jnp.asarray(rng.normal(0, 0.5, 3))))
        t = rng.normal(0, 1, 3)
        P = K @ np.hstack([R, t[:, None]])
        K2, R2, t2 = linalg.decompose_projection_matrix(jnp.asarray(P))
        np.testing.assert_allclose(np.asarray(K2), K / K[2, 2], atol=1e-8)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-8)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-8)


class TestSqrtm:
    def test_spd(self):
        rng = np.random.default_rng(4)
        B = rng.normal(0, 1, (4, 4))
        A = jnp.asarray(B @ B.T + 4 * np.eye(4))
        S = linalg.matrix_square_root(A)
        np.testing.assert_allclose(np.asarray(S @ S), np.asarray(A),
                                   atol=1e-8)


class TestGenericLM:
    def test_rosenbrock_like(self):
        def residual(x):
            return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
        out = linalg.levenberg_marquardt(residual,
                                         jnp.asarray([-1.2, 1.0]),
                                         max_iterations=100)
        np.testing.assert_allclose(np.asarray(out.x), [1.0, 1.0],
                                   atol=1e-6)

    def test_pose_polish(self):
        # refine a perturbed Sim(3)-ish 6-dof fit of point pairs
        rng = np.random.default_rng(5)
        from dagsfm_tpu.ops import rotations as rops
        X = jnp.asarray(rng.uniform(-1, 1, (30, 3)))
        aa_gt = jnp.asarray([0.1, -0.2, 0.15])
        t_gt = jnp.asarray([0.3, 0.1, -0.2])
        Y = rops.quat_rotate(
            jnp.broadcast_to(rops.angleaxis_to_quat(aa_gt), (30, 4)), X) \
            + t_gt

        def residual(p):
            q = rops.angleaxis_to_quat(p[:3])
            pred = rops.quat_rotate(jnp.broadcast_to(q, (30, 4)), X) + p[3:]
            return (pred - Y).ravel()

        out = linalg.levenberg_marquardt(residual, jnp.zeros(6),
                                         max_iterations=40)
        np.testing.assert_allclose(np.asarray(out.x[:3]),
                                   np.asarray(aa_gt), atol=1e-8)
        assert float(out.final_cost) < 1e-16
