"""Epipolar solver tests: synthetic exact + noise/outlier checks.

Mirrors reference estimators/essential_matrix_test.cc,
fundamental_matrix_test.cc, homography_matrix_test.cc style.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import rotations as rops


def make_two_view(key, n=50, noise=0.0):
    """Random relative pose + 3D points; returns normalized correspondences."""
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30)))
    aa = rng.normal(0, 0.4, 3)
    R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
    t = rng.normal(0, 1, 3)
    t = t / np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    if noise:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    E = np.asarray(rops.skew(jnp.asarray(t))) @ R
    return (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(E / np.linalg.norm(E)))


def algebraic_residual(E, x1, x2):
    p1 = np.concatenate([np.asarray(x1), np.ones((len(x1), 1))], 1)
    p2 = np.concatenate([np.asarray(x2), np.ones((len(x2), 1))], 1)
    return np.abs(np.einsum("ni,ij,nj->n", p2, np.asarray(E), p1))


class TestEssential8pt:
    def test_exact(self):
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(0))
        Es, valid = epi.essential_8pt(x1, x2)
        assert bool(valid[0])
        res = algebraic_residual(Es[0], x1, x2)
        assert res.max() < 1e-9

    def test_pose_recovery(self):
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(1))
        Es, _ = epi.essential_8pt(x1, x2)
        mask = jnp.ones(x1.shape[0], bool)
        R2, t2, n_front = epi.pose_from_essential(Es[0], x1, x2, mask)
        np.testing.assert_allclose(R2, R, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(t2) / np.linalg.norm(t2), np.asarray(t), atol=1e-6)
        assert int(n_front) == x1.shape[0]


class TestEssential5pt:
    def test_exact_minimal(self):
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(2), n=5)
        Es, valid = epi.essential_5pt(x1, x2)
        # at least one solution matches the true E (up to sign/scale)
        best = np.inf
        for k in range(Es.shape[0]):
            if not bool(valid[k]):
                continue
            res = algebraic_residual(Es[k], x1, x2).max()
            best = min(best, res)
        assert best < 1e-6

    def test_pose_recovery_from_5pt(self):
        x1f, x2f, R, t, E = make_two_view(jax.random.PRNGKey(3), n=40)
        x1, x2 = x1f[:5], x2f[:5]
        Es, valid = epi.essential_5pt(x1, x2)
        # select the solution with lowest residual on ALL 40 points
        best_k, best_res = 0, np.inf
        for k in range(Es.shape[0]):
            if not bool(valid[k]):
                continue
            res = algebraic_residual(Es[k], x1f, x2f).max()
            if res < best_res:
                best_res, best_k = res, k
        assert best_res < 1e-6
        mask = jnp.ones(40, bool)
        R2, t2, n_front = epi.pose_from_essential(Es[best_k], x1f, x2f, mask)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        assert int(n_front) == 40


class TestFundamental:
    def test_8pt_exact(self):
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(4))
        # pixels: scale up by a fake intrinsic
        K = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
        p1 = np.asarray(x1) @ K[:2, :2].T + K[:2, 2]
        p2 = np.asarray(x2) @ K[:2, :2].T + K[:2, 2]
        Fs, valid = epi.fundamental_8pt(jnp.asarray(p1), jnp.asarray(p2))
        res = algebraic_residual(Fs[0] / np.linalg.norm(np.asarray(Fs[0])),
                                 p1, p2)
        assert res.max() < 1e-6
        # E from F roundtrip
        E2 = epi.essential_from_fundamental(Fs[0], jnp.asarray(K),
                                            jnp.asarray(K))
        E2 = np.asarray(E2) / np.linalg.norm(np.asarray(E2))
        Et = np.asarray(E)
        align = min(np.abs(E2 - Et).max(), np.abs(E2 + Et).max())
        assert align < 1e-6

    def test_7pt_exact(self):
        x1, x2, *_ = make_two_view(jax.random.PRNGKey(5), n=7)
        Fs, valid = epi.fundamental_7pt(x1, x2)
        assert bool(valid.any())
        best = min(algebraic_residual(Fs[k], x1, x2).max()
                   for k in range(3) if bool(valid[k]))
        assert best < 1e-8

    def test_sampson_zero_on_exact(self):
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(6))
        err = epi.sampson_error(E, x1, x2)
        assert float(jnp.max(err)) < 1e-16


class TestHomography:
    def test_exact_plane(self):
        rng = np.random.default_rng(0)
        H = np.array([[1.1, 0.05, 0.2], [-0.03, 0.95, -0.1],
                      [0.002, -0.001, 1.0]])
        x1 = rng.uniform(-1, 1, (30, 2))
        p1 = np.concatenate([x1, np.ones((30, 1))], 1)
        q = p1 @ H.T
        x2 = q[:, :2] / q[:, 2:]
        Hs, valid = epi.homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(Hs[0]) / Hs[0][2, 2],
                                   H / H[2, 2], atol=1e-8)
        err = epi.homography_error(Hs[0], jnp.asarray(x1), jnp.asarray(x2))
        assert float(jnp.max(err)) < 1e-12
