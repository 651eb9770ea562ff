"""P3P / EPnP / batched RANSAC tests (ref: estimators/absolute_pose_test.cc,
optim/ransac_test.cc, optim/loransac_test.cc style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import absolute_pose as ap
from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import ransac as rnsc
from dagsfm_tpu.ops import rotations as rops


def make_pnp(seed, n=30, noise=0.0, outliers=0.0):
    rng = np.random.default_rng(seed)
    aa = rng.normal(0, 0.5, 3)
    R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
    t = rng.normal(0, 1, 3)
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    # make sure points are in front of camera: shift along cam z
    C = -R.T @ t
    X = X + C + R.T @ np.array([0, 0, 8.0]) - X.mean(0)
    Xc = X @ R.T + t
    assert (Xc[:, 2] > 0).all()
    uv = Xc[:, :2] / Xc[:, 2:]
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
    is_out = np.zeros(n, bool)
    if outliers:
        is_out = rng.random(n) < outliers
        uv[is_out] += rng.uniform(0.1, 0.5, (is_out.sum(), 2)) * \
            np.sign(rng.normal(size=(is_out.sum(), 2)))
    return jnp.asarray(X), jnp.asarray(uv), R, t, is_out


class TestP3P:
    def test_exact(self):
        X, uv, R, t, _ = make_pnp(0, n=3)
        Rs, ts, valid = ap.p3p(X, uv)
        best = np.inf
        for k in range(4):
            if not bool(valid[k]):
                continue
            err = np.abs(np.asarray(Rs[k]) - R).max() + \
                np.abs(np.asarray(ts[k]) - t).max()
            best = min(best, err)
        assert best < 1e-6

    def test_many_random(self):
        ok = 0
        for seed in range(20):
            X, uv, R, t, _ = make_pnp(100 + seed, n=3)
            Rs, ts, valid = ap.p3p(X, uv)
            errs = [np.abs(np.asarray(Rs[k]) - R).max()
                    for k in range(4) if bool(valid[k])]
            if errs and min(errs) < 1e-5:
                ok += 1
        assert ok >= 19  # P3P can have degenerate configs; near-total success


class TestEPnP:
    def test_exact(self):
        X, uv, R, t, _ = make_pnp(1, n=20)
        R2, t2, ok = ap.epnp(X, uv)
        assert bool(ok)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=1e-4)

    def test_noisy(self):
        X, uv, R, t, _ = make_pnp(2, n=60, noise=1e-3)
        R2, t2, ok = ap.epnp(X, uv)
        ang = float(rops.rotation_angle_deg(jnp.asarray(R), R2))
        assert ang < 0.5
        assert np.linalg.norm(np.asarray(t2) - t) < 0.05

    def test_masked(self):
        X, uv, R, t, _ = make_pnp(3, n=40)
        # corrupt last 10, mask them
        uv = uv.at[30:].add(10.0)
        mask = jnp.arange(40) < 30
        R2, t2, ok = ap.epnp(X, uv, mask=mask)
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestRansacP3P:
    def test_outlier_rejection(self):
        X, uv, R, t, is_out = make_pnp(4, n=100, noise=1e-4, outliers=0.3)
        res = rnsc.ransac(
            jax.random.PRNGKey(0),
            solver=lambda Xs, uvs: (lambda out: (
                jnp.concatenate([out[0], out[1][:, :, None]], axis=-1),
                out[2]))(ap.p3p(Xs, uvs)),
            residual_fn=lambda M, Xd, uvd: ap.pose_reproj_error(
                M[:, :3], M[:, 3], Xd, uvd),
            data=(X, uv),
            mask=jnp.ones(100, bool),
            sample_size=3,
            threshold=(3e-4) ** 2,
            num_hypotheses=256,
            refit=lambda Xd, uvd, inl: (lambda out: jnp.concatenate(
                [out[0], out[1][:, None]], axis=-1))(
                    ap.epnp(Xd, uvd, mask=inl)),
        )
        assert bool(res.valid)
        R2 = np.asarray(res.model[:, :3])
        t2 = np.asarray(res.model[:, 3])
        ang = float(rops.rotation_angle_deg(jnp.asarray(R), jnp.asarray(R2)))
        assert ang < 0.1
        assert np.linalg.norm(t2 - t) < 0.01
        # no outliers among the accepted inliers
        assert not np.any(np.asarray(res.inliers) & is_out)
        assert int(res.num_inliers) >= (~is_out).sum() - 3


class TestRansacEssential:
    def test_two_view_with_outliers(self):
        from tests.test_epipolar import make_two_view
        x1, x2, R, t, E = make_two_view(jax.random.PRNGKey(7), n=200,
                                        noise=1e-4)
        x1 = np.array(x1)
        x2 = np.array(x2)
        rng = np.random.default_rng(0)
        is_out = rng.random(200) < 0.4
        x2[is_out] += rng.uniform(0.05, 0.4, (is_out.sum(), 2))
        x1j, x2j = jnp.asarray(x1), jnp.asarray(x2)
        res = rnsc.ransac(
            jax.random.PRNGKey(1),
            solver=epi.essential_5pt,
            residual_fn=epi.sampson_error,
            data=(x1j, x2j),
            mask=jnp.ones(200, bool),
            sample_size=5,
            threshold=(4e-4) ** 2,
            num_hypotheses=256,
            refit=lambda a, b, inl: epi.essential_8pt(a, b, mask=inl)[0][0],
        )
        assert bool(res.valid)
        R2, t2, nf = epi.pose_from_essential(res.model, x1j, x2j, res.inliers)
        ang = float(rops.rotation_angle_deg(jnp.asarray(R), R2))
        assert ang < 0.2
        inl = np.asarray(res.inliers)
        # Sampson distance is point-to-epipolar-line: outliers displaced
        # along the line are geometrically inliers, so only require that
        # the bulk of outliers is rejected and true inliers are kept.
        assert (inl & is_out).sum() < 0.2 * is_out.sum()
        assert (inl & ~is_out).sum() >= 0.95 * (~is_out).sum()


def test_focal_grid_ransac_recovers_focal():
    """_ransac_p3p_focal (ref pose.cc:79 estimate_focal_length): with a
    2x-wrong focal prior the grid search must find factor ~0.5 and pose
    inliers."""
    import jax
    import jax.numpy as jnp
    from dagsfm_tpu.sfm.incremental_mapper import _ransac_p3p_focal
    from dagsfm_tpu.ops import rotations as rops

    rng = np.random.default_rng(3)
    N = 64
    X = rng.uniform(-1, 1, (N, 3)) + np.array([0, 0, 4.0])
    aa = np.array([0.1, -0.2, 0.05])
    R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
    t = np.array([0.1, 0.05, 0.3])
    Xc = X @ R.T + t
    true_f = 500.0
    centered = true_f * Xc[:, :2] / Xc[:, 2:]
    centered += rng.normal(0, 0.3, centered.shape)
    mask = np.ones(N, bool)

    model, inl, num, factor = _ransac_p3p_focal(
        jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(centered),
        jnp.asarray(mask), 1000.0, 4.0, 128)
    assert int(num) >= 0.8 * N, int(num)
    est_f = 1000.0 * float(factor)
    assert abs(est_f - true_f) / true_f < 0.35, est_f
    Rt = np.asarray(model)
    assert np.allclose(Rt[:, :3] @ Rt[:, :3].T, np.eye(3), atol=1e-4)
