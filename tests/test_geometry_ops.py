"""Geometry kernel tests: Umeyama, triangulation, polynomials, projection.

Style mirrors reference estimator tests (synthetic exact checks + noise),
e.g. estimators/rigid_transformation3D_srt and base/triangulation tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import polynomials as poly
from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.ops import triangulation as tri
from dagsfm_tpu.ops import umeyama as ume


class TestUmeyama:
    def _make(self, key, n=50, scale=2.5):
        kx, kr, kt = jax.random.split(key, 3)
        x = jax.random.normal(kx, (n, 3))
        R = rops.angleaxis_to_rotmat(jax.random.normal(kr, (3,)))
        t = jax.random.normal(kt, (3,)) * 4.0
        y = scale * x @ R.T + t
        return x, y, scale, R, t

    def test_exact(self):
        x, y, s, R, t = self._make(jax.random.PRNGKey(0))
        s2, R2, t2 = ume.umeyama(x, y)
        assert abs(float(s2) - s) < 1e-9
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-8)

    def test_numpy_matches_jax(self):
        x, y, *_ = self._make(jax.random.PRNGKey(1))
        s1, R1, t1 = ume.umeyama(x, y)
        s2, R2, t2 = ume.umeyama_np(np.asarray(x), np.asarray(y))
        assert abs(float(s1) - s2) < 1e-9
        np.testing.assert_allclose(R1, R2, atol=1e-9)

    def test_no_scale(self):
        x, y, s, R, t = self._make(jax.random.PRNGKey(2), scale=1.0)
        s2, _, _ = ume.umeyama(x, y, with_scale=False)
        assert float(s2) == 1.0

    def test_ransac_with_outliers(self):
        x, y, s, R, t = self._make(jax.random.PRNGKey(3), n=100)
        x = np.array(x)
        y = np.array(y)
        rng = np.random.default_rng(0)
        out = rng.random(100) < 0.3
        y[out] += rng.uniform(2.0, 5.0, (out.sum(), 3))
        mask = np.ones(100, bool)
        s2, R2, t2, inl, n_inl = ume.ransac_umeyama(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask),
            jax.random.PRNGKey(4), threshold=0.05)
        assert abs(float(s2) - s) < 1e-6
        np.testing.assert_allclose(R2, R, atol=1e-6)
        assert int(n_inl) >= (~out).sum() - 2
        assert not np.any(np.asarray(inl) & out)


class TestTriangulation:
    def test_multiview_exact(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, 3) + np.array([0, 0, 5.0])
        K = 6
        qs, ts, uvs = [], [], []
        for k in range(K):
            aa = rng.normal(0, 0.2, 3)
            R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
            t = rng.normal(0, 1.0, 3)
            Xc = R @ X + t
            uvs.append(Xc[:2] / Xc[2])
            qs.append(np.asarray(rops.rotmat_to_quat(jnp.asarray(R))))
            ts.append(t)
        out = tri.triangulate_dlt(jnp.asarray(np.stack(qs)),
                                  jnp.asarray(np.stack(ts)),
                                  jnp.asarray(np.stack(uvs)),
                                  jnp.ones(K, bool))
        np.testing.assert_allclose(out, X, atol=1e-8)

    def test_masked_rows_ignored(self):
        rng = np.random.default_rng(1)
        X = np.array([0.5, -0.3, 6.0])
        qs, ts, uvs = [], [], []
        for k in range(4):
            aa = rng.normal(0, 0.3, 3)
            R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(aa)))
            t = rng.normal(0, 1.0, 3)
            Xc = R @ X + t
            uvs.append(Xc[:2] / Xc[2])
            qs.append(np.asarray(rops.rotmat_to_quat(jnp.asarray(R))))
            ts.append(t)
        # corrupt last row, mask it out
        uvs[3] = uvs[3] + 10.0
        mask = jnp.array([True, True, True, False])
        out = tri.triangulate_dlt(jnp.asarray(np.stack(qs)),
                                  jnp.asarray(np.stack(ts)),
                                  jnp.asarray(np.stack(uvs)), mask)
        np.testing.assert_allclose(out, X, atol=1e-8)

    def test_track_blocks_and_batch(self):
        from dagsfm_tpu.scene import synthetic
        spec = synthetic.SyntheticSceneSpec(num_cameras=8, num_points=60,
                                            seed=7)
        sc = synthetic.generate(spec)
        rec = synthetic.to_reconstruction(sc)
        arrays, ids = rec.to_arrays()
        f, cx, cy = sc.camera.params
        uv = (arrays.obs_xy - np.array([cx, cy])) / f
        timg, tuv, tmask = tri.track_blocks_from_obs(
            arrays.obs_image, arrays.obs_point, uv, arrays.obs_mask,
            arrays.points_xyz.shape[0], max_track_len=8)
        pts = tri.triangulate_tracks(
            jnp.asarray(arrays.image_qvec), jnp.asarray(arrays.image_tvec),
            jnp.asarray(timg), jnp.asarray(tuv), jnp.asarray(tmask))
        have = np.asarray(tmask).sum(1) >= 2
        np.testing.assert_allclose(np.asarray(pts)[have],
                                   arrays.points_xyz[have], atol=1e-6)


class TestPolynomials:
    def test_quadratic(self):
        r, m = poly.solve_quadratic(jnp.array(1.0), jnp.array(-3.0),
                                    jnp.array(2.0))
        assert sorted(np.asarray(r).tolist()) == pytest.approx([1.0, 2.0])
        assert np.asarray(m).all()

    def test_quadratic_complex(self):
        _, m = poly.solve_quadratic(jnp.array(1.0), jnp.array(0.0),
                                    jnp.array(1.0))
        assert not np.asarray(m).any()

    def test_cubic_all(self):
        # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
        r, m = poly.solve_cubic_all(jnp.array(1.0), jnp.array(-6.0),
                                    jnp.array(11.0), jnp.array(-6.0))
        got = sorted(np.asarray(r)[np.asarray(m)].tolist())
        np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-7)

    def test_quartic(self):
        # (x^2-1)(x^2-4) = x^4 -5x^2 +4
        r, m = poly.solve_quartic_real(jnp.array(1.0), jnp.array(0.0),
                                       jnp.array(-5.0), jnp.array(0.0),
                                       jnp.array(4.0))
        got = sorted(np.asarray(r)[np.asarray(m)].tolist())
        np.testing.assert_allclose(got, [-2, -1, 1, 2], atol=1e-7)

    def test_grid_roots_degree10(self):
        roots_true = np.array([-3.5, -1.2, -0.3, 0.7, 2.9])
        c = np.poly(np.concatenate([roots_true, roots_true + 0.2]))
        r, m = poly.real_roots_sturm(jnp.asarray(c), max_roots=10)
        got = np.sort(np.asarray(r)[np.asarray(m)])
        assert len(got) == 10
        expect = np.sort(np.concatenate([roots_true, roots_true + 0.2]))
        np.testing.assert_allclose(got, expect, atol=1e-6)
