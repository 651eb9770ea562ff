"""Theia RANSAC stack tests (ref src/ransac/prosac_test.cpp,
lmed_test.cpp, evsac_test.cpp, exhaustive_ransac_test.cpp, sprt): a 2D line
-fitting estimator with synthetic inliers/outliers, mirroring the
reference's test fixtures."""
import numpy as np
import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import ransac_variants as rv


def line_solver(xs, ys):
    """2-point line fit: returns (1, 3) [a, b, c] with ax+by+c=0, |a,b|=1."""
    x1, y1 = xs[0], ys[0]
    x2, y2 = xs[1], ys[1]
    a = y2 - y1
    b = x1 - x2
    c = -(a * x1 + b * y1)
    n = jnp.sqrt(a * a + b * b)
    ok = n > 1e-9
    n = jnp.maximum(n, 1e-9)
    return jnp.stack([a / n, b / n, c / n])[None], ok[None]


def line_residual(model, xs, ys):
    return (model[0] * xs + model[1] * ys + model[2]) ** 2


def make_line_data(rng, n=100, outlier_frac=0.4, noise=0.01):
    """y = 2x + 1 with outliers; quality = 1 for inliers-ish points."""
    n_out = int(n * outlier_frac)
    x = rng.uniform(-5, 5, n)
    y = 2 * x + 1 + rng.normal(0, noise, n)
    out_idx = rng.choice(n, n_out, replace=False)
    y[out_idx] += rng.uniform(2, 10, n_out) * rng.choice([-1, 1], n_out)
    is_inl = np.ones(n, bool)
    is_inl[out_idx] = False
    # quality: noisy but correlated with inlier-ness (like ratio-test score)
    quality = is_inl * 1.0 + rng.uniform(0, 0.3, n)
    return (jnp.asarray(x), jnp.asarray(y), is_inl,
            jnp.asarray(quality))


def _check_line(model):
    m = np.asarray(model)
    # ax + by + c = 0 for y=2x+1 -> direction (1,2): normal ∝ (2,-1), c ∝ -1
    m = m / np.linalg.norm(m[:2]) * np.sign(m[0]) if m[0] != 0 else m
    np.testing.assert_allclose(m[0] / -m[1], 2.0, atol=0.05)
    np.testing.assert_allclose(m[2] / -m[1], 1.0, atol=0.05)


def test_prosac_prefix_schedule():
    sizes = rv.prosac_prefix_sizes(100, 2, 500)
    assert sizes[0] == 2
    assert (np.diff(sizes) >= 0).all()
    assert sizes[-1] <= 100


def test_prosac_finds_line():
    rng = np.random.default_rng(0)
    x, y, is_inl, quality = make_line_data(rng)
    res = rv.robust_estimate(
        jax.random.PRNGKey(0), line_solver, line_residual, (x, y),
        jnp.ones(len(x), bool), sample_size=2, threshold=0.01,
        num_hypotheses=128, sampler="prosac", quality=quality)
    assert bool(res.valid)
    _check_line(res.model)
    assert np.asarray(res.inliers)[is_inl].mean() > 0.95


def test_weighted_evsac_sampler():
    rng = np.random.default_rng(1)
    x, y, is_inl, quality = make_line_data(rng, outlier_frac=0.6)
    res = rv.robust_estimate(
        jax.random.PRNGKey(1), line_solver, line_residual, (x, y),
        jnp.ones(len(x), bool), sample_size=2, threshold=0.01,
        num_hypotheses=128, sampler="weighted", quality=quality)
    assert bool(res.valid)
    _check_line(res.model)


def test_evsac_weights_favor_small_distances():
    rng = np.random.default_rng(2)
    good = np.column_stack([rng.uniform(0.1, 0.3, 50),
                            rng.uniform(0.8, 1.0, 50)])
    bad = np.column_stack([rng.uniform(0.7, 1.0, 50),
                           rng.uniform(0.8, 1.0, 50)])
    w = rv.evsac_weights(np.concatenate([good, bad]))
    assert w[:50].mean() > w[50:].mean()


def test_lmeds_threshold_free():
    rng = np.random.default_rng(3)
    x, y, is_inl, _ = make_line_data(rng, outlier_frac=0.3, noise=0.02)
    res = rv.robust_estimate(
        jax.random.PRNGKey(2), line_solver, line_residual, (x, y),
        jnp.ones(len(x), bool), sample_size=2, threshold=0.0,
        num_hypotheses=256, scoring="lmeds")
    assert bool(res.valid)
    _check_line(res.model)
    # LMedS inlier set should cover most true inliers
    assert np.asarray(res.inliers)[is_inl].mean() > 0.9


def test_exhaustive_sampler_enumerates_all():
    idx = rv.exhaustive_sample_indices(6, 2)
    assert len(idx) == 15
    assert len(np.unique(idx, axis=0)) == 15

    rng = np.random.default_rng(4)
    x, y, is_inl, _ = make_line_data(rng, n=16, outlier_frac=0.25)
    res = rv.robust_estimate(
        jax.random.PRNGKey(3), line_solver, line_residual, (x, y),
        jnp.ones(len(x), bool), sample_size=2, threshold=0.01,
        sampler="exhaustive")
    assert bool(res.valid)
    _check_line(res.model)


def test_sprt_accepts_good_rejects_bad():
    rng = np.random.default_rng(5)
    x, y, is_inl, _ = make_line_data(rng, outlier_frac=0.2)
    mask = jnp.ones(len(x), bool)
    good = jnp.asarray([2.0, -1.0, 1.0]) / np.sqrt(5.0)
    bad = jnp.asarray([1.0, 0.0, 3.0])
    r_good = line_residual(good, x, y)
    r_bad = line_residual(bad, x, y)
    opts = rv.SPRTOptions(delta=0.01, epsilon=0.5)
    acc_g, ll_g = rv.sprt_test(r_good, mask, 0.01, opts)
    acc_b, ll_b = rv.sprt_test(r_bad, mask, 0.01, opts)
    assert bool(acc_g)
    assert not bool(acc_b)
    assert float(ll_g) < float(ll_b)


def test_sprt_decision_threshold_positive():
    a = rv.sprt_decision_threshold(rv.SPRTOptions())
    assert a > 1.0
