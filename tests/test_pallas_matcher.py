"""Pallas matcher kernel (interpret mode on CPU): must match the XLA
matcher exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.features import matching as fm
from dagsfm_tpu.ops import pallas_matcher as pm


def toy_descs(seed, k1=256, k2=256, common=80):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (common, 128))
    d1 = np.concatenate([base + rng.normal(0, 0.05, base.shape),
                         rng.normal(0, 1, (k1 - common, 128))])
    d2 = np.concatenate([base + rng.normal(0, 0.05, base.shape),
                         rng.normal(0, 1, (k2 - common, 128))])
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return d1.astype(np.float32), d2.astype(np.float32)


class TestPallasTop2:
    def test_matches_reference_top2(self):
        d1, d2 = toy_descs(0)
        best, second, idx = pm.pallas_top2(jnp.asarray(d1), jnp.asarray(d2),
                                           interpret=True)
        sim = d1 @ d2.T
        ref_idx = sim.argmax(1)
        ref_best = sim.max(1)
        sim2 = sim.copy()
        sim2[np.arange(len(d1)), ref_idx] = -np.inf
        ref_second = sim2.max(1)
        np.testing.assert_allclose(np.asarray(best), ref_best, atol=1e-5)
        np.testing.assert_allclose(np.asarray(second), ref_second,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_multi_tile(self):
        d1, d2 = toy_descs(1, k1=128, k2=512, common=60)
        best, second, idx = pm.pallas_top2(jnp.asarray(d1), jnp.asarray(d2),
                                           interpret=True)
        sim = d1 @ d2.T
        np.testing.assert_array_equal(np.asarray(idx), sim.argmax(1))


class TestPallasMatch:
    def test_agrees_with_xla_matcher(self):
        d1, d2 = toy_descs(2)
        m = np.ones(256, bool)
        matches_p, n_p = pm.pallas_match(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m),
            jnp.asarray(m), interpret=True)
        matches_x, n_x = fm.match_pair_batch(
            jnp.asarray(d1[None]), jnp.asarray(d2[None]),
            jnp.asarray(m[None]), jnp.asarray(m[None]))
        mp = np.asarray(matches_p)
        mp = set(map(tuple, mp[mp[:, 0] >= 0]))
        mx = np.asarray(matches_x[0])
        mx = set(map(tuple, mx[mx[:, 0] >= 0]))
        # identical match sets (same ratio/cross-check semantics)
        assert mp == mx

    def test_masked(self):
        d1, d2 = toy_descs(3)
        m1 = np.ones(256, bool)
        m2 = np.ones(256, bool)
        m2[:80] = False
        matches_p, n_p = pm.pallas_match(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1),
            jnp.asarray(m2), interpret=True)
        mp = np.asarray(matches_p)
        mp = mp[mp[:, 0] >= 0]
        assert not np.any(mp[:, 1] < 80)


class TestPallasBatchKernel:
    """Batched fused kernel (round-4): one pass computes forward top-2
    AND the reverse cross-check argmax; must match the XLA matcher."""

    def _batch(self, B=3, k=256, seed=0):
        ds = [toy_descs(seed + b, k1=k, k2=k) for b in range(B)]
        d1 = np.stack([a for a, _ in ds])
        d2 = np.stack([b for _, b in ds])
        m1 = np.ones((B, k), bool)
        m1[:, k - 17:] = False          # ragged valid counts
        m2 = np.ones((B, k), bool)
        m2[:, k - 5:] = False
        return (jnp.asarray(d1), jnp.asarray(d2),
                jnp.asarray(m1), jnp.asarray(m2))

    def test_matches_xla_matcher_exactly(self):
        d1, d2, m1, m2 = self._batch()
        opts = fm.MatchingOptions()
        mp, cp = pm.pallas_match_pair_batch(
            d1, d2, m1, m2, max_ratio=opts.max_ratio,
            max_distance=opts.max_distance, interpret=True)
        mx, cx = fm.match_pair_batch(d1, d2, m1, m2, opts)
        np.testing.assert_array_equal(np.asarray(cp), np.asarray(cx))
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))
        assert int(np.asarray(cp).sum()) > 0  # non-trivial parity

    def test_no_cross_check(self):
        d1, d2, m1, m2 = self._batch(B=2)
        opts = fm.MatchingOptions(cross_check=False)
        mp, cp = pm.pallas_match_pair_batch(
            d1, d2, m1, m2, max_ratio=opts.max_ratio,
            max_distance=opts.max_distance, cross_check=False,
            interpret=True)
        mx, cx = fm.match_pair_batch(d1, d2, m1, m2, opts)
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))

    def test_masked_rows_never_match(self):
        d1, d2, m1, m2 = self._batch(B=2)
        mp, cp = pm.pallas_match_pair_batch(d1, d2, m1, m2, interpret=True)
        mp = np.asarray(mp)
        m1n, m2n = np.asarray(m1), np.asarray(m2)
        for b in range(mp.shape[0]):
            rows = mp[b][mp[b, :, 0] >= 0]
            assert m1n[b, rows[:, 0]].all()
            assert m2n[b, rows[:, 1]].all()

    def test_tile_selection(self):
        from dagsfm_tpu.ops.pallas_matcher import _pick_tile
        assert _pick_tile(1024) == 1024
        assert _pick_tile(512) == 512
        assert _pick_tile(384) == 128
        with pytest.raises(ValueError):
            _pick_tile(100)
