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
