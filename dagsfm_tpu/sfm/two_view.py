"""Batched two-view geometry estimation over MANY pairs at once.

TPU-native counterpart of the reference's per-pair TwoViewGeometry::
Estimate running inside matcher/verifier threads (/root/reference/src/
estimators/two_view_geometry.cc:113 + feature/matching.cc:550-608
TwoViewGeometryVerifier). Instead of a thread pipeline with queues, ALL
pairs (padded to a common bucket) are verified in ONE vmapped
RANSAC+cheirality program — matcher-queue parallelism (SURVEY.md P4)
becomes a single fused device batch.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import ransac as rnsc


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def estimate_two_view_batched(keys, x1, x2, mask, thr, num_hyps: int = 256):
    """Essential RANSAC + pose recovery for a batch of pairs.

    keys (B, 2) PRNG keys; x1, x2 (B, N, 2) normalized coords; mask (B, N);
    thr (B,) squared Sampson thresholds.
    Returns (R (B,3,3), t (B,3), num_inliers (B,), num_in_front (B,),
    inliers (B, N), valid (B,)).
    """

    def one(key, x1p, x2p, m, t):
        res = rnsc.ransac(
            key, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
            data=(x1p, x2p), mask=m, sample_size=5, threshold=t,
            num_hypotheses=num_hyps,
            refit=lambda a, b, inl: epi.essential_8pt(a, b, mask=inl)[0][0])
        R, tvec, nf = epi.pose_from_essential(res.model, x1p, x2p,
                                              res.inliers)
        return R, tvec, res.num_inliers, nf, res.inliers, res.valid

    return jax.vmap(one)(keys, x1, x2, mask, thr)


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _estimate_one(key, x1, x2, mask, thr, num_hyps: int = 256):
    def one(key, x1p, x2p, m, t):
        res = rnsc.ransac(
            key, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
            data=(x1p, x2p), mask=m, sample_size=5, threshold=t,
            num_hypotheses=num_hyps,
            refit=lambda a, b, inl: epi.essential_8pt(a, b, mask=inl)[0][0])
        R, tvec, nf = epi.pose_from_essential(res.model, x1p, x2p,
                                              res.inliers)
        return R, tvec, res.num_inliers, nf, res.inliers, res.valid
    return one(key, x1, x2, mask, thr)


def verify_pairs(pair_data: list, num_hyps: int = 256, seed: int = 0,
                 min_bucket: int = 64):
    """Host wrapper: verify many pairs through per-bucket compiled programs.

    pair_data: list of (pair_key, x1 (M,2) np, x2 (M,2) np, thr float).
    Returns dict pair_key -> (R, t, num_inliers, num_in_front,
    inlier_mask, valid).

    Pairs run sequentially through a single-pair program (one XLA compile
    per padded bucket size); the per-pair program is itself fully batched
    over hypotheses. (A pair-vmapped variant exists above as
    estimate_two_view_batched; XLA:CPU compile time scales badly with the
    extra batch dim, so the host loop wins for the test/CPU path.)
    """
    def bucket(n):
        b = min_bucket
        while b < n:
            b *= 2
        return b

    master_key = jax.random.PRNGKey(seed)
    out = {}
    for (key_pair, a, b, t) in pair_data:
        n = bucket(len(a))
        x1 = np.zeros((n, 2))
        x2 = np.zeros((n, 2))
        mask = np.zeros(n, bool)
        x1[: len(a)] = a
        x2[: len(b)] = b
        mask[: len(a)] = True
        master_key, sub = jax.random.split(master_key)
        R, tvec, ninl, nf, inl, valid = _estimate_one(
            sub, jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
            float(t), num_hyps)
        out[key_pair] = (np.asarray(R), np.asarray(tvec), int(ninl),
                         int(nf), np.asarray(inl)[: len(a)], bool(valid))
    return out
