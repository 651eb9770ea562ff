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


def verify_pairs(pair_data: list, num_hyps: int = 256, seed: int = 0,
                 min_bucket: int = 64):
    """Host wrapper: group pairs by padded bucket size and run one batched
    device call per bucket group.

    pair_data: list of (pair_key, x1 (M,2) np, x2 (M,2) np, thr float).
    Returns dict pair_key -> (R, t, num_inliers, num_in_front, inlier_mask).
    """
    def bucket(n):
        b = min_bucket
        while b < n:
            b *= 2
        return b

    groups: dict[int, list] = {}
    for entry in pair_data:
        groups.setdefault(bucket(len(entry[1])), []).append(entry)

    # chunk pair batches so memory stays bounded and batch shapes hit a
    # small set of compiled programs
    MAX_B = 32
    chunked: list[tuple] = []
    for bsize, entries in sorted(groups.items()):
        for s in range(0, len(entries), MAX_B):
            chunked.append((bsize, entries[s: s + MAX_B]))

    master_key = jax.random.PRNGKey(seed)
    out = {}
    for bsize, entries in chunked:
        B = len(entries)
        # pad the batch dim to MAX_B so each bucket compiles once
        while len(entries) < MAX_B:
            entries = entries + [entries[-1]]
        B_pad = len(entries)
        x1 = np.zeros((B_pad, bsize, 2))
        x2 = np.zeros((B_pad, bsize, 2))
        mask = np.zeros((B_pad, bsize), bool)
        thr = np.zeros(B_pad)
        for k, (_, a, b, t) in enumerate(entries):
            x1[k, : len(a)] = a
            x2[k, : len(b)] = b
            mask[k, : len(a)] = True
            thr[k] = t
        master_key, sub = jax.random.split(master_key)
        keys = jax.random.split(sub, B_pad)
        R, t, ninl, nf, inl, valid = estimate_two_view_batched(
            keys, jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(mask),
            jnp.asarray(thr), num_hyps)
        R = np.asarray(R)
        t = np.asarray(t)
        ninl = np.asarray(ninl)
        nf = np.asarray(nf)
        inl = np.asarray(inl)
        valid = np.asarray(valid)
        for k, (key, a, _, _) in enumerate(entries):
            out[key] = (R[k], t[k], int(ninl[k]), int(nf[k]),
                        inl[k, : len(a)], bool(valid[k]))
    return out
