"""Batched RANSAC / LO-RANSAC: all hypotheses as one fused device program.

TPU-native counterpart of /root/reference/src/optim/ransac.h:76 and
loransac.h:54 (and the Theia stack in src/ransac/). The reference runs
sequential trials with early termination (dynamic max_num_trials from
inlier ratio); on TPU that serial control flow would leave the chip idle,
so instead we evaluate a FIXED budget of hypotheses in parallel:

    sample all minimal sets -> vmapped minimal solver -> (H, M) models
    -> score every model against every point (one big matmul-shaped pass)
    -> argmax inliers (MSAC score) -> one non-minimal refit on inliers
    (the LO step of LORANSAC, ref loransac.h "local optimization").

With H = 512-2048 hypotheses this covers the reference's adaptive
iteration counts at >99.99% confidence for its default outlier regimes
while keeping shapes static. Deterministic given the PRNG key (counter
-based, so distributed runs are reproducible — SURVEY.md §7 hard part f).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jax.Array        # best model (model_shape)
    inliers: jax.Array      # (N,) bool
    num_inliers: jax.Array  # ()
    score: jax.Array        # MSAC score (lower better)
    valid: jax.Array        # () bool — found any model with >= min_inliers


def _sample_indices(key, num_hyps, sample_size, n, mask):
    """(H, S) indices uniformly from valid entries (Gumbel top-k trick)."""
    g = jax.random.gumbel(key, (num_hyps, n))
    g = g + jnp.where(mask, 0.0, -1e9)[None, :]
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def ransac(key: jax.Array,
           solver: Callable,
           residual_fn: Callable,
           data: tuple,
           mask: jax.Array,
           sample_size: int,
           threshold: float,
           num_hypotheses: int = 512,
           refit: Callable | None = None,
           min_inliers: int | None = None) -> RansacResult:
    """Generic batched RANSAC.

    solver(*sampled_data) -> (models (M, ...), valid (M,)) for one minimal
      sample (M = max solutions).
    residual_fn(model, *data) -> (N,) squared residuals.
    refit(*data, inlier_mask) -> model — optional LO non-minimal refit.
    data: tuple of (N, ...) arrays; mask: (N,) valid correspondences.
    threshold: on *squared* residual.
    """
    n = data[0].shape[0]
    if min_inliers is None:
        min_inliers = sample_size
    idx = _sample_indices(key, num_hypotheses, sample_size, n, mask)

    def solve_one(sample_idx):
        sampled = tuple(d[sample_idx] for d in data)
        return solver(*sampled)

    models, valids = jax.vmap(solve_one)(idx)       # (H, M, ...), (H, M)
    flat_models = jax.tree.map(
        lambda m: m.reshape((-1,) + m.shape[2:]), models)
    flat_valid = valids.reshape(-1)                 # (H*M,)

    maskf = mask
    thresh = jnp.asarray(threshold, data[0].dtype)

    def score_one(model, valid):
        r = residual_fn(model, *data)               # (N,) squared residuals
        inl = (r < thresh) & maskf
        # MSAC: sum of min(r, threshold) over valid data
        s = jnp.sum(jnp.where(maskf, jnp.minimum(r, thresh), 0.0))
        s = jnp.where(valid, s, jnp.inf)
        return jnp.where(valid, jnp.sum(inl), 0), s

    # score in sequential chunks (lax.map) so the (models x data) residual
    # tensor never materializes whole — keeps HBM/host memory bounded when
    # this whole RANSAC is itself vmapped over many pairs
    total = flat_valid.shape[0]
    chunk = 256
    if total % chunk != 0:
        pad = chunk - total % chunk
        flat_models_p = jax.tree.map(
            lambda m: jnp.concatenate(
                [m, jnp.zeros((pad,) + m.shape[1:], m.dtype)]), flat_models)
        flat_valid_p = jnp.concatenate(
            [flat_valid, jnp.zeros(pad, bool)])
    else:
        flat_models_p, flat_valid_p = flat_models, flat_valid
    nchunks = flat_valid_p.shape[0] // chunk
    chunked_models = jax.tree.map(
        lambda m: m.reshape((nchunks, chunk) + m.shape[1:]), flat_models_p)
    chunked_valid = flat_valid_p.reshape(nchunks, chunk)
    counts_c, scores_c = jax.lax.map(
        lambda mv: jax.vmap(score_one)(mv[0], mv[1]),
        (chunked_models, chunked_valid))
    counts = counts_c.reshape(-1)[:total]
    scores = scores_c.reshape(-1)[:total]
    best = jnp.argmin(scores)
    best_model = jax.tree.map(lambda m: m[best], flat_models)
    r = residual_fn(best_model, *data)
    inliers = (r < thresh) & maskf
    num_inl = jnp.sum(inliers)
    ok = num_inl >= min_inliers

    if refit is not None:
        # LO step: non-minimal refit on the inlier set, keep if better
        re_model = refit(*data, inliers)
        rr = residual_fn(re_model, *data)
        re_inl = (rr < thresh) & maskf
        re_score = jnp.sum(jnp.where(maskf, jnp.minimum(rr, thresh), 0.0))
        better = (re_score <= scores[best]) & (jnp.sum(re_inl) >= num_inl)
        best_model = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), re_model, best_model)
        inliers = jnp.where(better, re_inl, inliers)
        num_inl = jnp.sum(inliers)

    final_r = residual_fn(best_model, *data)
    final_score = jnp.sum(jnp.where(maskf, jnp.minimum(final_r, thresh), 0.0))
    return RansacResult(best_model, inliers, num_inl, final_score, ok)


def num_trials_for_confidence(inlier_ratio: float, sample_size: int,
                              confidence: float = 0.9999) -> int:
    """Classic RANSAC trial count (ref: ransac.h ComputeNumTrials) — used to
    size the static hypothesis budget offline."""
    import math
    p_good = max(inlier_ratio ** sample_size, 1e-12)
    return int(math.ceil(math.log(max(1 - confidence, 1e-12))
                         / math.log(1 - p_good)))
