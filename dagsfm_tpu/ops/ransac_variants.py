"""Theia-derived robust-estimation stack: PROSAC, LMedS, EVSAC-style
weighted sampling, exhaustive sampling, and the SPRT model test.

TPU-native counterpart of /root/reference/src/ransac/ (prosac.h, evsac.h,
lmed.h, exhaustive_ransac.h, the sampler/quality-measurement interfaces)
and /root/reference/src/optim/sprt.h:45. The reference runs these as
sequential samplers with data-dependent stopping; here every variant is a
*sampling distribution* + *scoring rule* plugged into the same fixed-budget
batched hypothesize-and-verify as ops/ransac.py, so the whole thing stays
one fused device program:

  - PROSAC: hypothesis t samples from the quality-sorted top-n(t) prefix,
    n(t) from the Chum-Matas growth schedule (computed host-side, static).
  - EVSAC: per-correspondence sampling weights from the matching-score
    distribution (posterior inlier probability), used as a weighted Gumbel
    sampler instead of EVSAC's MLE gamma/GEV fit over sequential trials.
  - LMedS: scoring by median squared residual (no threshold), inliers
    recovered from the robust scale estimate (ref lmed_quality_measurement.h).
  - Exhaustive: enumerate all C(N, m) minimal sets (ref
    exhaustive_sampler.h — only sample_size 2 supported there; we allow 2-3).
  - SPRT: Wald sequential probability-ratio model test; batched form
    evaluates the full likelihood ratio per model (the decision, not the
    early exit, is the semantic content on TPU).
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .ransac import RansacResult


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def prosac_prefix_sizes(n: int, sample_size: int,
                        num_hypotheses: int) -> np.ndarray:
    """Growth schedule n(t) (Chum & Matas 2005, eq. 3): hypothesis t draws
    from the top-n(t) quality-sorted correspondences. Host-side, static."""
    m = sample_size
    # T'_n: expected number of samples containing only top-n points
    t_n = float(num_hypotheses)
    for i in range(m):
        t_n *= (m - i) / (n - i)
    sizes = np.empty(num_hypotheses, np.int64)
    n_cur = m
    t_prime = 1.0
    for t in range(num_hypotheses):
        if t + 1 > t_prime and n_cur < n:
            t_next = t_n * (n_cur + 1) / (n_cur + 1 - m)
            t_prime += t_next - t_n
            t_n = t_next
            n_cur += 1
        sizes[t] = n_cur
    return sizes


def prosac_sample_indices(key, num_hyps: int, sample_size: int, n: int,
                          mask, quality) -> jax.Array:
    """(H, S) indices: quality-sorted progressive sampling. `quality` (N,)
    higher = better (e.g. matching ratio-test score)."""
    order = jnp.argsort(-jnp.where(mask, quality, -jnp.inf))  # best first
    sizes = jnp.asarray(prosac_prefix_sizes(n, sample_size, num_hyps))
    g = jax.random.gumbel(key, (num_hyps, n))
    rank = jnp.arange(n)[None, :]
    g = jnp.where(rank < sizes[:, None], g, -jnp.inf)  # restrict to prefix
    _, pos = jax.lax.top_k(g, sample_size)             # positions in order
    return order[pos]


def weighted_sample_indices(key, num_hyps: int, sample_size: int, n: int,
                            mask, weights) -> jax.Array:
    """EVSAC-style sampler: per-point probabilities ∝ weights (posterior
    inlier likelihood from match scores). Weighted sampling w/o replacement
    via Gumbel top-k on log-weights."""
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    g = jax.random.gumbel(key, (num_hyps, n)) + logw[None, :]
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def evsac_weights(match_distances: np.ndarray, k_smallest: int = 2) -> \
        np.ndarray:
    """Posterior inlier weights from descriptor match distances.

    Ref src/ransac/evsac.h fits a gamma (correct) + GEV (incorrect) mixture
    to k-smallest-distance columns by MLE; this computes the same posterior
    with a moment-fit two-component model on the 1st/2nd nearest distances:
    P(inlier | d) ∝ pdf_good(d) / (pdf_good(d) + pdf_bad(d))."""
    d = np.asarray(match_distances, np.float64)
    d1 = d[:, 0]
    dk = d[:, min(k_smallest, d.shape[1]) - 1]
    # moment-fit normals to the "good" (nearest) and "bad" (k-th) columns
    mu_g, sd_g = d1.mean(), max(d1.std(), 1e-9)
    mu_b, sd_b = dk.mean(), max(dk.std(), 1e-9)
    pg = np.exp(-0.5 * ((d1 - mu_g) / sd_g) ** 2) / sd_g
    pb = np.exp(-0.5 * ((d1 - mu_b) / sd_b) ** 2) / sd_b
    w = pg / np.maximum(pg + pb, 1e-12)
    return np.maximum(w, 1e-6)


def exhaustive_sample_indices(n: int, sample_size: int) -> np.ndarray:
    """All C(n, sample_size) minimal sets (ref exhaustive_sampler.h)."""
    combos = np.asarray(list(itertools.combinations(range(n), sample_size)),
                        np.int32)
    return combos


# ---------------------------------------------------------------------------
# SPRT (ref optim/sprt.h:45)
# ---------------------------------------------------------------------------

class SPRTOptions(NamedTuple):
    delta: float = 0.01      # P(inlier | bad model)
    epsilon: float = 0.1     # P(inlier | good model) lower bound
    eval_time_ratio: float = 200.0   # t_M: model eval / point eval cost
    num_models_per_sample: float = 1.0


def sprt_decision_threshold(opts: SPRTOptions) -> float:
    """Wald decision threshold A (sprt.h ComputeDecisionThreshold)."""
    c = ((1 - opts.delta) *
         math.log((1 - opts.delta) / (1 - opts.epsilon))
         + opts.delta * math.log(opts.delta / opts.epsilon))
    a0 = (opts.eval_time_ratio * c / opts.num_models_per_sample) + 1.0
    a = a0
    for _ in range(10):
        a = a0 + math.log(a)
    return a


def sprt_test(residuals_sq: jax.Array, mask: jax.Array, threshold: float,
              opts: SPRTOptions = SPRTOptions()) -> tuple:
    """Batched SPRT: likelihood ratio of the full residual set.

    Returns (accept (bool), log_lambda). A model is rejected when the
    cumulative likelihood ratio exceeds A; on TPU we compute the total
    log-ratio in one masked reduction (same decision as the sequential
    walk when the walk completes; the sequential early-exit is a CPU
    latency optimization with no statistical content at the end point)."""
    inl = (residuals_sq < threshold) & mask
    log_in = math.log(opts.delta / opts.epsilon)
    log_out = math.log((1 - opts.delta) / (1 - opts.epsilon))
    log_lambda = (jnp.sum(jnp.where(inl, log_in, 0.0))
                  + jnp.sum(jnp.where(mask & ~inl, log_out, 0.0)))
    a = math.log(sprt_decision_threshold(opts))
    return log_lambda < a, log_lambda


# ---------------------------------------------------------------------------
# Scoring-rule RANSAC wrapper
# ---------------------------------------------------------------------------

def robust_estimate(key: jax.Array,
                    solver: Callable,
                    residual_fn: Callable,
                    data: tuple,
                    mask: jax.Array,
                    sample_size: int,
                    threshold: float = 0.0,
                    num_hypotheses: int = 512,
                    sampler: str = "uniform",
                    scoring: str = "msac",
                    quality: jax.Array | None = None,
                    refit: Callable | None = None,
                    min_inliers: int | None = None) -> RansacResult:
    """Batched robust estimation with pluggable sampler/scoring.

    sampler: "uniform" | "prosac" | "weighted" | "exhaustive"
      (prosac/weighted need `quality`: higher = better / sampling weight).
    scoring: "msac" (needs threshold on squared residual) | "lmeds"
      (threshold-free; inliers from 2.5 * robust sigma of best model).
    """
    n = data[0].shape[0]
    if min_inliers is None:
        min_inliers = sample_size

    if sampler == "uniform":
        from .ransac import _sample_indices
        idx = _sample_indices(key, num_hypotheses, sample_size, n, mask)
    elif sampler == "prosac":
        idx = prosac_sample_indices(key, num_hypotheses, sample_size, n,
                                    mask, quality)
    elif sampler == "weighted":
        idx = weighted_sample_indices(key, num_hypotheses, sample_size, n,
                                      mask, quality)
    elif sampler == "exhaustive":
        idx = jnp.asarray(exhaustive_sample_indices(n, sample_size))
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    def solve_one(sample_idx):
        sampled = tuple(d[sample_idx] for d in data)
        return solver(*sampled)

    models, valids = jax.vmap(solve_one)(idx)
    flat_models = jax.tree.map(
        lambda m: m.reshape((-1,) + m.shape[2:]), models)
    flat_valid = valids.reshape(-1)
    thresh = jnp.asarray(threshold, data[0].dtype)
    nvalid = jnp.maximum(jnp.sum(mask), 1)

    def score_one(model, valid):
        r = residual_fn(model, *data)
        if scoring == "lmeds":
            # median of squared residuals over valid points: sort with
            # invalid pushed to +inf, take the nvalid/2-th entry
            rs = jnp.sort(jnp.where(mask, r, jnp.inf))
            med = rs[(nvalid - 1) // 2]
            return jnp.where(valid, med, jnp.inf)
        s = jnp.sum(jnp.where(mask, jnp.minimum(r, thresh), 0.0))
        return jnp.where(valid, s, jnp.inf)

    scores = jax.vmap(score_one)(flat_models, flat_valid)

    best = jnp.argmin(scores)
    best_model = jax.tree.map(lambda m: m[best], flat_models)
    r = residual_fn(best_model, *data)

    if scoring == "lmeds":
        # robust scale: 1.4826 * (1 + 5/(n-m)) * sqrt(med) (ref lmed.h)
        rs = jnp.sort(jnp.where(mask, r, jnp.inf))
        med = rs[(nvalid - 1) // 2]
        sigma = 1.4826 * (1.0 + 5.0 / jnp.maximum(nvalid - sample_size, 1)) \
            * jnp.sqrt(jnp.maximum(med, 0.0))
        eff_thresh = (2.5 * sigma) ** 2
    else:
        eff_thresh = thresh

    inliers = (r < eff_thresh) & mask
    num_inl = jnp.sum(inliers)
    ok = num_inl >= min_inliers

    if refit is not None:
        re_model = refit(*data, inliers)
        rr = residual_fn(re_model, *data)
        re_inl = (rr < eff_thresh) & mask
        better = jnp.sum(re_inl) >= num_inl
        best_model = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), re_model, best_model)
        inliers = jnp.where(better, re_inl, inliers)
        num_inl = jnp.sum(inliers)

    final_r = residual_fn(best_model, *data)
    final_score = jnp.sum(
        jnp.where(mask, jnp.minimum(final_r, eff_thresh), 0.0))
    return RansacResult(best_model, inliers, num_inl, final_score, ok)
