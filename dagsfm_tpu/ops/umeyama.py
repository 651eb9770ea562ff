"""Sim(3) estimation: closed-form Umeyama alignment + batched/RANSAC forms.

TPU-native counterpart of the reference's FindRTS/Refine_RTS/RansacSimilarity
(/root/reference/src/estimators/rigid_transformation3D_srt.h:67,142 and
estimators/ransac_similarity.h). Convention: y ≈ s * R @ x + t.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def umeyama(x: jax.Array, y: jax.Array, w: jax.Array | None = None,
            with_scale: bool = True):
    """Weighted Umeyama: find (s, R, t) minimizing Σ w_i |y_i - (sRx_i+t)|².

    x, y: (N, 3); w: (N,) nonnegative weights (mask) or None.
    Returns (s, R(3,3), t(3,)). Fully differentiable & vmap-safe.
    """
    if w is None:
        w = jnp.ones(x.shape[0], dtype=x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    wn = w / wsum
    mx = jnp.sum(wn[:, None] * x, axis=0)
    my = jnp.sum(wn[:, None] * y, axis=0)
    xc = x - mx
    yc = y - my
    # covariance: (3, 3)
    S = (yc * wn[:, None]).T @ xc
    U, D, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    sgn = jnp.where(det < 0, -1.0, 1.0)
    diag = jnp.array([1.0, 1.0, 0.0], dtype=x.dtype) + \
        jnp.array([0.0, 0.0, 1.0], dtype=x.dtype) * sgn
    R = (U * diag[None, :]) @ Vt
    var_x = jnp.sum(wn * jnp.sum(xc * xc, axis=-1))
    s = jnp.where(
        with_scale,
        jnp.sum(D * diag) / jnp.maximum(var_x, 1e-12),
        1.0,
    )
    t = my - s * (R @ mx)
    return s, R, t


def umeyama_np(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """NumPy host version (used by host-side merge/eval code)."""
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    S = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(S)
    diag = np.ones(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        diag[2] = -1.0
    R = (U * diag) @ Vt
    var_x = (xc ** 2).sum() / len(x)
    s = float((D * diag).sum() / max(var_x, 1e-12)) if with_scale else 1.0
    t = my - s * R @ mx
    return s, R, t


def transform_points(s, R, t, x):
    return s * x @ jnp.swapaxes(R, -1, -2) + t


def alignment_errors(s, R, t, x, y):
    return jnp.linalg.norm(transform_points(s, R, t, x) - y, axis=-1)


def ransac_umeyama(x: jax.Array, y: jax.Array, mask: jax.Array,
                   key: jax.Array, num_iters: int = 128,
                   threshold: float = 0.1):
    """Batched-hypothesis RANSAC Sim(3) (ref: RansacSimilarity).

    All `num_iters` minimal 3-point hypotheses are evaluated in one batch
    (hypothesize-and-verify as a single vmapped program — no sequential
    trials). Final model refit on the inlier set via weighted Umeyama.

    x, y: (N, 3) padded correspondence sets; mask: (N,) validity.
    Returns (s, R, t, inlier_mask, num_inliers).
    """
    N = x.shape[0]
    # sample only valid indices: sort by (random key, invalid last)
    def sample_one(k):
        # Gumbel-top-3 over valid entries = uniform 3-subset of valid set
        g = jax.random.gumbel(k, (N,)) + jnp.where(mask, 0.0, -1e9)
        idx = jnp.argsort(-g)[:3]
        s, R, t = umeyama(x[idx], y[idx])
        return s, R, t

    keys = jax.random.split(key, num_iters)
    ss, Rs, ts = jax.vmap(sample_one)(keys)

    # score all hypotheses: (num_iters, N) residuals
    def score(s, R, t):
        e = alignment_errors(s, R, t, x, y)
        inl = (e < threshold) & mask
        return jnp.sum(inl)

    scores = jax.vmap(score)(ss, Rs, ts)
    best = jnp.argmax(scores)
    s, R, t = ss[best], Rs[best], ts[best]
    e = alignment_errors(s, R, t, x, y)
    inliers = (e < threshold) & mask
    # refit on inliers (weighted); falls back to best-hypothesis if <3 inliers
    enough = jnp.sum(inliers) >= 3
    s2, R2, t2 = umeyama(x, y, w=inliers.astype(x.dtype))
    s = jnp.where(enough, s2, s)
    R = jnp.where(enough, R2, R)
    t = jnp.where(enough, t2, t)
    e = alignment_errors(s, R, t, x, y)
    inliers = (e < threshold) & mask
    return s, R, t, inliers, jnp.sum(inliers)
