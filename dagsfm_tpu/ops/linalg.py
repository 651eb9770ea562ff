"""Small linear-algebra kernels (batched, jit-friendly).

Counterpart of the reference's /root/reference/src/math/ utilities:
  - gauss_jordan            (math/gauss_jordan.h)
  - rq_decomposition        (math/rq_decomposition.h)
  - matrix_square_root      (math/matrix_square_root.{h,cpp})
  - levenberg_marquardt     (math/lm.h generic LM template)

All functions are pure jax (vmap/scan-compatible); the LM loop is a
fixed-trip-count lax.scan so it compiles once and runs on device.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def gauss_jordan(A: jax.Array, B: jax.Array | None = None):
    """Gauss-Jordan elimination with partial pivoting.

    Returns (A_reduced, X) where X solves A X = B (B defaults to I, so X
    is the inverse).  Implemented as a lax.scan over pivot columns —
    fixed trip count, fully traced (ref math/gauss_jordan.h template).
    """
    n = A.shape[-1]
    if B is None:
        B = jnp.eye(n, dtype=A.dtype)
    M = jnp.concatenate([A, B], axis=-1)

    def step(M, k):
        # partial pivot: swap row k with argmax |M[k:, k]|
        col = jnp.abs(M[:, k])
        col = jnp.where(jnp.arange(n) < k, -jnp.inf, col)
        piv = jnp.argmax(col)
        rk, rp = M[k], M[piv]
        M = M.at[k].set(rp).at[piv].set(rk)
        d = M[k, k]
        d = jnp.where(jnp.abs(d) < 1e-300, 1e-300, d)
        rowk = M[k] / d
        M = M - jnp.outer(M[:, k], rowk)
        M = M.at[k].set(rowk)
        return M, None

    M, _ = jax.lax.scan(step, M, jnp.arange(n))
    return M[:, :n], M[:, n:]


def rq_decomposition(M: jax.Array):
    """RQ decomposition M = R Q with R upper-triangular, Q orthonormal.

    Via QR of the flipped transpose (standard trick); signs normalized so
    diag(R) >= 0 (ref math/rq_decomposition.h — used to split a 3x4
    projection into K[R|t]).
    """
    n = M.shape[-2]
    P = jnp.flip(jnp.eye(n, dtype=M.dtype), axis=0)
    Q1, R1 = jnp.linalg.qr(jnp.swapaxes(P @ M, -2, -1))
    R = P @ jnp.swapaxes(R1, -2, -1) @ P
    Q = P @ jnp.swapaxes(Q1, -2, -1)
    # fix signs: make diagonal of R non-negative
    s = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    s = jnp.where(s == 0, 1.0, s)
    R = R * s[..., None, :]
    Q = Q * s[..., :, None]
    return R, Q


def decompose_projection_matrix(P: jax.Array):
    """Split a 3x4 projection P = K [R | t] (ref base/projection
    DecomposeProjectionMatrix): K normalized so K[2,2] = 1 and positive
    focal lengths; returns (K, R, t)."""
    K, R = rq_decomposition(P[..., :3])
    # enforce positive diagonal of K
    s = jnp.sign(jnp.diagonal(K, axis1=-2, axis2=-1))
    s = jnp.where(s == 0, 1.0, s)
    K = K * s[..., None, :]
    R = R * s[..., :, None]
    # det(R) = +1
    d = jnp.linalg.det(R)
    R = R * d[..., None, None]
    t = jnp.linalg.solve(K, P[..., :, 3:])[..., 0] * d[..., None]
    K = K / K[..., 2:3, 2:3]
    return K, R, t


def matrix_square_root(A: jax.Array, num_iters: int = 20) -> jax.Array:
    """Principal square root of an SPD matrix.

    Denman–Beavers iteration under lax.scan (ref math/matrix_square_root
    uses eigen decomposition; DB iteration is branch-free and batches).
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    # normalize for convergence
    nrm = jnp.linalg.norm(A, axis=(-2, -1), keepdims=True)
    nrm = jnp.where(nrm < 1e-30, 1.0, nrm)
    Y0 = A / nrm

    def step(carry, _):
        Y, Z = carry
        Yi = jnp.linalg.inv(Y)
        Zi = jnp.linalg.inv(Z)
        return (0.5 * (Y + Zi), 0.5 * (Z + Yi)), None

    (Y, Z), _ = jax.lax.scan(step, (Y0, jnp.broadcast_to(eye, A.shape)),
                             None, length=num_iters)
    return Y * jnp.sqrt(nrm)


class LMResult(NamedTuple):
    x: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array
    lam: jax.Array


@functools.partial(jax.jit, static_argnames=("residual_fn", "max_iterations"))
def levenberg_marquardt(residual_fn: Callable, x0: jax.Array,
                        max_iterations: int = 50,
                        init_lambda: float = 1e-3) -> LMResult:
    """Generic dense LM over a flat parameter vector.

    residual_fn: x -> (M,) residuals.  Jacobian by jacfwd; normal
    equations solved densely; accept/reject with adaptive lambda in one
    lax.scan (ref math/lm.h LMSolver template).  Suitable for small
    refinement problems (pose polish, Sim(3) fitting); big sparse
    problems use sfm/bundle_adjustment.py.
    """
    def cost(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def step(carry, _):
        x, lam, c = carry
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = J.T @ J
        g = J.T @ r
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12))
        dx = -jnp.linalg.solve(Hd + 1e-12 * eye, g)
        x_new = x + dx
        c_new = cost(x_new)
        accept = c_new < c
        x = jnp.where(accept, x_new, x)
        c = jnp.where(accept, c_new, c)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                        jnp.minimum(lam * 4.0, 1e8))
        return (x, lam, c), c

    c0 = cost(x0)
    (x, lam, c), _ = jax.lax.scan(
        step, (x0, jnp.asarray(init_lambda, x0.dtype), c0), None,
        length=max_iterations)
    return LMResult(x, c0, c, lam)
