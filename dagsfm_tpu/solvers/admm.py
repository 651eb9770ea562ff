"""ADMM solvers: L1 regression, constrained L1, box QP — jitted fixed-point
iterations.

TPU-native counterpart of /root/reference/src/solver/{admm.h:84,
l1_solver.h:119-210, constrained_l1_solver.{h,cpp}, qp_solver.{h,cpp}}.
The reference prefactors normal equations with CHOLMOD; here the solve is
either a dense Cholesky (prefactored once per problem, batched-friendly)
or matrix-free CG for large sparse systems. All loops are fixed-trip
`lax.scan` (jit-stable); convergence is reported, not branched on.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ADMMOptions(NamedTuple):
    rho: float = 1.0
    alpha: float = 1.0          # over-relaxation (ref l1_solver alpha)
    max_iterations: int = 100


def _shrink(x, kappa):
    """Soft-thresholding prox of the L1 norm."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - kappa, 0.0)


@functools.partial(jax.jit, static_argnames=("opts",))
def l1_regression(A: jax.Array, b: jax.Array,
                  opts: ADMMOptions = ADMMOptions()):
    """min_x ||A x - b||_1 via ADMM (ref: L1Solver::Solve).

    A (M, N) dense, b (M,). Returns (x, primal_residual, dual_residual).
    """
    M, N = A.shape
    AtA = A.T @ A + 1e-12 * jnp.eye(N, dtype=A.dtype)
    L, low = jax.scipy.linalg.cho_factor(AtA)

    def body(carry, _):
        x, z, u = carry
        # x-update: argmin ||Ax - (b + z - u)||^2
        x = jax.scipy.linalg.cho_solve((L, low), A.T @ (b + z - u))
        Ax = A @ x
        Ax_hat = opts.alpha * Ax + (1 - opts.alpha) * (z + b)
        z = _shrink(Ax_hat - b + u, 1.0 / opts.rho)
        u = u + Ax_hat - z - b
        return (x, z, u), None

    x0 = jnp.zeros(N, A.dtype)
    z0 = jnp.zeros(M, A.dtype)
    u0 = jnp.zeros(M, A.dtype)
    (x, z, u), _ = jax.lax.scan(body, (x0, z0, u0), None,
                                length=opts.max_iterations)
    primal = jnp.linalg.norm(A @ x - b - z)
    dual = jnp.linalg.norm(opts.rho * A.T @ (z - (A @ x - b)))
    return x, primal, dual


@functools.partial(jax.jit, static_argnames=("opts",))
def constrained_l1(A: jax.Array, b: jax.Array, C: jax.Array, d: jax.Array,
                   opts: ADMMOptions = ADMMOptions()):
    """min ||A x - b||_1  s.t.  C x >= d  (ref ConstrainedL1Solver).

    Handled by stacking an inequality block with an indicator prox
    (projection onto the nonnegative orthant of C x - d).
    """
    M, N = A.shape
    K = C.shape[0]
    G = jnp.concatenate([A, C], axis=0)              # (M+K, N)
    h = jnp.concatenate([b, d], axis=0)
    GtG = G.T @ G + 1e-12 * jnp.eye(N, dtype=A.dtype)
    L, low = jax.scipy.linalg.cho_factor(GtG)

    def prox(v):
        # first M entries: soft-threshold (L1); last K: project >= 0
        z1 = _shrink(v[:M], 1.0 / opts.rho)
        z2 = jnp.maximum(v[M:], 0.0)
        return jnp.concatenate([z1, z2])

    def body(carry, _):
        x, z, u = carry
        x = jax.scipy.linalg.cho_solve((L, low), G.T @ (h + z - u))
        Gx = G @ x
        z = prox(Gx - h + u)
        u = u + Gx - h - z
        return (x, z, u), None

    x0 = jnp.zeros(N, A.dtype)
    z0 = jnp.zeros(M + K, A.dtype)
    (x, z, u), _ = jax.lax.scan(body, (x0, z0, z0 * 0), None,
                                length=opts.max_iterations)
    return x


@functools.partial(jax.jit, static_argnames=("opts",))
def box_qp(P: jax.Array, q: jax.Array, lb: jax.Array, ub: jax.Array,
           opts: ADMMOptions = ADMMOptions()):
    """min 1/2 xᵀPx + qᵀx  s.t. lb <= x <= ub (ref QPSolver).

    ADMM with box-projection prox.
    """
    N = P.shape[0]
    M = P + opts.rho * jnp.eye(N, dtype=P.dtype)
    L, low = jax.scipy.linalg.cho_factor(M)

    def body(carry, _):
        x, z, u = carry
        x = jax.scipy.linalg.cho_solve((L, low), opts.rho * (z - u) - q)
        z = jnp.clip(x + u, lb, ub)
        u = u + x - z
        return (x, z, u), None

    z0 = jnp.clip(jnp.zeros(N, P.dtype), lb, ub)
    (x, z, u), _ = jax.lax.scan(body, (z0, z0, jnp.zeros(N, P.dtype)),
                                None, length=opts.max_iterations)
    return z
