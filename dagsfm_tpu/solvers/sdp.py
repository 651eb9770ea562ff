"""Block-coordinate SDP solver for rotation-averaging relaxations.

TPU-native counterpart of /root/reference/src/solver/{sdp_solver.h:50,
bcm_sdp_solver.h:45, rbr_sdp_solver.{h,cpp}}: solves

    max  tr(C Y)   s.t.  Y_kk = I_3,  Y ⪰ 0

(the Lagrange-dual / Shor relaxation of multiple rotation averaging,
Eriksson et al. "Rotation Averaging and Strong Duality") by block-row
coordinate maximization: each sweep updates one 3-column block of Y in
closed form via a 3x3 inverse square root. Dense (3n, 3n) matrices — the
per-cluster camera counts this is used for are small; sweeps run under
one jit with lax.fori_loop + dynamic slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _inv_sqrt_psd(S: jax.Array, eps: float = 1e-10) -> jax.Array:
    """S^{-1/2} for a symmetric PSD 3x3 (eigh-based, safe for rank loss)."""
    w, V = jnp.linalg.eigh(S)
    w = jnp.maximum(w, eps)
    return (V / jnp.sqrt(w)[None, :]) @ V.T


@functools.partial(jax.jit, static_argnames=("num_blocks", "sweeps"))
def solve_block_sdp(C: jax.Array, num_blocks: int, sweeps: int = 30):
    """Returns Y maximizing tr(C Y) with identity diagonal blocks.

    C: (3n, 3n) symmetric cost. Convention: we MINIMIZE tr(C Y) if C is
    a Laplacian-like cost — pass the sign accordingly; this solver
    maximizes tr(C Y), matching the reference's formulation with
    C = block matrix of relative rotations.
    """
    n = num_blocks
    Y0 = jnp.eye(3 * n, dtype=C.dtype)

    def update_block(k, Y):
        # B = C[:, 3k:3k+3] with block k zeroed; W = Y with row/col k zeroed
        col = jax.lax.dynamic_slice(C, (0, 3 * k), (3 * n, 3))
        mask = jnp.ones((n,), C.dtype).at[k].set(0.0)
        maskf = jnp.repeat(mask, 3)
        B = col * maskf[:, None]
        Wfull = Y * maskf[:, None] * maskf[None, :]
        WB = Wfull @ B                                   # (3n, 3)
        S = B.T @ WB                                     # (3, 3)
        Sinv = _inv_sqrt_psd(S)
        new_col = WB @ Sinv                              # (3n, 3)
        # if S ~ 0 keep zeros off-diagonal
        scale = jnp.where(jnp.trace(S) > 1e-12, 1.0, 0.0)
        new_col = new_col * scale * maskf[:, None]
        # write column block and its transpose; diagonal block = I
        Y = jax.lax.dynamic_update_slice(Y, new_col, (0, 3 * k))
        Y = jax.lax.dynamic_update_slice(Y, new_col.T, (3 * k, 0))
        Y = jax.lax.dynamic_update_slice(Y, jnp.eye(3, dtype=C.dtype),
                                         (3 * k, 3 * k))
        return Y

    def sweep(_, Y):
        return jax.lax.fori_loop(0, n, update_block, Y)

    Y = jax.lax.fori_loop(0, sweeps, sweep, Y0)
    return Y


def extract_rotations(Y: jax.Array, num_blocks: int) -> jax.Array:
    """Rank-3 factor of Y -> per-block rotations (n, 3, 3), SO(3)-projected.

    Ref: LagrangeDualRotationEstimator solution extraction.
    """
    from dagsfm_tpu.ops.rotations import project_to_rotmat
    n = num_blocks
    w, V = jnp.linalg.eigh(Y)
    # top-3 eigenvectors scaled by sqrt(eigenvalue)
    top = V[:, -3:] * jnp.sqrt(jnp.maximum(w[-3:], 1e-12))[None, :]
    blocks = top.reshape(n, 3, 3)
    # fix gauge: R_i = blocks_i @ blocks_0^{-1} so R_0 = I
    R0 = blocks[0]
    Rs = jnp.einsum("nij,kj->nik", blocks, R0)
    Rs = project_to_rotmat(Rs)
    # resolve reflection: ensure det > 0 handled by projection
    return Rs


def rank3_residual(Y: jax.Array) -> jax.Array:
    """Sum of eigenvalues beyond the top 3 — 0 iff the relaxation is tight
    (ref: ComputeErrorBound's strong-duality certificate role)."""
    w = jnp.linalg.eigvalsh(Y)
    return jnp.sum(jnp.abs(w[:-3]))
