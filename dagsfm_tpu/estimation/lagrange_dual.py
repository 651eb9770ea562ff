"""Lagrange-dual (SDP) rotation averaging + nonlinear refinement.

TPU-native counterpart of /root/reference/src/rotation_estimation/
lagrange_dual_rotation_estimator.{h,cpp} (:73-130, Eriksson et al. SDP
relaxation solved by BCM/RBR block solvers) and
nonlinear_rotation_estimator.{h,cpp} (Ceres LS over pairwise rotation
errors). Together with rotation_averaging.py (ROBUST_L1L2) this covers
the reference's RotationEstimatorType enum.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dagsfm_tpu.solvers import sdp
from dagsfm_tpu.estimation import rotation_averaging as ra


def estimate_rotations_lagrange_dual(num_images: int, edges: np.ndarray,
                                     rel_rot: np.ndarray,
                                     sweeps: int = 50):
    """Global rotations via the SDP relaxation.

    Builds the (3n, 3n) block cost C with C_ij = R_ijᵀ (so tr(C Y)
    rewards Y_ij ≈ R_ij blocks), solves with the block-coordinate SDP,
    extracts rank-3 rotations. Returns ((I, 3, 3) rotations,
    rank3_residual certificate).
    """
    n = num_images
    C = np.zeros((3 * n, 3 * n))
    for (e, (i, j)) in enumerate(edges):
        i, j = int(i), int(j)
        # convention: R_j = R_ij R_i -> Y_ij = R_i R_jᵀ ≈ R_ijᵀ ... block
        # (i, j) of Y is R_i R_jᵀ; reward alignment with R_ijᵀ
        C[3 * i:3 * i + 3, 3 * j:3 * j + 3] += rel_rot[e].T
        C[3 * j:3 * j + 3, 3 * i:3 * i + 3] += rel_rot[e]
    Y = sdp.solve_block_sdp(jnp.asarray(C), n, sweeps=sweeps)
    Rs = np.asarray(sdp.extract_rotations(Y, n))
    cert = float(sdp.rank3_residual(Y))
    # re-anchor gauge at camera 0
    Rs = np.einsum("nij,kj->nik", Rs, Rs[0])
    return Rs, cert


def estimate_rotations_nonlinear(num_images: int, edges: np.ndarray,
                                 rel_rot: np.ndarray,
                                 init: np.ndarray | None = None,
                                 iterations: int = 50):
    """Plain least-squares refinement over relative-rotation residuals
    (ref NonlinearRotationEstimator's Ceres problem), as the IRLS loop
    with an (effectively) quadratic kernel.
    """
    opts = ra.RAOptions(l1_iterations=0, irls_iterations=iterations,
                        sigma_deg=1e6)   # huge sigma -> unit weights
    if init is None:
        R0 = ra.spanning_tree_init(num_images, edges, rel_rot)
    else:
        R0 = init
    R = ra._solve_ra(jnp.asarray(R0), jnp.asarray(edges, jnp.int32),
                     jnp.asarray(rel_rot), opts, num_images)
    R = np.asarray(R)
    return np.einsum("nij,kj->nik", R, R[0])
