"""Batched multi-view DLT triangulation + two-view midpoint.

TPU-native counterpart of /root/reference/src/base/triangulation.{h,cc} and
estimators/triangulation.h:53. Ragged tracks are handled as fixed-width
padded blocks (track rows padded to MAX_TRACK_LEN with mask), so thousands
of points triangulate in one fused batch — replacing the reference's
per-point host loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import rotations as rops


def _proj_matrices(qvec, tvec):
    """(..., 4) wxyz + (..., 3) -> (..., 3, 4) [R|t]."""
    R = rops.quat_to_rotmat(qvec)
    return jnp.concatenate([R, tvec[..., :, None]], axis=-1)


def triangulate_dlt(qvecs: jax.Array, tvecs: jax.Array, uvs: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Multi-view DLT for ONE track.

    qvecs (K, 4), tvecs (K, 3): world->cam poses.
    uvs (K, 2): *normalized* image coords (undistorted, K^-1 applied).
    mask (K,): which views are valid.
    Returns xyz (3,). Invalid rows are zero-weighted.

    Solves min |A x| with A rows [u*P3 - P1; v*P3 - P2] via eigendecomp of
    AᵀA (4x4 symmetric — cheap, batched, no dynamic shapes).
    """
    P = _proj_matrices(qvecs, tvecs)                      # (K, 3, 4)
    u = uvs[..., 0:1]
    v = uvs[..., 1:2]
    r1 = u * P[..., 2, :] - P[..., 0, :]                  # (K, 4)
    r2 = v * P[..., 2, :] - P[..., 1, :]
    A = jnp.concatenate([r1, r2], axis=0)                 # (2K, 4)
    w = jnp.concatenate([mask, mask], axis=0).astype(A.dtype)
    AtA = (A * w[:, None]).T @ A                          # (4, 4)
    # smallest eigenvector of symmetric 4x4
    evals, evecs = jnp.linalg.eigh(AtA)
    X = evecs[:, 0]
    wcoord = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
    return X[:3] / wcoord


triangulate_dlt_batch = jax.vmap(triangulate_dlt)


def triangulate_two_view(qvec1, tvec1, qvec2, tvec2, uv1, uv2):
    """Batched two-view DLT (..., 2) normalized coords -> (..., 3)."""
    qvecs = jnp.stack([qvec1, qvec2], axis=-2)
    tvecs = jnp.stack([tvec1, tvec2], axis=-2)
    uvs = jnp.stack([uv1, uv2], axis=-2)
    mask = jnp.ones(qvecs.shape[:-1], dtype=bool)
    flat_q = qvecs.reshape(-1, 2, 4)
    flat_t = tvecs.reshape(-1, 2, 3)
    flat_uv = uvs.reshape(-1, 2, 2)
    flat_m = mask.reshape(-1, 2)
    out = triangulate_dlt_batch(flat_q, flat_t, flat_uv, flat_m)
    return out.reshape(qvec1.shape[:-1] + (3,))


def track_blocks_from_obs(obs_image: jax.Array, obs_point: jax.Array,
                          obs_uv: jax.Array, obs_mask: jax.Array,
                          num_points: int, max_track_len: int):
    """Host helper: scatter flat observations into (P, T) padded track blocks.

    Returns (track_img (P,T) int32, track_uv (P,T,2), track_mask (P,T)).
    Runs in numpy on host — it is a data-layout step, not compute.
    """
    import numpy as np
    obs_image = np.asarray(obs_image)
    obs_point = np.asarray(obs_point)
    obs_uv = np.asarray(obs_uv)
    obs_mask = np.asarray(obs_mask)

    track_img = np.zeros((num_points, max_track_len), np.int32)
    track_uv = np.zeros((num_points, max_track_len, 2), obs_uv.dtype)
    track_mask = np.zeros((num_points, max_track_len), bool)
    fill = np.zeros(num_points, np.int32)
    for n in np.nonzero(obs_mask)[0]:
        p = obs_point[n]
        k = fill[p]
        if k < max_track_len:
            track_img[p, k] = obs_image[n]
            track_uv[p, k] = obs_uv[n]
            track_mask[p, k] = True
            fill[p] = k + 1
    return track_img, track_uv, track_mask


def triangulate_tracks(image_qvec, image_tvec, track_img, track_uv,
                       track_mask):
    """Triangulate all padded tracks at once.

    image_qvec (I,4), image_tvec (I,3); track_* (P,T,...) from
    track_blocks_from_obs. Returns (P,3) points.
    """
    q = image_qvec[track_img]          # (P, T, 4)
    t = image_tvec[track_img]          # (P, T, 3)
    return triangulate_dlt_batch(q, t, track_uv, track_mask)
