"""Batched rotation algebra: quaternions, angle-axis, rotation matrices.

TPU-native counterpart of the reference's rotation utilities
(/root/reference/src/math/rotation.{h,cpp} and src/base/pose.{h,cc}).
Everything is written to be `vmap`/`jit` friendly: no data-dependent
branching, safe small-angle limits via Taylor expansions selected with
`jnp.where` on numerically-safe operands.

Conventions (COLMAP-compatible):
  * quaternions are (w, x, y, z), normalized, representing R such that
    x_cam = R @ x_world + t.
  * angle-axis vectors are w = theta * n with |n| = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) along the last axis; zero quat -> identity."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.where(n < _EPS, 1.0, n)
    q = q / safe
    ident = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(n < _EPS, ident, q)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) wxyz.

    Branch-free Shepperd's method: computes all four candidate quaternions
    and selects the numerically best with `where` (vmap-safe, unlike the
    classic trace-sign branching).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 (>=0).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 0.0))

    # Each candidate row is (4*q_best*q_w, 4*q_best*q_x, ...) — i.e. the
    # quaternion scaled by 4*q_best; dividing by 4*q_best = 2*sqrt(q_best^2)
    # recovers q. Picking the largest q_best^2 keeps the division stable.
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    cands = jnp.stack([cw, cx, cy, cz], axis=-2)          # (..., 4, 4)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)        # (..., 4)
    scales = 2.0 * _safe_sqrt(mags)                        # 4*q_best each
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    s = jnp.take_along_axis(scales, best[..., None], axis=-1)
    q = q / jnp.maximum(s, _EPS)
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 * q2 (wxyz), broadcastable."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    q = quat_normalize(q)
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def angleaxis_to_rotmat(aa: jax.Array) -> jax.Array:
    """Angle-axis (..., 3) -> rotation matrix (..., 3, 3), Rodrigues.

    Small-angle safe: uses 2nd-order Taylor for sin(t)/t and (1-cos t)/t^2.
    """
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))

    wx, wy, wz = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack(
        [zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + s[..., None, None] * K + c[..., None, None] * (K @ K)


def rotmat_to_angleaxis(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> angle-axis (..., 3)."""
    return quat_to_angleaxis(rotmat_to_quat(R))


def quat_to_angleaxis(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0, -q, q)  # w >= 0 => theta in [0, pi]
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    small = sin_half < 1e-8
    scale = jnp.where(small, 2.0, theta / jnp.maximum(sin_half, _EPS))
    return q[..., 1:] * scale[..., None]


def angleaxis_to_quat(aa: jax.Array) -> jax.Array:
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    half = theta * 0.5
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    s = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([w[..., None], aa * s[..., None]], axis=-1)


def angleaxis_rotate(aa: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) by angle-axis via Rodrigues formula (no matrix)."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    axis = aa / jnp.where(small, 1.0, theta)
    cos_t = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 2.0, jnp.cos(theta[..., 0]))[..., None]
    sin_t = jnp.where(small[..., 0], theta[..., 0] - theta2[..., 0] * theta[..., 0] / 6.0,
                      jnp.sin(theta[..., 0]))[..., None]
    # For tiny angles axis is garbage; fall back to v + aa x v.
    rot = v * cos_t + jnp.cross(axis, v) * sin_t + \
        axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1.0 - cos_t)
    return jnp.where(small, v + jnp.cross(aa, v), rot)


def rotation_angle_deg(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Geodesic angle in degrees between rotation matrices (broadcastable)."""
    Rrel = jnp.matmul(jnp.swapaxes(R1, -1, -2), R2)
    tr = jnp.trace(Rrel, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def relative_rotation(R_i: jax.Array, R_j: jax.Array) -> jax.Array:
    """R_ij such that R_j = R_ij @ R_i (COLMAP world->cam convention)."""
    return jnp.matmul(R_j, jnp.swapaxes(R_i, -1, -2))


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix [v]_x for (..., 3) vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero],
                     axis=-1).reshape(v.shape[:-1] + (3, 3))


def project_to_rotmat(M: jax.Array) -> jax.Array:
    """Closest rotation matrix to M (..., 3, 3) via SVD with det fix."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), dtype=M.dtype)
    D = D.at[..., 2].set(jnp.sign(det))
    return (U * D[..., None, :]) @ Vt


def compose_pose(R1, t1, R2, t2):
    """Compose world->cam poses: apply (R1,t1) then (R2,t2)."""
    return R2 @ R1, (R2 @ t1[..., None])[..., 0] + t2


def invert_pose(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def camera_center(R, t):
    """Projection center C = -R^T t for world->cam pose."""
    return -(jnp.swapaxes(R, -1, -2) @ t[..., None])[..., 0]


# ---------------------------------------------------------------------------
# NumPy twins for host-side bookkeeping (graph-shaped code paths that would
# pay dispatch overhead calling into jax per element).
# ---------------------------------------------------------------------------

def quat_to_rotmat_np(q):
    """Vectorized numpy wxyz quaternion(s) -> rotation matrices."""
    import numpy as np
    q = np.asarray(q, np.float64)
    n = np.linalg.norm(q, axis=-1, keepdims=True)
    q = q / np.where(n < 1e-12, 1.0, n)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = np.stack([
        ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat_np(R):
    """Vectorized numpy rotation matrix(es) -> wxyz quaternion(s)
    (Shepperd's method, stable for all traces)."""
    import numpy as np
    R = np.asarray(R, np.float64)
    single = R.ndim == 2
    Rb = R.reshape(-1, 3, 3)
    out = np.empty((len(Rb), 4))
    for k, m in enumerate(Rb):
        t = np.trace(m)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                          (m[0, 2] - m[2, 0]) / s,
                          (m[1, 0] - m[0, 1]) / s])
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
            q = np.array([(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                          (m[0, 1] + m[1, 0]) / s,
                          (m[0, 2] + m[2, 0]) / s])
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
            q = np.array([(m[0, 2] - m[2, 0]) / s,
                          (m[0, 1] + m[1, 0]) / s, 0.25 * s,
                          (m[1, 2] + m[2, 1]) / s])
        else:
            s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
            q = np.array([(m[1, 0] - m[0, 1]) / s,
                          (m[0, 2] + m[2, 0]) / s,
                          (m[1, 2] + m[2, 1]) / s, 0.25 * s])
        out[k] = q if q[0] >= 0 else -q
    out /= np.linalg.norm(out, axis=-1, keepdims=True)
    return out[0] if single else out.reshape(R.shape[:-2] + (4,))
