"""Generalized (multi-camera / non-central) pose solvers.

Counterpart of /root/reference/src/estimators/generalized_absolute_pose.
{h,cc} (GP3P, Lee et al. Gröbner solver) and generalized_relative_pose.
{h,cc} (GR6P, Stewénius): pose of a camera RIG from rays that do not share
a center.

TPU-first redesign: instead of the reference's small Gröbner eliminations
(deep scalar polynomial chains that map poorly to the VPU and have wildly
branchy root selection), both problems are solved by *linear* lifts that
are one SVD per hypothesis — batched over RANSAC hypotheses with vmap:

  - Absolute: gPnP DLT. Each 3D point X with ray (o, d) in the rig frame
    gives cross(d, R X + t - o) = 0 — 3 linear equations (rank 2) in the
    12 entries of [R|t]. n >= 6 points determine the lift; R is projected
    to SO(3) by SVD and (R, t) polished by a few fixed Gauss-Newton steps
    on the ray-distance residual. RANSAC uses sample_size=6 (vs GP3P's 3:
    a few more hypotheses needed, but each is ~one 18x12 SVD on the MXU
    instead of an 8th-degree real-root hunt).
  - Relative: the 17-point linear generalized-epipolar solver (Li &
    Hartley): rays (q, q') with centers (c, c') satisfy
    q'ᵀ E q + q'ᵀ R (c × q) − (c' × q')ᵀ R q = 0, linear in (E, R);
    R is recovered from its block by SO(3) projection and t from E Rᵀ.

Residual helpers mirror the reference's usage in RANSAC scoring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _project_so3(M: jax.Array) -> jax.Array:
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], M.dtype)).at[2, 2].set(d)
    return U @ D @ Vt


def gpnp(points: jax.Array, ray_origins: jax.Array, ray_dirs: jax.Array,
         refine_iters: int = 10):
    """Generalized PnP: rig pose from n>=6 point<->ray correspondences.

    points (N, 3) world; ray_origins/ray_dirs (N, 3) in the RIG frame
    (dirs need not be unit). Returns ((R, t), valid) with
    x_rig = R @ x_world + t, shaped for ops.ransac (models (1, 3, 4)).
    """
    d = ray_dirs / jnp.maximum(
        jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True), 1e-12)
    n = points.shape[0]

    # cross(d, R X + t - o) = 0 -> [d]x (R X + t) = [d]x o
    def skew(v):
        z = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1)], -2)

    S = skew(d)                                     # (N, 3, 3)
    # unknown m = [r11..r13, r21..r23, r31..r33, t1..t3]
    X = points
    A_rot = jnp.einsum("nab,nc->nabc", S, X).reshape(n, 3, 9)
    A = jnp.concatenate([A_rot, S], axis=-1).reshape(3 * n, 12)
    b = jnp.einsum("nab,nb->na", S, ray_origins).reshape(3 * n)
    # least squares (A m = b); lstsq via normal equations + solve is fine
    # here (12x12), keeps it vmappable
    AtA = A.T @ A + 1e-12 * jnp.eye(12, dtype=A.dtype)
    Atb = A.T @ b
    m = jnp.linalg.solve(AtA, Atb)
    R_raw = m[:9].reshape(3, 3)
    # normalize scale before SO(3) projection
    s = jnp.cbrt(jnp.maximum(jnp.abs(jnp.linalg.det(R_raw)), 1e-12))
    R = _project_so3(R_raw / s)
    t = m[9:] / s

    # fixed-iteration GN polish on ray-distance residuals
    def residual(params):
        w, tt = params[:3], params[3:]
        Rp = _rodrigues(w) @ R
        P = points @ Rp.T + tt
        e = jnp.cross(d, P - ray_origins)
        return e.reshape(-1)

    def _rodrigues(w):
        # safe norm: sqrt(|w|^2 + eps) keeps the jacfwd finite at w = 0
        th = jnp.sqrt(jnp.sum(w * w) + 1e-24)
        k = w / th
        K = skew(k[None])[0]
        return (jnp.eye(3, dtype=w.dtype) + jnp.sin(th) * K
                + (1 - jnp.cos(th)) * (K @ K))

    params = jnp.concatenate([jnp.zeros(3, points.dtype), t])

    def gn_body(params, _):
        J = jax.jacfwd(residual)(params)
        r = residual(params)
        H = J.T @ J + 1e-9 * jnp.eye(6, dtype=J.dtype)
        step = jnp.linalg.solve(H, J.T @ r)
        return params - step, None

    params, _ = jax.lax.scan(gn_body, params, None, length=refine_iters)
    R = _rodrigues(params[:3]) @ R
    t = params[3:]

    # cheirality: most points in front along their rays
    depth = jnp.einsum("nc,nc->n", points @ R.T + t - ray_origins, d)
    valid = (jnp.mean((depth > 0).astype(points.dtype)) > 0.5) & \
        jnp.all(jnp.isfinite(t))
    M = jnp.concatenate([R, t[:, None]], axis=1)
    return M[None], valid[None]


def gpnp_ray_residual(M: jax.Array, points: jax.Array,
                      ray_origins: jax.Array,
                      ray_dirs: jax.Array) -> jax.Array:
    """Squared perpendicular point-to-ray distance (RANSAC residual)."""
    R, t = M[:, :3], M[:, 3]
    d = ray_dirs / jnp.maximum(
        jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True), 1e-12)
    P = points @ R.T + t - ray_origins
    e = jnp.cross(d, P)
    return jnp.sum(e * e, axis=-1)


def generalized_relative_pose_17pt(q1: jax.Array, c1: jax.Array,
                                   q2: jax.Array, c2: jax.Array):
    """Linear 17-point generalized relative pose (Li & Hartley 2008).

    Rays i: direction q1 from center c1 in rig-1 frame, q2/c2 in rig-2.
    Solves the generalized epipolar constraint for (E, R) with
    x_2 = R x_1 + t. Returns ((R, t) as (1, 3, 4), valid (1,)).
    """
    d1 = q1 / jnp.maximum(jnp.linalg.norm(q1, -1, keepdims=True), 1e-12)
    d2 = q2 / jnp.maximum(jnp.linalg.norm(q2, -1, keepdims=True), 1e-12)
    m1 = jnp.cross(c1, d1)       # Plücker moments
    m2 = jnp.cross(c2, d2)
    # GEC: d2ᵀ E d1 + d2ᵀ R m1 + m2ᵀ R d1 = 0, unknowns (E, R) (18)
    A_E = jnp.einsum("ni,nj->nij", d2, d1).reshape(-1, 9)
    A_R = (jnp.einsum("ni,nj->nij", d2, m1)
           + jnp.einsum("ni,nj->nij", m2, d1)).reshape(-1, 9)
    A = jnp.concatenate([A_E, A_R], axis=-1)      # (N, 18)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    v = Vt[-1]
    E = v[:9].reshape(3, 3)
    R_raw = v[9:].reshape(3, 3)
    s = jnp.cbrt(jnp.maximum(jnp.abs(jnp.linalg.det(R_raw)), 1e-18))
    sign = jnp.sign(jnp.linalg.det(R_raw))
    R = _project_so3(R_raw / s * sign)
    E = E / s * sign
    # E = [t]x R -> [t]x = E Rᵀ; extract t from the skew part
    T = E @ R.T
    Ts = 0.5 * (T - T.T)
    t = jnp.stack([Ts[2, 1], Ts[0, 2], Ts[1, 0]])
    valid = jnp.all(jnp.isfinite(t)) & (jnp.linalg.norm(v[9:]) > 1e-12)
    M = jnp.concatenate([R, t[:, None]], axis=1)
    return M[None], valid[None]


def gec_residual(M: jax.Array, q1, c1, q2, c2) -> jax.Array:
    """Squared generalized-epipolar-constraint violation per ray pair."""
    R, t = M[:, :3], M[:, 3]
    d1 = q1 / jnp.maximum(jnp.linalg.norm(q1, -1, keepdims=True), 1e-12)
    d2 = q2 / jnp.maximum(jnp.linalg.norm(q2, -1, keepdims=True), 1e-12)
    m1 = jnp.cross(c1, d1)
    m2 = jnp.cross(c2, d2)
    z = jnp.zeros_like(t[0])
    tx = jnp.stack([jnp.stack([z, -t[2], t[1]]),
                    jnp.stack([t[2], z, -t[0]]),
                    jnp.stack([-t[1], t[0], z])])
    E = tx @ R
    r = (jnp.einsum("ni,ij,nj->n", d2, E, d1)
         + jnp.einsum("ni,ij,nj->n", d2, R, m1)
         + jnp.einsum("ni,ij,nj->n", m2, R, d1))
    return r * r
