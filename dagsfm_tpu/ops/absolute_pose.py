"""Absolute pose solvers: P3P (Grunert) and EPnP, batched & vmap-safe.

TPU-native counterpart of /root/reference/src/estimators/absolute_pose.h
(P3PEstimator:51, EPNPEstimator:96). The reference solves Grunert's quartic
with a companion-matrix eigensolver; here it is the closed-form Ferrari
quartic from ops/polynomials — branch-free, so thousands of P3P hypotheses
evaluate as one batched RANSAC program.

Conventions: world->cam (R, t); `rays` are normalized image coords (u, v)
(z=1 plane), i.e. K^-1 pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import polynomials as poly
from dagsfm_tpu.ops import umeyama as ume


def _bearings(uv: jax.Array) -> jax.Array:
    """(N, 2) normalized coords -> (N, 3) unit bearing vectors."""
    f = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def p3p(points: jax.Array, uv: jax.Array, max_solutions: int = 4):
    """Grunert P3P: 3 world points (3, 3) + 3 normalized obs (3, 2).

    Returns (R (4, 3, 3), t (4, 3), valid (4,)) — up to four poses.
    Coefficients follow Haralick et al., "Review and Analysis of Solutions
    of the Three Point Perspective Pose Estimation Problem" (the same
    formulation the reference's P3P uses before its quartic solve).
    """
    f = _bearings(uv)                                       # (3, 3)
    A, B, C = points[0], points[1], points[2]
    a = jnp.linalg.norm(B - C)
    b = jnp.linalg.norm(A - C)
    c = jnp.linalg.norm(A - B)
    cos_a = jnp.dot(f[1], f[2])                             # angle at BC
    cos_b = jnp.dot(f[0], f[2])
    cos_g = jnp.dot(f[0], f[1])

    b2 = jnp.maximum(b * b, 1e-18)
    acb = (a * a - c * c) / b2
    apb = (a * a + c * c) / b2
    bcb = (b * b - c * c) / b2
    bab = (b * b - a * a) / b2

    A4 = (acb - 1.0) ** 2 - 4.0 * (c * c / b2) * cos_a ** 2
    A3 = 4.0 * (acb * (1.0 - acb) * cos_b
                - (1.0 - apb) * cos_a * cos_g
                + 2.0 * (c * c / b2) * cos_a ** 2 * cos_b)
    A2 = 2.0 * (acb ** 2 - 1.0
                + 2.0 * acb ** 2 * cos_b ** 2
                + 2.0 * bcb * cos_a ** 2
                - 4.0 * apb * cos_a * cos_b * cos_g
                + 2.0 * bab * cos_g ** 2)
    A1 = 4.0 * (-acb * (1.0 + acb) * cos_b
                + 2.0 * (a * a / b2) * cos_g ** 2 * cos_b
                - (1.0 - apb) * cos_a * cos_g)
    A0 = (1.0 + acb) ** 2 - 4.0 * (a * a / b2) * cos_g ** 2

    vs, vmask = poly.solve_quartic_real(A4, A3, A2, A1, A0)

    def pose_from_v(v):
        den_u = 2.0 * (cos_g - v * cos_a)
        den_u = jnp.where(jnp.abs(den_u) < 1e-14, 1e-14, den_u)
        u = ((-1.0 + acb) * v * v - 2.0 * acb * cos_b * v + 1.0 + acb) / den_u
        den_s1 = 1.0 + v * v - 2.0 * v * cos_b
        den_s1 = jnp.maximum(den_s1, 1e-14)
        s1 = jnp.sqrt(b2 / den_s1)
        s2 = u * s1
        s3 = v * s1
        cam_pts = jnp.stack([s1 * f[0], s2 * f[1], s3 * f[2]])   # (3, 3)
        # rigid (no scale) alignment: world pts -> camera pts
        _, R, t = ume.umeyama(points, cam_pts, with_scale=False)
        ok = (s1 > 0) & (s2 > 0) & (s3 > 0)
        return R, t, ok

    Rs, ts, ok = jax.vmap(pose_from_v)(vs)
    return Rs, ts, vmask & ok


def epnp(points: jax.Array, uv: jax.Array, mask: jax.Array | None = None,
         gn_iters: int = 8):
    """EPnP for N ≥ 4 points (Lepetit et al.), with Gauss-Newton β-refine.

    points (N, 3), uv (N, 2) normalized coords, mask (N,) valid flags.
    Returns (R (3, 3), t (3,), ok ()). Camera-frame control points are
    recovered from the 12x12 nullspace; β cases N=1,2,3 are tried and the
    best by reprojection error wins (mirrors ref EPNPEstimator flow).
    """
    N = points.shape[0]
    dtype = points.dtype
    if mask is None:
        mask = jnp.ones(N, bool)
    w = mask.astype(dtype)
    wsum = jnp.maximum(w.sum(), 1.0)

    # --- control points: centroid + principal directions
    cw0 = (points * w[:, None]).sum(0) / wsum
    centered = (points - cw0) * w[:, None]
    cov = centered.T @ centered / wsum
    evals, evecs = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-12))
    ctrl_w = jnp.concatenate([
        cw0[None],
        cw0[None] + (evecs * scale[None, :]).T,
    ])                                                       # (4, 3)

    # --- barycentric coordinates
    M44 = jnp.concatenate([ctrl_w.T, jnp.ones((1, 4), dtype)], axis=0)  # (4,4)
    rhs = jnp.concatenate([points.T, jnp.ones((1, N), dtype)], axis=0)
    alphas = jnp.linalg.solve(M44, rhs).T                    # (N, 4)

    # --- M matrix (2N x 12): for control j, cols 3j..3j+2 get
    # alpha_j * (1, 0, -u) on u-rows and alpha_j * (0, 1, -v) on v-rows
    u, v = uv[:, 0], uv[:, 1]
    M = jnp.zeros((2 * N, 12), dtype)
    a = alphas
    for j in range(4):
        M = M.at[0::2, 3 * j + 0].set(a[:, j] * w)
        M = M.at[0::2, 3 * j + 2].set(-u * a[:, j] * w)
        M = M.at[1::2, 3 * j + 1].set(a[:, j] * w)
        M = M.at[1::2, 3 * j + 2].set(-v * a[:, j] * w)

    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    Vk = V[:, :4]                                            # 4 smallest
    vset = Vk.T.reshape(4, 4, 3)                             # (k, ctrl, 3)

    # pairwise control-point distances in world frame
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    dw = jnp.stack([jnp.linalg.norm(ctrl_w[i] - ctrl_w[j])
                    for i, j in pairs])                      # (6,)

    def dists(ctrl_c):
        return jnp.stack([jnp.linalg.norm(ctrl_c[i] - ctrl_c[j])
                          for i, j in pairs])

    # --- beta initializations (cases N=1, 2, 3 as in the paper)
    dv = jnp.stack([jnp.stack([jnp.linalg.norm(vset[k, i] - vset[k, j])
                               for i, j in pairs]) for k in range(4)])  # (4,6)

    # case 1: x ≈ b1 v1
    b1_c1 = jnp.sum(dv[0] * dw) / jnp.maximum(jnp.sum(dv[0] * dv[0]), 1e-18)
    betas_c1 = jnp.array([b1_c1, 0.0, 0.0, 0.0], dtype)

    # case 2: x ≈ b1 v1 + b2 v2 — solve small LS on squared distances
    # |b1 va + b2 vb|^2 = b1^2|va|^2 + 2 b1 b2 va·vb + b2^2 |vb|^2
    def sq_feats(k, l):
        va = vset[k]
        vb = vset[l]
        da = jnp.stack([va[i] - va[j] for i, j in pairs])    # (6,3)
        db = jnp.stack([vb[i] - vb[j] for i, j in pairs])
        return (jnp.sum(da * da, -1), 2 * jnp.sum(da * db, -1),
                jnp.sum(db * db, -1))

    f11, f12, f22 = sq_feats(0, 1)
    A2m = jnp.stack([f11, f12, f22], axis=-1)                # (6,3)
    sol2, *_ = jnp.linalg.lstsq(A2m, dw * dw)
    b1s = jnp.sqrt(jnp.maximum(jnp.abs(sol2[0]), 1e-18))
    b2s = jnp.sqrt(jnp.maximum(jnp.abs(sol2[2]), 1e-18)) * \
        jnp.sign(sol2[1]) * jnp.sign(sol2[0] + 1e-30)
    betas_c2 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype) * 0.0
    betas_c2 = betas_c2.at[0].set(b1s).at[1].set(b2s)

    # case 3: add v3 via lstsq on [b11, b12, b22, b13, b23]
    f13a, f13b, f33 = sq_feats(0, 2)
    _, f23b, _ = sq_feats(1, 2)
    A3m = jnp.stack([f11, f12, f22, f13b, f23b], axis=-1)    # (6,5)
    sol3, *_ = jnp.linalg.lstsq(A3m, dw * dw)
    b1t = jnp.sqrt(jnp.maximum(jnp.abs(sol3[0]), 1e-18))
    b2t = jnp.sqrt(jnp.maximum(jnp.abs(sol3[2]), 1e-18)) * jnp.sign(sol3[1])
    b3t = sol3[3] / jnp.maximum(b1t, 1e-12)
    betas_c3 = jnp.array([1.0, 0.0, 0.0, 0.0], dtype) * 0.0
    betas_c3 = betas_c3.at[0].set(b1t).at[1].set(b2t).at[2].set(b3t)

    def gn_refine(betas):
        """Gauss-Newton on the 6 distance constraints."""
        def resid(b):
            ctrl = jnp.einsum("k,kcd->cd", b, vset)
            return dists(ctrl) - dw
        for _ in range(gn_iters):
            r = resid(betas)
            J = jax.jacfwd(resid)(betas)
            JtJ = J.T @ J + 1e-9 * jnp.eye(4, dtype=dtype)
            betas = betas - jnp.linalg.solve(JtJ, J.T @ r)
        return betas

    def pose_from_betas(betas):
        ctrl_c = jnp.einsum("k,kcd->cd", betas, vset)        # (4, 3)
        pts_c = alphas @ ctrl_c                              # (N, 3)
        # flip if behind camera
        depth = jnp.sum(pts_c[:, 2] * w)
        sgn = jnp.where(depth < 0, -1.0, 1.0)
        pts_c = pts_c * sgn
        _, R, t = ume.umeyama(points, pts_c, w=w, with_scale=False)
        # reprojection error
        proj = points @ R.T + t
        z = jnp.where(jnp.abs(proj[:, 2]) < 1e-12, 1e-12, proj[:, 2])
        err = jnp.sum(jnp.where(mask,
                                jnp.sum((proj[:, :2] / z[:, None] - uv) ** 2,
                                        -1), 0.0))
        return R, t, err

    cands = jnp.stack([gn_refine(b) for b in
                       (betas_c1, betas_c2, betas_c3)])
    Rs, ts, errs = jax.vmap(pose_from_betas)(cands)
    best = jnp.argmin(errs)
    return Rs[best], ts[best], jnp.isfinite(errs[best])


def pose_reproj_error(R, t, points, uv):
    """Squared reprojection error in normalized coords for (R, t)."""
    proj = points @ jnp.swapaxes(R, -1, -2) + t
    z = jnp.where(jnp.abs(proj[..., 2]) < 1e-12, 1e-12, proj[..., 2])
    e = proj[..., :2] / z[..., None] - uv
    err = jnp.sum(e * e, axis=-1)
    # behind-camera points get infinite error (ref: P3PEstimator residuals
    # use CalculateSquaredReprojectionError with cheirality)
    return jnp.where(proj[..., 2] > 0, err, 1e12)


def refine_pose(R, t, points, uv, mask, num_iters: int = 20,
                loss_scale: float = 1e-2):
    """Pose-only Gauss-Newton refinement with Cauchy IRLS weights.

    TPU counterpart of the reference's Ceres RefineAbsolutePose
    (estimators/pose.cc:198). Local so(3) x R^3 increments, fixed trip
    count, jit/vmap-safe. points (N,3), uv (N,2) normalized, mask (N,).
    Returns (R, t).
    """
    from dagsfm_tpu.ops import rotations as rops
    dtype = points.dtype
    q0 = rops.rotmat_to_quat(R)

    def resid(delta, q, tr):
        dq = rops.angleaxis_to_quat(delta[:3])
        qq = rops.quat_multiply(dq, q)
        tt = tr + delta[3:]
        Xc = rops.quat_rotate(qq[None, :], points) + tt
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        return (Xc[:, :2] / z[:, None] - uv)

    def body(carry, _):
        q, tr = carry
        zero = jnp.zeros(6, dtype)
        r = resid(zero, q, tr)                       # (N, 2)
        J = jax.jacfwd(lambda d: resid(d, q, tr))(zero)  # (N, 2, 6)
        r2 = jnp.sum(r * r, axis=-1)
        w = (1.0 / (1.0 + r2 / (loss_scale ** 2))) * mask.astype(dtype)
        JtJ = jnp.einsum("n,nri,nrj->ij", w, J, J)
        Jtr = jnp.einsum("n,nri,nr->i", w, J, r)
        JtJ = JtJ + 1e-8 * jnp.eye(6, dtype=dtype)
        delta = -jnp.linalg.solve(JtJ, Jtr)
        dq = rops.angleaxis_to_quat(delta[:3])
        q = rops.quat_normalize(rops.quat_multiply(dq, q))
        tr = tr + delta[3:]
        return (q, tr), None

    (q, tr), _ = jax.lax.scan(body, (q0, t), None, length=num_iters)
    return rops.quat_to_rotmat(q), tr
