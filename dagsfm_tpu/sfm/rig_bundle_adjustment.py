"""Rig-constrained bundle adjustment.

Counterpart of /root/reference/src/optim/bundle_adjustment.h:259
(RigBundleAdjuster): poses are composed cam_from_world =
cam_from_rig ∘ rig_from_world, so all images of a snapshot share one
6-dof rig pose and each rig camera contributes one (optionally constant)
6-dof mount.

Parameterization: so(3) increments on both pose groups + 3D points; one
flat parameter vector; residuals are the full observation batch projected
through the composed pose. The problem is small (snapshots + cameras + a
few thousand points), so LM runs with an explicit Jacobian from
`jax.jacfwd` and a dense normal-equations solve — the entire LM loop is
one jitted `lax.scan` (the big merged-model BA keeps using the Schur
machinery in sfm/bundle_adjustment.py; the rig variant's value is the
constraint structure, not scale).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import rotations as rops


class RigBAProblem(NamedTuple):
    # static structure
    snap_idx: jax.Array      # (N,) observation -> snapshot index
    cam_idx: jax.Array       # (N,) observation -> rig-camera index
    pt_idx: jax.Array        # (N,) observation -> point index
    obs_xy: jax.Array        # (N, 2) pixel observations
    focal: jax.Array         # (C,) per rig camera (pinhole)
    pp: jax.Array            # (C, 2) principal points
    # initial parameters
    rig_q: jax.Array         # (S, 4) rig-from-world
    rig_t: jax.Array         # (S, 3)
    mount_q: jax.Array       # (C, 4) cam-from-rig
    mount_t: jax.Array       # (C, 3)
    points: jax.Array        # (P, 3)


class RigBAOptions(NamedTuple):
    max_iterations: int = 30
    refine_relative_poses: bool = True   # ref RigBundleAdjuster option
    lam0: float = 1e-3


class RigBAResult(NamedTuple):
    rig_q: jax.Array
    rig_t: jax.Array
    mount_q: jax.Array
    mount_t: jax.Array
    points: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


def _exp_q(w):
    """so(3) -> unit quaternion (wxyz); safe norm so jacfwd is finite at
    w = 0 (jnp.linalg.norm has a NaN derivative there)."""
    th = jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True) + 1e-24)
    half = 0.5 * th
    return rops.quat_normalize(
        jnp.concatenate([jnp.cos(half), jnp.sin(half) / th * w], axis=-1))


def _residuals(prob: RigBAProblem, delta, refine_mounts: bool):
    S = prob.rig_q.shape[0]
    C = prob.mount_q.shape[0]
    P = prob.points.shape[0]
    off = 0
    d_rig_w = delta[off:off + 3 * S].reshape(S, 3); off += 3 * S
    d_rig_t = delta[off:off + 3 * S].reshape(S, 3); off += 3 * S
    d_m_w = delta[off:off + 3 * C].reshape(C, 3); off += 3 * C
    d_m_t = delta[off:off + 3 * C].reshape(C, 3); off += 3 * C
    d_pts = delta[off:off + 3 * P].reshape(P, 3)

    rig_q = rops.quat_multiply(_exp_q(d_rig_w), prob.rig_q)
    rig_t = prob.rig_t + d_rig_t
    if refine_mounts:
        m_q = rops.quat_multiply(_exp_q(d_m_w), prob.mount_q)
        m_t = prob.mount_t + d_m_t
    else:
        m_q, m_t = prob.mount_q, prob.mount_t

    qs = rig_q[prob.snap_idx]
    ts = rig_t[prob.snap_idx]
    qc = m_q[prob.cam_idx]
    tc = m_t[prob.cam_idx]
    X = prob.points[prob.pt_idx]
    x_rig = rops.quat_rotate(qs, X) + ts
    x_cam = rops.quat_rotate(qc, x_rig) + tc
    z = jnp.where(jnp.abs(x_cam[:, 2]) < 1e-9, 1e-9, x_cam[:, 2])
    uv = x_cam[:, :2] / z[:, None]
    f = prob.focal[prob.cam_idx]
    pp = prob.pp[prob.cam_idx]
    proj = uv * f[:, None] + pp
    return (proj - prob.obs_xy).reshape(-1), (rig_q, rig_t, m_q, m_t,
                                              prob.points + 0.0, d_pts)


def _apply(prob: RigBAProblem, delta, refine_mounts: bool) -> RigBAProblem:
    _, (rig_q, rig_t, m_q, m_t, pts, d_pts) = _residuals(
        prob, delta, refine_mounts)
    return prob._replace(rig_q=rig_q, rig_t=rig_t, mount_q=m_q,
                         mount_t=m_t, points=pts + d_pts)


def solve(prob: RigBAProblem,
          opts: RigBAOptions = RigBAOptions()) -> RigBAResult:
    """LM with gauge fixed by pinning snapshot 0's rig pose and mount 0."""
    S = prob.rig_q.shape[0]
    C = prob.mount_q.shape[0]
    P = prob.points.shape[0]
    n_params = 6 * S + 6 * C + 3 * P
    refine = opts.refine_relative_poses

    def res_fn(delta, p):
        # points move with the delta too
        r, _ = _residuals(p._replace(
            points=p.points + delta[6 * S + 6 * C:].reshape(P, 3)),
            delta, refine)
        return r

    # gauge + constant masks: pin snapshot 0 (6), mount 0 (6)
    free = np.ones(n_params, bool)
    free[:3] = False
    free[3 * S:3 * S + 3] = False
    free[6 * S:6 * S + 3] = False
    free[6 * S + 3 * C:6 * S + 3 * C + 3] = False
    if not refine:
        free[6 * S:6 * S + 6 * C] = False
    free = jnp.asarray(free)

    @jax.jit
    def run(prob):
        def cost(p):
            r, _ = _residuals(p, jnp.zeros(n_params, p.points.dtype),
                              refine)
            return 0.5 * jnp.sum(r * r)

        def lm_iter(carry, _):
            p, lam = carry
            z = jnp.zeros(n_params, p.points.dtype)
            J = jax.jacfwd(lambda d: res_fn(d, p))(z)
            J = J * free[None, :]
            r = res_fn(z, p)
            H = J.T @ J
            g = J.T @ r
            Hl = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            Hl = Hl + (~free).astype(Hl.dtype) * jnp.eye(
                n_params, dtype=Hl.dtype)
            step = -jnp.linalg.solve(Hl, g) * free
            p_new = _apply(p, step, refine)
            c_old = cost(p)
            c_new = cost(p_new)
            accept = c_new < c_old
            p = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), p_new, p)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (p, lam), c_new

        c0 = cost(prob)
        (p, _), costs = jax.lax.scan(
            lm_iter, (prob, jnp.asarray(opts.lam0, prob.points.dtype)),
            None, length=opts.max_iterations)
        return p, c0, cost(p)

    p, c0, c1 = run(prob)
    return RigBAResult(p.rig_q, p.rig_t, p.mount_q, p.mount_t, p.points,
                       c0, c1)
