"""Distributed Schur-complement bundle adjustment over a device mesh.

The BASELINE.json north-star kernel: replaces BOTH the reference's
single-node Ceres final BA (/root/reference/src/controllers/
distributed_mapper_controller.cpp:836-933) and its PBA CUDA offload
(optim/bundle_adjustment.cc:556-640) with an SPMD program:

  * observations are sharded BY POINT over the mesh ('d' axis): every
    track lives wholly on one device, so the point blocks V, the point
    gradient gp, and the per-point Schur outer products are device-local
    (zero communication).
  * camera-side blocks (U, gc) and the reduced camera system S are
    partial-summed locally then combined with ONE psum per LM iteration —
    the only ICI traffic, O(I² · 36) floats, riding the all-reduce.
  * the reduced solve runs replicated on every device (cheap: I ≤ a few
    hundred per merged scene); point back-substitution is local again.

This is the scaling-book recipe: pick mesh, shard the big axis (tracks),
let the collective carry the small reduced system. Scaling efficiency
target ≥ 0.8 (BASELINE.md) holds as long as per-device track count keeps
the VPU busy relative to the psum of S.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.sfm import bundle_adjustment as ba


class ShardedBAProblem(NamedTuple):
    """BA problem with point/observation data sharded over devices.

    Leading axis D = num devices on sharded fields; replicated fields
    carry no leading device axis.
    """
    # replicated
    image_qvec: jax.Array     # (I, 4)
    image_tvec: jax.Array     # (I, 3)
    image_camidx: jax.Array   # (I,)
    cam_model_id: jax.Array   # (C,)
    cam_params: jax.Array     # (C, MAX)
    const_image: jax.Array    # (I,)
    # (C, 8) refinable-intrinsic-slot mask (cameras.apply_intrinsics_delta
    # layout; all-zero = intrinsics constant)
    cam_refine: jax.Array
    # sharded by device (leading axis D)
    points: jax.Array         # (D, Pd, 3)
    points_mask: jax.Array    # (D, Pd)
    obs_image: jax.Array      # (D, Nd)
    obs_point: jax.Array      # (D, Nd) — local point index within shard
    obs_xy: jax.Array         # (D, Nd, 2)
    obs_mask: jax.Array       # (D, Nd)
    trk_obs: jax.Array        # (D, Pd, T) — local obs index within shard
    trk_mask: jax.Array       # (D, Pd, T)
    # camera-grouped local observation slots (dual of trk_obs): makes
    # camera-indexed reductions gather+sum (scatter-free) — required by
    # the matrix-free iterative-Schur matvec
    cam_obs: jax.Array        # (D, I, Ml) local obs index within shard
    cam_mask: jax.Array       # (D, I, Ml)


def shard_problem(arrays, num_devices: int, max_track_len: int = 16,
                  const_image=None, cam_refine=None,
                  dtype=jnp.float64) -> ShardedBAProblem:
    """Partition a SceneArrays by point onto `num_devices` shards.

    Points are assigned round-robin by track size (greedy balance); each
    shard is padded to the common (Pd, Nd) bucket.
    """
    from dagsfm_tpu.parallel.mesh import partition_balanced

    P_ = arrays.points_xyz.shape[0]
    op = np.asarray(arrays.obs_point)
    om = np.asarray(arrays.obs_mask)
    # track length per point
    tlen = np.bincount(op[om], minlength=P_)
    assign = partition_balanced(np.maximum(tlen, 1), num_devices)

    # per-shard local indices
    Pd = int(np.ceil(P_ / num_devices))
    Nd = 0
    shard_pts = [np.nonzero(assign == d)[0] for d in range(num_devices)]
    Pd = max(len(s) for s in shard_pts)
    obs_by_shard = []
    for d in range(num_devices):
        sel = np.isin(op, shard_pts[d]) & om
        obs_by_shard.append(np.nonzero(sel)[0])
        Nd = max(Nd, len(obs_by_shard[d]))
    # bucket
    def _b(n, m=8):
        b = m
        while b < n:
            b *= 2
        return b
    Pd = _b(Pd)
    Nd = _b(Nd, 64)

    D = num_devices
    I = arrays.image_qvec.shape[0]
    T = max_track_len
    points = np.zeros((D, Pd, 3))
    pmask = np.zeros((D, Pd), bool)
    obs_image = np.zeros((D, Nd), np.int32)
    obs_point = np.zeros((D, Nd), np.int32)
    obs_xy = np.zeros((D, Nd, 2))
    obs_mask = np.zeros((D, Nd), bool)
    trk_obs = np.zeros((D, Pd, T), np.int32)
    trk_mask = np.zeros((D, Pd, T), bool)

    oi = np.asarray(arrays.obs_image)
    oxy = np.asarray(arrays.obs_xy)
    xyz = np.asarray(arrays.points_xyz)
    g2l = np.full(P_, -1, np.int64)
    for d in range(D):
        npts = len(shard_pts[d])
        g2l[shard_pts[d]] = np.arange(npts)
        sel = obs_by_shard[d]
        nloc = len(sel)
        points[d, :npts] = xyz[shard_pts[d]]
        pmask[d, :npts] = True
        obs_image[d, :nloc] = oi[sel]
        lp = g2l[op[sel]]
        obs_point[d, :nloc] = lp
        obs_xy[d, :nloc] = oxy[sel]
        live = np.ones(nloc, bool)
        # track slots: sort by local point, position within group;
        # overflowing tracks decimated uniformly (mirrors make_problem)
        order = np.argsort(lp, kind="stable")
        lp_s = lp[order]
        n_s = order.astype(np.int32)
        sizes = np.bincount(lp_s, minlength=Pd)
        starts = np.searchsorted(lp_s, np.arange(Pd))
        pos = np.arange(nloc) - starts[lp_s]
        sz = sizes[lp_s]
        keep = (sz <= T) | ((pos * T) // np.maximum(sz, 1)
                            != ((pos + 1) * T) // np.maximum(sz, 1))
        slot = np.where(sz <= T, pos, (pos * T) // np.maximum(sz, 1))
        fits = keep & (slot < T)
        trk_obs[d, lp_s[fits], slot[fits]] = n_s[fits]
        trk_mask[d, lp_s[fits], slot[fits]] = True
        live[n_s[~fits]] = False
        obs_mask[d, :nloc] = live

    # camera-grouped local slots (common Ml across shards)
    Ml = 8
    for d in range(D):
        lv = np.nonzero(obs_mask[d])[0]
        if len(lv):
            c = np.bincount(obs_image[d][lv], minlength=I).max()
            Ml = max(Ml, int(-(-int(c) // 8) * 8))
    cam_obs = np.zeros((D, I, Ml), np.int32)
    cam_mask = np.zeros((D, I, Ml), bool)
    for d in range(D):
        lv = np.nonzero(obs_mask[d])[0]
        if not len(lv):
            continue
        im = obs_image[d][lv]
        order = np.argsort(im, kind="stable")
        lv_s, im_s = lv[order], im[order]
        starts = np.searchsorted(im_s, np.arange(I))
        pos = np.arange(len(lv_s)) - starts[im_s]
        cam_obs[d, im_s, pos] = lv_s
        cam_mask[d, im_s, pos] = True

    if const_image is None:
        const_image = np.zeros(I, bool)
        const_image[:2] = True
    if cam_refine is None:
        cam_refine = np.zeros((arrays.cam_params.shape[0],
                               cm.NUM_INTRINSIC_SLOTS))

    return ShardedBAProblem(
        jnp.asarray(arrays.image_qvec, dtype),
        jnp.asarray(arrays.image_tvec, dtype),
        jnp.asarray(arrays.image_camidx),
        jnp.asarray(arrays.cam_model_id),
        jnp.asarray(arrays.cam_params, dtype),
        jnp.asarray(const_image),
        jnp.asarray(cam_refine, dtype),
        jnp.asarray(points, dtype), jnp.asarray(pmask),
        jnp.asarray(obs_image), jnp.asarray(obs_point),
        jnp.asarray(obs_xy, dtype), jnp.asarray(obs_mask),
        jnp.asarray(trk_obs), jnp.asarray(trk_mask),
        jnp.asarray(cam_obs), jnp.asarray(cam_mask),
    ), shard_pts


def place(prob: ShardedBAProblem, mesh: Mesh) -> ShardedBAProblem:
    """Put sharded fields on the mesh ('d' on the leading axis)."""
    sh = NamedSharding(mesh, P("d"))
    rep = NamedSharding(mesh, P())
    rep_fields = {"image_qvec", "image_tvec", "image_camidx",
                  "cam_model_id", "cam_params", "const_image",
                  "cam_refine"}
    out = {}
    for name, val in prob._asdict().items():
        out[name] = jax.device_put(
            val, rep if name in rep_fields else sh)
    return ShardedBAProblem(**out)


def _local_r_J(qvec, tvec, camidx, model_id, cam_params, const_image,
               points, obs_image, obs_point, obs_xy, obs_mask,
               loss_scale, pinhole_only, cam_refine=None,
               refine=False):
    """Device-local weighted residuals + jacobians (no leading D axis).

    Returns (r_w, Jc_w, Jp_w, Jg_w) with robust (Cauchy) IRLS weights and
    the observation/const-camera masks folded in. Jg_w is None unless
    `refine` (static) — the intrinsics-increment Jacobian, masked by the
    observation's camera cam_refine row.
    """
    dtype = obs_xy.dtype
    q = qvec[obs_image]
    t = tvec[obs_image]
    cidx = camidx[obs_image]

    G = cm.NUM_INTRINSIC_SLOTS
    zeros6 = jnp.zeros(6, dtype)
    zeros3 = jnp.zeros(3, dtype)
    zerosG = jnp.zeros(G, dtype)
    X = points[obs_point]

    Jg = None
    if pinhole_only and not refine:
        fpar = ba._pinhole_fparams_from(cam_params, model_id)[cidx]

        def one(qv, tv, p4, x, xy):
            f = lambda dc, dp: ba._project_one_pinhole(dc, dp, qv, tv, p4,
                                                       x, xy)
            r = f(zeros6, zeros3)
            Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(zeros6, zeros3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(one)(q, t, fpar, X, obs_xy)
    elif not refine:
        mid = model_id[cidx]
        par = cam_params[cidx]

        def one(qv, tv, m, p, x, xy):
            f = lambda dc, dp: ba._project_one(dc, dp, zerosG, qv, tv, m,
                                               p, x, xy)
            r = f(zeros6, zeros3)
            Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(zeros6, zeros3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(one)(q, t, mid, par, X, obs_xy)
    else:
        mid = model_id[cidx]
        par = cam_params[cidx]

        def one(qv, tv, m, p, x, xy):
            f = lambda dc, dp, dg: ba._project_one(dc, dp, dg, qv, tv, m,
                                                   p, x, xy)
            r = f(zeros6, zeros3, zerosG)
            Jc, Jp, Jg = jax.jacfwd(f, argnums=(0, 1, 2))(
                zeros6, zeros3, zerosG)
            return r, Jc, Jp, Jg

        r, Jc, Jp, Jg = jax.vmap(one)(q, t, mid, par, X, obs_xy)
        Jg = Jg * cam_refine[cidx][:, None, :]

    r2 = jnp.sum(r * r, axis=-1)
    w = 1.0 / (1.0 + r2 / (loss_scale * loss_scale))        # cauchy IRLS
    wm = (w * obs_mask.astype(dtype))[:, None, None]
    sw = jnp.sqrt(wm)
    camfree = (~const_image)[obs_image].astype(dtype)[:, None, None]
    Jc_w = Jc * sw * camfree
    Jp_w = Jp * sw
    r_w = r * sw[..., 0]
    Jg_w = Jg * sw if refine else None
    return r_w, Jc_w, Jp_w, Jg_w


def _point_blocks(r_w, Jp_w, trk_obs, trk_mask, lam, point_damping):
    """Local V, gp, Vinv via track-slot gathers (points are shard-local)."""
    dtype = r_w.dtype
    tm = trk_mask.astype(dtype)[..., None, None]
    Jp_slot = Jp_w[trk_obs] * tm                            # (Pd,T,2,3)
    r_slot = r_w[trk_obs] * tm[..., 0]
    V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, r_slot)
    eye3 = jnp.eye(3, dtype=dtype)
    Vd = V + (lam * jnp.maximum(jnp.diagonal(V, axis1=-2, axis2=-1),
                                1e-6)[..., None] + point_damping) * eye3
    return ba._inv3(Vd + 1e-12 * eye3), gp


def _cam_reduce(z, cam_obs, cam_mask):
    """(Nd, K) per-obs values -> (I, K) sums by image (gather + sum)."""
    z_slot = z[cam_obs] * cam_mask[..., None].astype(z.dtype)
    return jnp.sum(z_slot, axis=1)


def _backsub_points(dcam, Vinv, gp, W, obs_image, trk_obs, trk_mask):
    """dpt = Vinv (gp - sum_k W_k^T dcam_{i_k}) via track slots (local)."""
    tm = trk_mask[..., None, None].astype(W.dtype)
    slot_W = W[trk_obs] * tm
    dc_slots = dcam[obs_image[trk_obs]] * trk_mask[..., None]
    wtd = jnp.einsum("ptij,pti->pj", slot_W, dc_slots)
    return jnp.einsum("pij,pj->pi", Vinv, gp - wtd)


def _build_solver(mesh: Mesh, opts: ba.BAOptions, solver: str,
                  pinhole_only: bool):
    """Jitted sharded LM loop (cached per mesh/opts — re-running the
    final BA per cluster or per round reuses the compiled program)."""
    refine = ba._refine_any(opts)
    spec_sh = P("d")
    spec_rep = P()
    step_in = (spec_rep,) * 7 + (spec_sh,) * 9 + (spec_rep,)
    shmap_step = functools.partial(
        shard_map, mesh=mesh, in_specs=step_in,
        out_specs=(spec_rep, spec_rep, spec_sh), check_vma=False)
    shmap_cost = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_rep,) * 5 + (spec_sh,) * 5,
        out_specs=spec_rep, check_vma=False)

    def plain_cost_local(qvec, tvec, camidx, model_id, cam_params,
                         points, oi, op_, oxy, om, loss_scale):
        q = qvec[oi]
        t = tvec[oi]
        cidx = camidx[oi]
        X = points[op_]
        Xc = rops.quat_rotate(q, X) + t
        if pinhole_only:
            fpar = ba._pinhole_fparams_from(cam_params, model_id)[cidx]
            z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
            proj = Xc[:, :2] / z[:, None] * fpar[:, :2] + fpar[:, 2:]
        else:
            mid = model_id[cidx]
            par = cam_params[cidx]
            proj = jax.vmap(cm.img_from_cam)(mid, par, Xc)
        r = proj - oxy
        r = jnp.where((Xc[:, 2] > 1e-6)[:, None], r, 1e3)
        r2 = jnp.sum(r * r, -1)
        c = loss_scale ** 2 * jnp.log1p(r2 / loss_scale ** 2)
        return jnp.sum(jnp.where(om, c, 0.0))

    def step_local(qvec, tvec, camidx, model_id, cam_params, const_image,
                   cam_refine, points, oi, op_, oxy, om, tro, trm, co,
                   cmk, lam):
        """Device-local half of one damped GN step; returns psummable
        blocks + local point data for backsubstitution."""
        I = qvec.shape[0]
        dtype = oxy.dtype
        r_w, Jc_w, Jp_w, Jg_w = _local_r_J(
            qvec, tvec, camidx, model_id, cam_params, const_image,
            points, oi, op_, oxy, om, opts.loss_scale, pinhole_only,
            cam_refine, refine)
        Vinv, gp = _point_blocks(r_w, Jp_w, tro, trm, lam,
                                 opts.point_damping)
        W = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w)           # (Nd,6,3)

        # camera-slot (scatter-free) local partial sums
        cmask = cmk.astype(dtype)[..., None, None]
        Jc_slot = Jc_w[co] * cmask                           # (I,Ml,2,6)
        rc_slot = r_w[co] * cmask[..., 0]
        U_l = jnp.einsum("imra,imrb->iab", Jc_slot, Jc_slot)
        gc_l = -jnp.einsum("imra,imr->ia", Jc_slot, rc_slot)
        WVinv = jnp.einsum("nij,njk->nik", W, Vinv[op_])
        corr_l = _cam_reduce(
            jnp.einsum("nik,nk->ni", WVinv, gp[op_]), co, cmk)
        if not refine:
            return U_l, gc_l, corr_l, (W, WVinv, Vinv, gp)
        # intrinsics partial sums (kept at IMAGE granularity locally;
        # the image->camera fold happens post-psum — the (Nd,C) one-hot
        # never materializes)
        Jg_slot = Jg_w[co] * cmask                           # (I,Ml,2,G)
        Ugg_l = jnp.einsum("imra,imrb->iab", Jg_slot, Jg_slot)
        Upg_l = jnp.einsum("imra,imrb->iab", Jc_slot, Jg_slot)
        gg_l = -jnp.einsum("imra,imr->ia", Jg_slot, rc_slot)
        Wg = jnp.einsum("nri,nrj->nij", Jg_w, Jp_w)          # (Nd,G,3)
        WgVinv = jnp.einsum("nij,njk->nik", Wg, Vinv[op_])
        corrg_l = _cam_reduce(
            jnp.einsum("nik,nk->ni", WgVinv, gp[op_]), co, cmk)
        return U_l, gc_l, corr_l, (W, WVinv, Vinv, gp), \
            (Ugg_l, Upg_l, gg_l, corrg_l, Wg, WgVinv)

    def damp_and_pin(U, lam, const_image, dtype):
        I = U.shape[0]
        eyeC = jnp.eye(6, dtype=dtype)
        Ud = U + lam * eyeC[None] * jnp.maximum(
            jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)[..., None]
        free = (~const_image).astype(dtype)
        return Ud, free, eyeC

    if solver == "dense":
        @shmap_step
        def sharded_step(qvec, tvec, camidx, model_id, cam_params,
                         const_image, cam_refine, points, oi, op_, oxy,
                         om, tro, trm, co, cmk, lam):
            I = qvec.shape[0]
            dtype = oxy.dtype
            U_l, gc_l, corr_l, (W, WVinv, Vinv, gp) = step_local(
                qvec, tvec, camidx, model_id, cam_params, const_image,
                cam_refine, points[0], oi[0], op_[0], oxy[0], om[0],
                tro[0], trm[0], co[0], cmk[0], lam)

            # dense S: off-diagonal blocks via per-point one-hot einsums
            # (only reachable in the small-I regime, mirroring the
            # reference DENSE_SCHUR pick)
            tm = trm[0][..., None, None].astype(dtype)
            slot_img = oi[0][tro[0]]
            slot_W = W[tro[0]] * tm
            Y_slot = WVinv[tro[0]] * tm
            E_slot = jax.nn.one_hot(slot_img, I, dtype=dtype) * \
                trm[0][..., None].astype(dtype)              # (Pd,T,I)
            A = jnp.einsum("pti,ptak->piak", E_slot, Y_slot)
            B = jnp.einsum("pti,ptak->piak", E_slot, slot_W)
            S_l = -jnp.einsum("piak,pjbk->ijab", A, B)
            S_l = S_l.at[jnp.arange(I), jnp.arange(I)].add(U_l)

            S, gc, corr = jax.lax.psum((S_l, gc_l, corr_l), "d")
            b = gc - corr

            eyeC = jnp.eye(6, dtype=dtype)
            diag = jnp.maximum(jnp.diagonal(
                S[jnp.arange(I), jnp.arange(I)], axis1=-2, axis2=-1), 1e-6)
            S = S.at[jnp.arange(I), jnp.arange(I)].add(
                lam * eyeC[None] * diag[..., None])
            free = (~const_image).astype(dtype)
            Sm = S * free[:, None, None, None] * free[None, :, None, None]
            Sm = Sm.at[jnp.arange(I), jnp.arange(I)].add(
                (1.0 - free)[:, None, None] * eyeC[None])
            bm = b * free[:, None]
            Sfull = Sm.transpose(0, 2, 1, 3).reshape(I * 6, I * 6)
            Sfull = 0.5 * (Sfull + Sfull.T) + \
                1e-10 * jnp.eye(I * 6, dtype=dtype)
            L, low = jax.scipy.linalg.cho_factor(Sfull)
            dcam = jax.scipy.linalg.cho_solve(
                (L, low), bm.reshape(I * 6)).reshape(I, 6)
            dcam = dcam * free[:, None]
            dpt = _backsub_points(dcam, Vinv, gp, W, oi[0], tro[0], trm[0])
            dint = jnp.zeros_like(cam_refine)
            return dcam, dint, dpt[None]
    else:
        @shmap_step
        def sharded_step(qvec, tvec, camidx, model_id, cam_params,
                         const_image, cam_refine, points, oi, op_, oxy,
                         om, tro, trm, co, cmk, lam):
            """ITERATIVE_SCHUR: matrix-free SCHUR_JACOBI PCG. One psum of
            (I,6) (+ (I,G) when intrinsics refine) per CG iteration rides
            the ICI; S never materialized. With refinement the system is
            JOINT over poses and per-camera intrinsics (shared-camera
            blocks folded image->camera post-psum)."""
            I = qvec.shape[0]
            C = cam_params.shape[0]
            G = cm.NUM_INTRINSIC_SLOTS
            dtype = oxy.dtype
            oi0, op0 = oi[0], op_[0]
            tro0, trm0, co0, cmk0 = tro[0], trm[0], co[0], cmk[0]
            out = step_local(
                qvec, tvec, camidx, model_id, cam_params, const_image,
                cam_refine, points[0], oi0, op0, oxy[0], om[0], tro0,
                trm0, co0, cmk0, lam)
            U_l, gc_l, corr_l, (W, WVinv, Vinv, gp) = out[:4]
            Bblk_l = _cam_reduce(
                jnp.einsum("nik,njk->nij", WVinv, W).reshape(-1, 36),
                co0, cmk0).reshape(I, 6, 6)
            if refine:
                Ugg_l, Upg_l, gg_l, corrg_l, Wg, WgVinv = out[4]
                Bgg_l = _cam_reduce(
                    jnp.einsum("nik,njk->nij", WgVinv, Wg
                               ).reshape(-1, G * G),
                    co0, cmk0).reshape(I, G, G)
                U, gc, corr, Bblk, Ugg_i, Upg, gg_i, corrg_i, Bgg_i = \
                    jax.lax.psum((U_l, gc_l, corr_l, Bblk_l, Ugg_l,
                                  Upg_l, gg_l, corrg_l, Bgg_l), "d")
            else:
                U, gc, corr, Bblk = jax.lax.psum(
                    (U_l, gc_l, corr_l, Bblk_l), "d")

            Ud, free, eyeC = damp_and_pin(U, lam, const_image, dtype)
            b = (gc - corr) * free[:, None]
            Sdiag = Ud - Bblk
            Sdiag = Sdiag * free[:, None, None] + \
                (1.0 - free)[:, None, None] * eyeC[None]
            Sdiag = 0.5 * (Sdiag + jnp.swapaxes(Sdiag, -1, -2)) + \
                1e-10 * eyeC[None]
            Minv = jnp.linalg.solve(
                Sdiag, jnp.broadcast_to(eyeC, Sdiag.shape))

            if refine:
                camhot = jax.nn.one_hot(camidx, C, dtype=dtype)  # (I,C)
                gfree = (cam_refine > 0).astype(dtype)           # (C,G)
                eyeG = jnp.eye(G, dtype=dtype)

                def fold(z_img):
                    return jnp.einsum("ic,ia->ca", camhot, z_img)

                U_gg = jnp.einsum(
                    "ic,iab->cab", camhot, Ugg_i)                # (C,G,G)
                U_ggd = U_gg + lam * eyeG[None] * jnp.maximum(
                    jnp.diagonal(U_gg, axis1=-2, axis2=-1),
                    1e-6)[..., None]
                b_g = (fold(gg_i) - fold(corrg_i)) * gfree
                Sdiag_g = U_ggd - jnp.einsum("ic,iab->cab", camhot, Bgg_i)
                gf2 = gfree[:, :, None] * gfree[:, None, :]
                Sdiag_g = Sdiag_g * gf2 + \
                    (1.0 - gfree)[:, :, None] * eyeG[None]
                Sdiag_g = 0.5 * (Sdiag_g + jnp.swapaxes(
                    Sdiag_g, -1, -2)) + 1e-10 * eyeG[None]
                Minv_g = jnp.linalg.solve(
                    Sdiag_g, jnp.broadcast_to(eyeG, Sdiag_g.shape))
                cidx_obs = camidx[oi0]

                def S_mv_joint(xp, xg):
                    xpm = xp * free[:, None]
                    xgm = xg * gfree
                    u = jnp.einsum("nij,ni->nj", W, xpm[oi0]) + \
                        jnp.einsum("nij,ni->nj", Wg, xgm[cidx_obs])
                    u_slot = u[tro0] * trm0[..., None].astype(dtype)
                    y = jnp.einsum("pij,pj->pi", Vinv,
                                   jnp.sum(u_slot, axis=1))
                    yo = y[op0]
                    zc_l = _cam_reduce(
                        jnp.einsum("nij,nj->ni", W, yo), co0, cmk0)
                    zg_l = _cam_reduce(
                        jnp.einsum("nij,nj->ni", Wg, yo), co0, cmk0)
                    zc, zg_i = jax.lax.psum((zc_l, zg_l), "d")
                    Sxp = jnp.einsum("iab,ib->ia", Ud, xpm) + \
                        jnp.einsum("iab,ib->ia", Upg, xgm[camidx]) - zc
                    Sxg = jnp.einsum("cab,cb->ca", U_ggd, xgm) + \
                        fold(jnp.einsum("iab,ia->ib", Upg, xpm)) - \
                        fold(zg_i)
                    Sxp = Sxp * free[:, None] + xp * (1.0 - free)[:, None]
                    Sxg = Sxg * gfree + xg * (1.0 - gfree)
                    return Sxp, Sxg

                def precond_joint(vp, vg):
                    return (jnp.einsum("iab,ib->ia", Minv, vp),
                            jnp.einsum("cab,cb->ca", Minv_g, vg))

                def dotj(ap, ag, bp, bg):
                    return jnp.sum(ap * bp) + jnp.sum(ag * bg)

                bnorm = jnp.sqrt(dotj(b, b_g, b, b_g))
                tol = opts.linear_rtol * jnp.maximum(bnorm, 1e-30)
                zp0, zg0 = precond_joint(b, b_g)
                rz0 = dotj(b, b_g, zp0, zg0)

                def cond(st):
                    k, _, _, rp, rg, _, _, _ = st
                    return (k < opts.max_linear_iterations) & \
                        (jnp.sqrt(dotj(rp, rg, rp, rg)) > tol)

                def body(st):
                    k, xp, xg, rp, rg, pp, pg, rz = st
                    Ap, Ag = S_mv_joint(pp, pg)
                    pAp = dotj(pp, pg, Ap, Ag)
                    alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30,
                                           pAp)
                    xp = xp + alpha * pp
                    xg = xg + alpha * pg
                    rp = rp - alpha * Ap
                    rg = rg - alpha * Ag
                    zp, zg = precond_joint(rp, rg)
                    rz_new = dotj(rp, rg, zp, zg)
                    beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30,
                                              1e-30, rz)
                    return (k + 1, xp, xg, rp, rg, zp + beta * pp,
                            zg + beta * pg, rz_new)

                _, dcam, dint, *_ = jax.lax.while_loop(
                    cond, body,
                    (jnp.asarray(0), jnp.zeros_like(b),
                     jnp.zeros_like(b_g), b, b_g, zp0, zg0, rz0))
                dcam = dcam * free[:, None]
                dint = dint * gfree
                # back-substitution includes the intrinsics contribution
                tm = trm0[..., None, None].astype(dtype)
                slot_Wc = W[tro0] * tm
                slot_Wg = Wg[tro0] * tm
                dc_slots = dcam[oi0[tro0]] * trm0[..., None]
                dg_slots = dint[cidx_obs[tro0]] * trm0[..., None]
                wtd = jnp.einsum("ptij,pti->pj", slot_Wc, dc_slots) + \
                    jnp.einsum("ptij,pti->pj", slot_Wg, dg_slots)
                dpt = jnp.einsum("pij,pj->pi", Vinv, gp - wtd)
                return dcam, dint, dpt[None]

            def S_mv(x):
                xm = x * free[:, None]
                u = jnp.einsum("nij,ni->nj", W, xm[oi0])      # (Nd,3)
                u_slot = u[tro0] * trm0[..., None].astype(dtype)
                tmp = jnp.sum(u_slot, axis=1)                 # (Pd,3)
                y = jnp.einsum("pij,pj->pi", Vinv, tmp)
                z = jnp.einsum("nij,nj->ni", W, y[op0])       # (Nd,6)
                zc = jax.lax.psum(_cam_reduce(z, co0, cmk0), "d")
                Sx = jnp.einsum("iab,ib->ia", Ud, xm) - zc
                return Sx * free[:, None] + x * (1.0 - free)[:, None]

            def precond(v):
                return jnp.einsum("iab,ib->ia", Minv, v)

            bnorm = jnp.sqrt(jnp.sum(b * b))
            tol = opts.linear_rtol * jnp.maximum(bnorm, 1e-30)
            x0 = jnp.zeros_like(b)
            z0 = precond(b)
            rz0 = jnp.sum(b * z0)

            def cond(st):
                k, _, r, _, _ = st
                return (k < opts.max_linear_iterations) & \
                    (jnp.sqrt(jnp.sum(r * r)) > tol)

            def body(st):
                k, x, r, p, rz = st
                Ap = S_mv(p)
                pAp = jnp.sum(p * Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
                x = x + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
                return k + 1, x, r, z + beta * p, rz_new

            _, dcam, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(0), x0, b, z0, rz0))
            dcam = dcam * free[:, None]
            dpt = _backsub_points(dcam, Vinv, gp, W, oi0, tro0, trm0)
            dint = jnp.zeros_like(cam_refine)
            return dcam, dint, dpt[None]

    @shmap_cost
    def plain_cost_sh(qvec, tvec, camidx, model_id, cam_params,
                      points, oi, op_, oxy, om):
        c = plain_cost_local(qvec, tvec, camidx, model_id, cam_params,
                             points[0], oi[0], op_[0], oxy[0], om[0],
                             opts.loss_scale)
        return jax.lax.psum(c, "d")

    @jax.jit
    def run(qvec, tvec, camidx, model_id, cam_params, const_image,
            cam_refine, points, oi, op_, oxy, om, tro, trm, co, cmk):
        def pc(qv, tv, cp, pts):
            return plain_cost_sh(qv, tv, camidx, model_id, cp,
                                 pts, oi, op_, oxy, om)

        def lm_iter(carry, _):
            qvec, tvec, cam_params, points, lam, cost = carry
            dcam, dint, dpt = sharded_step(
                qvec, tvec, camidx, model_id, cam_params, const_image,
                cam_refine, points, oi, op_, oxy, om, tro, trm, co, cmk,
                lam)
            dq = rops.angleaxis_to_quat(dcam[:, :3])
            q_new = rops.quat_normalize(rops.quat_multiply(dq, qvec))
            t_new = tvec + dcam[:, 3:]
            p_new = points + dpt
            if refine:
                cp_new = jax.vmap(cm.apply_intrinsics_delta)(
                    model_id, cam_params, dint * cam_refine)
            else:
                cp_new = cam_params
            new_cost = pc(q_new, t_new, cp_new, p_new)
            accept = new_cost < cost
            qvec = jnp.where(accept, q_new, qvec)
            tvec = jnp.where(accept, t_new, tvec)
            cam_params = jnp.where(accept, cp_new, cam_params)
            points = jnp.where(accept, p_new, points)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                            jnp.minimum(lam * 4.0, 1e6))
            return (qvec, tvec, cam_params, points, lam, cost), cost

        cost0 = pc(qvec, tvec, cam_params, points)
        lam0 = jnp.asarray(opts.init_lambda, oxy.dtype)
        (qv, tv, cp, pts, lam, cost), _ = jax.lax.scan(
            lm_iter, (qvec, tvec, cam_params, points, lam0, cost0), None,
            length=opts.max_iterations)
        return qv, tv, cp, pts, cost0, cost

    return run



@functools.lru_cache(maxsize=8)
def _cached_solver(mesh: Mesh, opts: ba.BAOptions, solver: str,
                   pinhole_only: bool):
    return _build_solver(mesh, opts, solver, pinhole_only)


def solve_sharded(prob: ShardedBAProblem, mesh: Mesh,
                  opts: ba.BAOptions = ba.BAOptions(),
                  pinhole_only: bool | None = None):
    """LM loop with the sharded Schur step. Returns updated problem + stats.

    solver regime from opts.solver ('auto' picks iterative above
    opts.dense_threshold images, mirroring the reference's size-based
    linear-solver selection at optim/bundle_adjustment.cc:273-284).
    The compiled program is cached per (mesh, opts) — repeated final-BA
    calls (one per round / cluster) do not re-trace.
    """
    I = prob.image_qvec.shape[0]
    solver = opts.solver
    if solver == "auto":
        solver = "iterative" if I > opts.dense_threshold else "dense"
    if ba._refine_any(opts):
        # intrinsics refinement is implemented in the matrix-free joint
        # regime only (the regime the merged/final BA actually runs in)
        solver = "iterative"
    if pinhole_only is None:
        pinhole_only = bool(opts.pinhole_only)

    run = _cached_solver(mesh, opts, solver, pinhole_only)
    qv, tv, cp, pts, c0, c1 = run(
        prob.image_qvec, prob.image_tvec, prob.image_camidx,
        prob.cam_model_id, prob.cam_params, prob.const_image,
        prob.cam_refine, prob.points, prob.obs_image, prob.obs_point,
        prob.obs_xy, prob.obs_mask, prob.trk_obs, prob.trk_mask,
        prob.cam_obs, prob.cam_mask)
    stats = ba.BAStats(c0, c1, jnp.asarray(opts.max_iterations),
                       jnp.asarray(0.0))
    return prob._replace(image_qvec=qv, image_tvec=tv, cam_params=cp,
                         points=pts), stats



def gather_points(prob: ShardedBAProblem, shard_pts, total_points: int):
    """Scatter sharded (optimized) points back to original point order."""
    out = np.zeros((total_points, 3))
    pts = np.asarray(prob.points)
    for d, idx in enumerate(shard_pts):
        out[idx] = pts[d, : len(idx)]
    return out
