"""Bundle adjustment: Schur-complement Levenberg-Marquardt under jit.

TPU-native replacement for the reference's Ceres BA
(/root/reference/src/optim/bundle_adjustment.{h,cc}: Solve picks
DENSE_SCHUR / SPARSE_SCHUR / ITERATIVE_SCHUR by problem size at
bundle_adjustment.cc:273-284) and the CUDA PBA wrapper (:556-640).

Design (array program, no Ceres):
  * residuals r_n = project(cam_{i(n)}, X_{p(n)}) - obs_n over ONE flat
    observation batch; per-observation Jacobian blocks by forward-mode
    autodiff of the local parameterization (so(3) increment ⊗ q).
  * robust loss (Cauchy/Huber, ref uses Ceres CauchyLoss) as IRLS weights.
  * camera blocks U, point blocks V, cross blocks W via segment_sum;
    the reduced camera system S = U - W V^-1 Wᵀ assembled with a
    lax.scan over the (track-slot × track-slot) pairs — each step is a
    batched (P, C, C) outer-product scatter, MXU/VPU-shaped.
  * dense Cholesky solve of S (right-sized for per-cluster problems,
    matching the reference's DENSE_SCHUR regime); the sharded PCG version
    for the merged global problem lives in parallel/ba_sharded.py.
  * fixed-iteration LM loop with accept/reject + adaptive lambda under
    lax.scan (jit-stable, no recompilation).

Parameters optimized: 6-dof poses (angle-axis increment), 3D points, and
optionally per-camera (focal, principal, distortion) slots via a param
mask — mirroring BundleAdjustmentConfig's constant-pose/point options
(bundle_adjustment.h:97-162).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import cameras as cm


class BAProblem(NamedTuple):
    """Flat, padded BA problem (device-ready).

    I images, P points, N observations, C cameras.
    """
    image_qvec: jax.Array    # (I, 4)
    image_tvec: jax.Array    # (I, 3)
    image_camidx: jax.Array  # (I,) int32
    cam_model_id: jax.Array  # (C,) int32
    cam_params: jax.Array    # (C, MAX_CAMERA_PARAMS)
    points: jax.Array        # (P, 3)
    obs_image: jax.Array     # (N,) int32
    obs_point: jax.Array     # (N,) int32
    obs_xy: jax.Array        # (N, 2)
    obs_mask: jax.Array      # (N,) bool
    # track blocks: obs grouped by point, padded to T slots
    trk_obs: jax.Array       # (P, T) int32 index into obs arrays (0 pad)
    trk_mask: jax.Array      # (P, T) bool
    trk_img: jax.Array       # (P, T) int32 image id of each track slot
    # camera blocks: obs grouped by image, padded to M slots (the dual of
    # trk_obs; makes camera-indexed reductions gather+sum instead of
    # scatter — required by the scatter-free iterative-Schur matvec)
    cam_obs: jax.Array       # (I, M) int32 index into obs arrays (0 pad)
    cam_mask: jax.Array      # (I, M) bool
    # config
    const_image: jax.Array   # (I,) bool — pose held fixed (gauge)
    const_points: jax.Array  # (P,) bool
    # (C, 8) float mask of refinable intrinsic slots (see
    # cameras.apply_intrinsics_delta; all-zero = intrinsics constant,
    # mirroring ref BundleAdjustmentOptions refine_focal_length /
    # refine_principal_point / refine_extra_params,
    # bundle_adjustment.h:97-162)
    cam_refine: jax.Array


class BAOptions(NamedTuple):
    max_iterations: int = 30
    loss: str = "cauchy"           # 'trivial' | 'huber' | 'cauchy'
    loss_scale: float = 1.0        # in pixels (ref: CauchyLoss(1.0))
    init_lambda: float = 1e-4
    # intrinsics refinement (ref defaults: refine_focal_length=true,
    # refine_principal_point=false, refine_extra_params=true —
    # incremental_mapper_controller.h:100-110). Which cameras actually
    # refine is the (C, 8) cam_refine mask on the problem; these flags
    # are the static jit keys that enable the joint camera-side system.
    refine_focal: bool = False
    refine_principal: bool = False
    refine_extra: bool = False     # distortion slots
    point_damping: float = 1e-8
    # static specializations (jit keys):
    #  pinhole_only: all cameras are SIMPLE_PINHOLE/PINHOLE -> projection
    #  jacobians skip the 11-way camera-model switch (big trace/HLO cut)
    pinhole_only: bool = False
    #  schur_assembly: 'scan' = T*T sequential scatter steps (low memory),
    #  'flat' = one (P*T*T) einsum + segment_sum, 'matmul' = scatter-free
    #  (gathers + one-hot einsums on the MXU; fastest on TPU), 'auto'
    schur_assembly: str = "auto"
    # linear-solver regime, mirroring the reference's size-based pick
    # (/root/reference/src/optim/bundle_adjustment.cc:273-284:
    # <=50 imgs DENSE_SCHUR, <=1000 SPARSE_SCHUR, else ITERATIVE_SCHUR
    # with SCHUR_JACOBI). We have no sparse-direct factorization; 'auto'
    # uses the dense Cholesky up to dense_threshold images and the
    # matrix-free SCHUR_JACOBI-preconditioned CG above it — S is never
    # materialized as (I,I,6,6) in the iterative regime.
    solver: str = "auto"               # 'dense' | 'iterative' | 'auto'
    dense_threshold: int = 250
    max_linear_iterations: int = 100   # ref BA config: 100 linear iters
    # CG stop: ||r|| <= rtol * ||b||. 0.03 matches the inexact-Newton
    # regime Ceres runs ITERATIVE_SCHUR in (its eta default is 0.1,
    # solver.h) — measured on the 1000-cam/1M-obs problem: identical
    # final cost and mean reprojection error vs 1e-3 at 1.7x the LM
    # iteration rate (the extra CG iterations refined a step LM was
    # about to re-linearize anyway).
    linear_rtol: float = 0.03
    # LM early exit: accepted step with relative cost improvement below
    # ftol terminates (Ceres function_tolerance analog; 0 disables)
    ftol: float = 1e-6


class BAStats(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    num_iterations: jax.Array
    lam: jax.Array


def all_pinhole(arrays) -> bool:
    """True if every camera is SIMPLE_PINHOLE/PINHOLE (enables the
    pinhole_only BAOptions fast path)."""
    import numpy as np
    mids = np.asarray(arrays.cam_model_id)
    return bool(np.isin(mids, [cm.SIMPLE_PINHOLE, cm.PINHOLE]).all())


def make_problem(arrays, max_track_len: int = 16,
                 const_image=None, const_points=None,
                 cam_refine=None, dtype=jnp.float64,
                 reuse_shapes: bool = False) -> BAProblem:
    """Build a BAProblem from SceneArrays (+ track grouping on host).

    The track-slot width T is shrunk to the actual max track length —
    the Schur assembly cost scales with T or T^2, so unused padded slots
    are pure waste.

    reuse_shapes: round the derived shape keys (track width T, per-image
    slot count M, live-observation bucket) to POWERS OF TWO instead of
    tight multiples. Tight rounding is ~1.7x faster per solve (less
    padded work) and right for one-off problems (benchmarks, final BA);
    pow2 rounding is what the incremental mapper needs — its problems
    grow continuously and every distinct shape is a multi-second XLA
    recompile.
    """
    import numpy as np
    from dagsfm_tpu.ops.triangulation import track_blocks_from_obs

    P = arrays.points_xyz.shape[0]
    N = arrays.obs_xy.shape[0]
    opn = np.asarray(arrays.obs_point)
    omn = np.asarray(arrays.obs_mask)
    if omn.any():
        actual = int(np.bincount(opn[omn], minlength=P).max())
        if reuse_shapes:
            t = 4
            while t < actual:
                t *= 2
        else:
            t = max(4, -(-actual // 4) * 4)
        max_track_len = min(max_track_len, t)
    # group observation indices by point (vectorized: stable sort by
    # point id, slot position = rank within group; overflow slots are
    # dropped below)
    trk_obs = np.zeros((P, max_track_len), np.int32)
    trk_mask = np.zeros((P, max_track_len), bool)
    op = np.asarray(arrays.obs_point)
    om = np.asarray(arrays.obs_mask)
    live0 = np.nonzero(om)[0]
    order = np.argsort(op[live0], kind="stable")
    sorted_n = live0[order]
    sorted_p = op[sorted_n]
    starts = np.searchsorted(sorted_p, np.arange(P))
    sizes = np.bincount(sorted_p, minlength=P)
    pos = np.arange(len(sorted_n)) - starts[sorted_p]
    # overflowing tracks are decimated uniformly across the track (not
    # truncated to the first T observations, which would bias the kept
    # views toward low image ids — the ref caps track length the same
    # way but on unordered sets, max_track_length at
    # distributed_mapper_controller.h:52-56)
    sz = sizes[sorted_p]
    T = max_track_len
    # per-track PHASE rotation (Knuth hash of the point id): without it
    # every track keeps the same relative positions, and since tracks
    # share camera order, the SAME ~T images receive all decimated
    # observations while the rest are starved of constraints (observed:
    # 100-camera scene where 16 images held 4.2k obs each and 84 held
    # ~0 — skewing both conditioning and the (I, M) layout's padding)
    szc = np.maximum(sz, 1)
    phase = (sorted_p.astype(np.int64) * 2654435761) % szc
    posr = (pos + phase) % szc
    keep = (posr * T) // szc != ((posr + 1) * T) // szc
    keep |= sz <= T
    slot = np.where(sz <= T, pos, (posr * T) // szc)
    fits = keep & (slot < T)
    trk_obs[sorted_p[fits], slot[fits]] = sorted_n[fits]
    trk_mask[sorted_p[fits], slot[fits]] = True
    # observations that did not fit a track slot are dropped entirely so
    # all normal-equation blocks see the same observation set (the ref
    # caps track length the same way: max_track_length,
    # distributed_mapper_controller.h:52-56)
    kept = np.zeros(N, bool)
    kept[trk_obs[trk_mask]] = True
    om = om & kept

    I = arrays.image_qvec.shape[0]
    if const_image is None:
        const_image = np.zeros(I, bool)
    if const_points is None:
        const_points = np.zeros(P, bool)

    # IMAGE-MAJOR FLAT LAYOUT: the flat observation order IS the
    # flattened (I, M) camera-slot layout (cam_obs == arange(I*M)).
    # TPU gathers run at ~10 GB/s vs ~800 GB/s dense reads (measured:
    # a (1M, 6) gather costs 2.5 ms, the dual slot gather 5.9 ms, a
    # segment_sum 10 ms — they dominated iterative-Schur BA). With this
    # layout every camera-side reduction is a reshape+sum and every
    # obs_image-indexed gather a broadcast; only the point-side
    # permutation keeps real gathers (from small (I,·)/(P,·) tables).
    cam_slots, cam_mask = _group_obs_by_image(
        np.asarray(arrays.obs_image), om, I, reuse_shapes=reuse_shapes)
    M = cam_slots.shape[1]
    flat = cam_slots.reshape(-1)
    live_flat = cam_mask.reshape(-1)
    obs_image_c = np.repeat(np.arange(I, dtype=np.int32), M)
    obs_point_c = np.where(live_flat,
                           np.asarray(arrays.obs_point)[flat], 0)
    obs_xy_c = np.where(live_flat[:, None],
                        np.asarray(arrays.obs_xy)[flat], 0.0)
    om_c = live_flat
    newidx = np.zeros(N, np.int64)
    newidx[flat[live_flat]] = np.nonzero(live_flat)[0]
    trk_obs = np.where(trk_mask, newidx[trk_obs], 0).astype(np.int32)
    trk_img = np.where(trk_mask, obs_image_c[trk_obs], 0).astype(np.int32)
    cam_obs = np.arange(I * M, dtype=np.int32).reshape(I, M)

    C = arrays.cam_params.shape[0]
    if cam_refine is None:
        cam_refine = np.zeros((C, cm.NUM_INTRINSIC_SLOTS))

    return BAProblem(
        jnp.asarray(arrays.image_qvec, dtype),
        jnp.asarray(arrays.image_tvec, dtype),
        jnp.asarray(arrays.image_camidx),
        jnp.asarray(arrays.cam_model_id),
        jnp.asarray(arrays.cam_params, dtype),
        jnp.asarray(arrays.points_xyz, dtype),
        jnp.asarray(obs_image_c),
        jnp.asarray(obs_point_c),
        jnp.asarray(obs_xy_c, dtype),
        jnp.asarray(om_c),
        jnp.asarray(trk_obs),
        jnp.asarray(trk_mask),
        jnp.asarray(trk_img),
        jnp.asarray(cam_obs),
        jnp.asarray(cam_mask),
        jnp.asarray(const_image),
        jnp.asarray(const_points),
        jnp.asarray(cam_refine, dtype),
    )


def _group_obs_by_image(obs_image, obs_mask, num_images: int,
                        reuse_shapes: bool = False):
    """(I, M) observation-index slots grouped by image (dual of trk_obs).

    M = max live observations of any image. reuse_shapes rounds M to a
    POWER OF TWO (M is a jit shape key and the per-image max grows
    continuously across an incremental run — fine rounding recompiled
    nearly every BA call); tight mode rounds to a multiple of 8.
    """
    import numpy as np
    oi = np.asarray(obs_image)
    om = np.asarray(obs_mask)
    live = np.nonzero(om)[0]
    counts = np.bincount(oi[live], minlength=num_images)
    peak = int(counts.max(initial=0))
    if reuse_shapes:
        M = 8
        while M < peak:
            M *= 2
    else:
        M = max(8, -(-peak // 8) * 8)
    cam_obs = np.zeros((num_images, M), np.int32)
    cam_mask = np.zeros((num_images, M), bool)
    order = np.argsort(oi[live], kind="stable")
    sorted_live = live[order]
    sorted_i = oi[sorted_live]
    starts = np.searchsorted(sorted_i, np.arange(num_images))
    pos = np.arange(len(sorted_live)) - starts[sorted_i]
    cam_obs[sorted_i, pos] = sorted_live
    cam_mask[sorted_i, pos] = True
    return cam_obs, cam_mask


# ---------------------------------------------------------------------------
# image-major layout helpers (make_problem guarantees the flat obs order
# is the flattened (I, M) camera-slot layout)
# ---------------------------------------------------------------------------

def _cam_slot_view(z: jax.Array, prob: BAProblem) -> jax.Array:
    """(N, ...) per-obs -> (I, M, ...) camera-slot view: a pure reshape
    (no gather) under the image-major layout."""
    I, M = prob.cam_obs.shape
    return z.reshape((I, M) + z.shape[1:])


def _expand_cam(x: jax.Array, prob: BAProblem) -> jax.Array:
    """(I, ...) per-image -> (N, ...) per-obs: broadcast, replacing the
    x[prob.obs_image] gather."""
    I, M = prob.cam_obs.shape
    return jnp.broadcast_to(
        x[:, None], (I, M) + x.shape[1:]).reshape((I * M,) + x.shape[1:])


# ---------------------------------------------------------------------------
# residuals & jacobians
# ---------------------------------------------------------------------------

def _project_one(dcam, dpt, dint, qvec, tvec, model_id, params, xyz, xy):
    """Residual for one observation with local increments.

    dcam (6,): so(3) rotation increment + translation delta.
    dpt (3,): point delta. dint (8,): intrinsics increment
    (cameras.apply_intrinsics_delta slot layout).
    """
    dq = rops.angleaxis_to_quat(dcam[:3])
    q = rops.quat_multiply(dq, qvec)
    t = tvec + dcam[3:]
    X = xyz + dpt
    Xc = rops.quat_rotate(q, X) + t
    params = cm.apply_intrinsics_delta(model_id, params, dint)
    proj = cm.img_from_cam(model_id, params, Xc)
    r = proj - xy
    # behind-camera guard: keep residual finite, large
    bad = Xc[2] < 1e-6
    return jnp.where(bad, 1e3 * jnp.ones_like(r), r)


def _project_one_pinhole(dcam, dpt, qvec, tvec, params, xyz, xy):
    """SIMPLE_PINHOLE/PINHOLE residual without the model switch."""
    dq = rops.angleaxis_to_quat(dcam[:3])
    q = rops.quat_multiply(dq, qvec)
    t = tvec + dcam[3:]
    Xc = rops.quat_rotate(q, xyz + dpt) + t
    z = jnp.where(jnp.abs(Xc[2]) < 1e-12, 1e-12, Xc[2])
    # params[0]=f or fx; single-focal layout (f, cx, cy) vs (fx, fy, cx, cy)
    # is resolved by the caller packing (fx, fy, cx, cy) into slots 0-3
    proj = Xc[:2] / z * params[:2] + params[2:4]
    r = proj - xy
    return jnp.where(Xc[2] < 1e-6, 1e3 * jnp.ones_like(r), r)


def _is_double_focal(model_id):
    # delegate to the camera module's layout table so new models can't
    # silently diverge from the param layout used here
    return ~cm._is_single_focal(model_id)


def _pinhole_fparams_from(cam_params, cam_model_id):
    """(C, 4) = (fx, fy, cx, cy) for pinhole-family cameras."""
    p = cam_params
    single = ~_is_double_focal(cam_model_id)
    fx = p[:, 0]
    fy = jnp.where(single, p[:, 0], p[:, 1])
    cx = jnp.where(single, p[:, 1], p[:, 2])
    cy = jnp.where(single, p[:, 2], p[:, 3])
    return jnp.stack([fx, fy, cx, cy], axis=-1)


def _pinhole_fparams(prob: BAProblem):
    return _pinhole_fparams_from(prob.cam_params, prob.cam_model_id)


def _residuals_and_jacobians(prob: BAProblem, refine_int: bool,
                             pinhole_only: bool = False):
    """Batched (r (N,2), Jc (N,2,6), Jp (N,2,3), Jg (N,2,8)).

    Jg is the intrinsics-increment Jacobian masked by the observation's
    camera cam_refine row; all-zero when refine_int is False (static —
    the jacfwd over dint is skipped entirely).
    """
    q = _expand_cam(prob.image_qvec, prob)
    t = _expand_cam(prob.image_tvec, prob)
    cidx = _expand_cam(prob.image_camidx, prob)
    mid = _expand_cam(prob.cam_model_id[prob.image_camidx], prob)
    par = _expand_cam(prob.cam_params[prob.image_camidx], prob)
    X = prob.points[prob.obs_point]

    G = cm.NUM_INTRINSIC_SLOTS
    zeros6 = jnp.zeros(6, prob.obs_xy.dtype)
    zeros3 = jnp.zeros(3, prob.obs_xy.dtype)
    zerosG = jnp.zeros(G, prob.obs_xy.dtype)

    if pinhole_only and not refine_int:
        fpar = _expand_cam(_pinhole_fparams(prob)[prob.image_camidx], prob)

        def one_ph(qv, tv, p4, x, xy):
            f = lambda dc, dp: _project_one_pinhole(dc, dp, qv, tv, p4,
                                                    x, xy)
            r = f(zeros6, zeros3)
            Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(zeros6, zeros3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(one_ph)(q, t, fpar, X, prob.obs_xy)
        return r, Jc, Jp, jnp.zeros(r.shape + (G,), r.dtype)

    if not refine_int:
        def one(qv, tv, m, p, x, xy):
            f = lambda dc, dp: _project_one(dc, dp, zerosG, qv, tv, m, p,
                                            x, xy)
            r = f(zeros6, zeros3)
            Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(zeros6, zeros3)
            return r, Jc, Jp

        r, Jc, Jp = jax.vmap(one)(q, t, mid, par, X, prob.obs_xy)
        return r, Jc, Jp, jnp.zeros(r.shape + (G,), r.dtype)

    def one(qv, tv, m, p, x, xy):
        f = lambda dc, dp, dg: _project_one(dc, dp, dg, qv, tv, m, p, x, xy)
        r = f(zeros6, zeros3, zerosG)
        Jc, Jp, Jg = jax.jacfwd(f, argnums=(0, 1, 2))(zeros6, zeros3,
                                                      zerosG)
        return r, Jc, Jp, Jg

    r, Jc, Jp, Jg = jax.vmap(one)(q, t, mid, par, X, prob.obs_xy)
    Jg = Jg * prob.cam_refine[cidx][:, None, :]
    return r, Jc, Jp, Jg


def _robust_weights(r2: jax.Array, loss: str, scale: float):
    """IRLS weight ρ'(s) for squared residual s (ref: Ceres loss funcs)."""
    s = r2 / (scale * scale)
    if loss == "trivial":
        return jnp.ones_like(r2)
    if loss == "huber":
        return jnp.where(s <= 1.0, 1.0, 1.0 / jnp.sqrt(jnp.maximum(s, 1e-18)))
    if loss == "cauchy":
        return 1.0 / (1.0 + s)
    raise ValueError(loss)


def _robust_cost(r2: jax.Array, loss: str, scale: float):
    c2 = scale * scale
    s = r2 / c2
    if loss == "trivial":
        return r2
    if loss == "huber":
        return jnp.where(s <= 1.0, r2, c2 * (2.0 * jnp.sqrt(
            jnp.maximum(s, 1e-18)) - 1.0))
    if loss == "cauchy":
        return c2 * jnp.log1p(s)
    raise ValueError(loss)


# ---------------------------------------------------------------------------
# Schur-complement normal equations
# ---------------------------------------------------------------------------


def _inv3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate/det).

    jnp.linalg.inv lowers to per-matrix LU on TPU (slow for (P,3,3)
    batches); the adjugate form is pure VPU elementwise math."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    J = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([jnp.stack([A, B, C], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, J], -1)], -2)
    return adj / det[..., None, None]

def _build_and_solve_matmul(prob: BAProblem, r_w, Jc_w, Jp_w, lam,
                            opts: BAOptions):
    """Scatter-free Schur step: every segment reduction is a gather or a
    one-hot einsum, so the whole assembly runs on the MXU.

    TPU scatters serialize; the reference's CPU code (Ceres CHOLMOD,
    optim/bundle_adjustment.cc:273-284) has no analog of this constraint.
    Point-indexed sums (V, gp) go through the track gather
    (trk_obs/trk_mask); camera-indexed sums (U, gc, b, S) go through
    one-hot matmuls over the (small) camera axis.

    Requires every active observation to appear in a track slot —
    make_problem masks overflow observations to guarantee it.
    """
    I = prob.image_qvec.shape[0]
    P = prob.points.shape[0]
    dtype = r_w.dtype
    eyeC = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    E = jax.nn.one_hot(prob.obs_image, I, dtype=dtype)      # (N, I)
    # U (I,6,6), gc (I,6) via one-hot matmul
    JcJc = jnp.einsum("nri,nrj->nij", Jc_w, Jc_w)
    U = jnp.einsum("ni,nab->iab", E, JcJc)
    gcn = jnp.einsum("nra,nr->na", Jc_w, r_w)
    # V (P,3,3), gp (P,3) via track gathers
    tmask = prob.trk_mask.astype(dtype)[..., None, None]
    Jp_slot = Jp_w[prob.trk_obs] * tmask                    # (P,T,2,3)
    r_slot = r_w[prob.trk_obs] * tmask[..., 0]
    V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, r_slot)

    U = U + lam * eyeC[None] * jnp.maximum(
        jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)[..., None]
    Vd = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
        + opts.point_damping) * eye3[None]
    Vinv = _inv3(Vd + 1e-12 * eye3[None])          # (P,3,3)

    # per-observation W and Y (gathers only)
    W = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w)              # (N,6,3)
    Y = jnp.einsum("nij,njk->nik", W, Vinv[prob.obs_point])  # (N,6,3)
    corr = jnp.einsum("nik,nk->ni", Y, gp[prob.obs_point])  # (N,6)
    b = -jnp.einsum("ni,na->ia", E, gcn + corr)             # (I,6)

    # S = U_diag - sum_p A_p B_pᵀ with per-point, per-camera aggregates
    E_slot = E[prob.trk_obs] * tmask[..., 0]                # (P,T,I)
    Y_slot = Y[prob.trk_obs] * tmask                        # (P,T,6,3)
    W_slot = W[prob.trk_obs] * tmask
    A = jnp.einsum("pti,ptak->piak", E_slot, Y_slot)        # (P,I,6,3)
    B = jnp.einsum("pti,ptak->piak", E_slot, W_slot)        # (P,I,6,3)
    S = -jnp.einsum("piak,pjbk->ijab", A, B)                # (I,I,6,6)
    S = S.at[jnp.arange(I), jnp.arange(I)].add(U)

    free = (~prob.const_image).astype(dtype)
    Sm = S * free[:, None, None, None] * free[None, :, None, None]
    Sm = Sm.at[jnp.arange(I), jnp.arange(I)].add(
        (1.0 - free)[:, None, None] * eyeC[None])
    b = b * free[:, None]

    Sfull = Sm.transpose(0, 2, 1, 3).reshape(I * 6, I * 6)
    Sfull = 0.5 * (Sfull + Sfull.T)
    L, low = jax.scipy.linalg.cho_factor(
        Sfull + 1e-10 * jnp.eye(I * 6, dtype=dtype))
    dcam = jax.scipy.linalg.cho_solve((L, low),
                                      b.reshape(I * 6)).reshape(I, 6)

    # back-substitute points: dx_p = Vinv (gp - sum_k W_kᵀ dcam_{i_k})
    dc_slots = dcam[prob.obs_image[prob.trk_obs]] * \
        prob.trk_mask[..., None]                            # (P,T,6)
    wtd = jnp.einsum("ptij,pti->pj", W_slot, dc_slots)      # (P,3)
    dpt = jnp.einsum("pij,pj->pi", Vinv, gp - wtd)
    dpt = dpt * (~prob.const_points)[:, None].astype(dtype)
    dcam = dcam * free[:, None]
    return dcam, dpt


def _build_and_solve_joint(prob: BAProblem, r_w, Jc_w, Jp_w, Jg_w, lam,
                           opts: BAOptions):
    """Dense joint camera-side Schur solve: poses (I,6) + per-camera
    intrinsics (C,8) eliminated together, points Schur-eliminated.

    Mirrors the reference's Ceres behavior where camera intrinsics are
    ordinary variable blocks in the reduced camera system
    (optim/bundle_adjustment.cc:338; refine flags at
    bundle_adjustment.h:97-162). Intrinsics of a camera shared by many
    images form ONE block — all observations of all its images
    contribute, via a (N,C) one-hot fold (scatter-free, MXU-shaped).

    Returns (dcam (I,6), dint (C,8), dpt (P,3)).
    """
    I = prob.image_qvec.shape[0]
    C = prob.cam_params.shape[0]
    G = Jg_w.shape[-1]
    dtype = r_w.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eyeG = jnp.eye(G, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    cidx = prob.image_camidx[prob.obs_image]                # (N,)
    E = jax.nn.one_hot(prob.obs_image, I, dtype=dtype)      # (N, I)
    F = jax.nn.one_hot(cidx, C, dtype=dtype)                # (N, C)
    camhot = jax.nn.one_hot(prob.image_camidx, C, dtype=dtype)  # (I, C)

    # direct camera-side normal-equation terms
    U_pp = jnp.einsum("ni,nra,nrb->iab", E, Jc_w, Jc_w)     # (I,6,6)
    U_gg = jnp.einsum("nc,nra,nrb->cab", F, Jg_w, Jg_w)     # (C,G,G)
    # pose-intrinsics cross term of image i lives at block (i, cam(i))
    U_pg = jnp.einsum("ni,nra,nrb->iab", E, Jc_w, Jg_w)     # (I,6,G)
    g_p = -jnp.einsum("ni,nra,nr->ia", E, Jc_w, r_w)        # (I,6)
    g_g = -jnp.einsum("nc,nra,nr->ca", F, Jg_w, r_w)        # (C,G)

    # point blocks
    tmask = prob.trk_mask.astype(dtype)[..., None, None]
    Jp_slot = Jp_w[prob.trk_obs] * tmask
    r_slot = r_w[prob.trk_obs] * tmask[..., 0]
    V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, r_slot)

    U_ppd = U_pp + lam * eye6[None] * jnp.maximum(
        jnp.diagonal(U_pp, axis1=-2, axis2=-1), 1e-6)[..., None]
    U_ggd = U_gg + lam * eyeG[None] * jnp.maximum(
        jnp.diagonal(U_gg, axis1=-2, axis2=-1), 1e-6)[..., None]
    Vd = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
        + opts.point_damping) * eye3[None]
    Vinv = _inv3(Vd + 1e-12 * eye3[None])

    Wc = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w)             # (N,6,3)
    Wg = jnp.einsum("nri,nrj->nij", Jg_w, Jp_w)             # (N,G,3)
    Yc = jnp.einsum("nij,njk->nik", Wc, Vinv[prob.obs_point])
    Yg = jnp.einsum("nij,njk->nik", Wg, Vinv[prob.obs_point])
    gpo = gp[prob.obs_point]
    g_p = g_p - jnp.einsum("ni,nak,nk->ia", E, Yc, gpo)
    g_g = g_g - jnp.einsum("nc,nak,nk->ca", F, Yg, gpo)

    # Schur corrections via per-point block aggregates
    t0 = tmask[..., 0]
    E_slot = E[prob.trk_obs] * t0                           # (P,T,I)
    F_slot = F[prob.trk_obs] * t0                           # (P,T,C)
    Yc_slot = Yc[prob.trk_obs] * tmask
    Wc_slot = Wc[prob.trk_obs] * tmask
    Yg_slot = Yg[prob.trk_obs] * tmask
    Wg_slot = Wg[prob.trk_obs] * tmask
    A_c = jnp.einsum("pti,ptak->piak", E_slot, Yc_slot)     # (P,I,6,3)
    B_c = jnp.einsum("pti,ptak->piak", E_slot, Wc_slot)
    A_g = jnp.einsum("ptc,ptak->pcak", F_slot, Yg_slot)     # (P,C,G,3)
    B_g = jnp.einsum("ptc,ptak->pcak", F_slot, Wg_slot)
    S_pp = -jnp.einsum("piak,pjbk->ijab", A_c, B_c)
    S_pg = -jnp.einsum("piak,pcbk->icab", A_c, B_g)         # (I,C,6,G)
    S_gg = -jnp.einsum("pcak,pdbk->cdab", A_g, B_g)
    S_pp = S_pp.at[jnp.arange(I), jnp.arange(I)].add(U_ppd)
    S_gg = S_gg.at[jnp.arange(C), jnp.arange(C)].add(U_ggd)
    S_pg = S_pg + camhot[:, :, None, None] * U_pg[:, None, :, :]

    # assemble symmetric (D, D), D = I*6 + C*G
    Spp = S_pp.transpose(0, 2, 1, 3).reshape(I * 6, I * 6)
    Spg = S_pg.transpose(0, 2, 1, 3).reshape(I * 6, C * G)
    Sgg = S_gg.transpose(0, 2, 1, 3).reshape(C * G, C * G)
    Sfull = jnp.concatenate([
        jnp.concatenate([Spp, Spg], axis=1),
        jnp.concatenate([Spg.T, Sgg], axis=1)], axis=0)
    bfull = jnp.concatenate([g_p.reshape(-1), g_g.reshape(-1)])

    free_p = (~prob.const_image).astype(dtype)
    freevec = jnp.concatenate([
        jnp.repeat(free_p, 6),
        (prob.cam_refine > 0).astype(dtype).reshape(-1)])
    Sfull = Sfull * freevec[:, None] * freevec[None, :] + \
        jnp.diag(1.0 - freevec)
    bfull = bfull * freevec
    Sfull = 0.5 * (Sfull + Sfull.T)
    D = I * 6 + C * G
    L, low = jax.scipy.linalg.cho_factor(
        Sfull + 1e-10 * jnp.eye(D, dtype=dtype))
    sol = jax.scipy.linalg.cho_solve((L, low), bfull) * freevec
    dcam = sol[: I * 6].reshape(I, 6)
    dint = sol[I * 6:].reshape(C, G)

    # back-substitute points
    dc_slots = dcam[prob.obs_image[prob.trk_obs]] * prob.trk_mask[..., None]
    dg_slots = dint[cidx[prob.trk_obs]] * prob.trk_mask[..., None]
    wtd = jnp.einsum("ptij,pti->pj", Wc_slot, dc_slots) + \
        jnp.einsum("ptij,pti->pj", Wg_slot, dg_slots)
    dpt = jnp.einsum("pij,pj->pi", Vinv, gp - wtd)
    dpt = dpt * (~prob.const_points)[:, None].astype(dtype)
    return dcam * free_p[:, None], dint, dpt


def _build_and_solve_iterative_joint(prob: BAProblem, r_w, Jc_w, Jp_w,
                                     Jg_w, lam, opts: BAOptions,
                                     x_init=None):
    """ITERATIVE_SCHUR with intrinsics: matrix-free PCG on the joint
    camera-side system (poses + per-camera intrinsics), SCHUR_JACOBI
    block preconditioner (pose blocks + intrinsics blocks, coupling
    dropped from the preconditioner only).

    Intrinsic-block reductions happen in two scatter-free hops:
    per-image sums through cam_obs slots, then an (I,C) one-hot fold —
    the (N,C) one-hot never materializes.
    """
    I = prob.image_qvec.shape[0]
    C = prob.cam_params.shape[0]
    G = Jg_w.shape[-1]
    dtype = r_w.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eyeG = jnp.eye(G, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    free = (~prob.const_image).astype(dtype)
    gfree = (prob.cam_refine > 0).astype(dtype)             # (C,G)
    camhot = jax.nn.one_hot(prob.image_camidx, C, dtype=dtype)  # (I,C)
    cidx = _expand_cam(prob.image_camidx, prob)

    cmask = prob.cam_mask.astype(dtype)[..., None, None]
    Jc_slot = _cam_slot_view(Jc_w, prob) * cmask            # (I,M,2,6)
    Jg_slot = _cam_slot_view(Jg_w, prob) * cmask            # (I,M,2,G)
    rc_slot = _cam_slot_view(r_w, prob) * cmask[..., 0]
    U_pp = jnp.einsum("imra,imrb->iab", Jc_slot, Jc_slot)
    U_gg_img = jnp.einsum("imra,imrb->iab", Jg_slot, Jg_slot)  # (I,G,G)
    U_pg = jnp.einsum("imra,imrb->iab", Jc_slot, Jg_slot)   # (I,6,G)
    gc = -jnp.einsum("imra,imr->ia", Jc_slot, rc_slot)
    gg_img = -jnp.einsum("imra,imr->ia", Jg_slot, rc_slot)  # (I,G)
    U_gg = jnp.einsum("ic,iab->cab", camhot, U_gg_img)      # (C,G,G)
    gg = jnp.einsum("ic,ia->ca", camhot, gg_img)            # (C,G)

    tmask = prob.trk_mask.astype(dtype)[..., None, None]
    Jp_slot = Jp_w[prob.trk_obs] * tmask
    rp_slot = r_w[prob.trk_obs] * tmask[..., 0]
    V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, rp_slot)

    U_ppd = U_pp + lam * eye6[None] * jnp.maximum(
        jnp.diagonal(U_pp, axis1=-2, axis2=-1), 1e-6)[..., None]
    U_ggd = U_gg + lam * eyeG[None] * jnp.maximum(
        jnp.diagonal(U_gg, axis1=-2, axis2=-1), 1e-6)[..., None]
    Vd = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
        + opts.point_damping) * eye3[None]
    Vinv = _inv3(Vd + 1e-12 * eye3[None])

    obs_live = prob.obs_mask.astype(dtype)[:, None, None]
    Wc = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w) * obs_live  # (N,6,3)
    Wg = jnp.einsum("nri,nrj->nij", Jg_w, Jp_w) * obs_live  # (N,G,3)
    WcVinv = jnp.einsum("nij,njk->nik", Wc, Vinv[prob.obs_point])
    WgVinv = jnp.einsum("nij,njk->nik", Wg, Vinv[prob.obs_point])

    def cam_reduce(z):
        return _cam_slot_view(z, prob).sum(axis=1)          # (I, ...)

    def fold(z_img):
        return jnp.einsum("ic,ia->ca", camhot, z_img)       # (C, ...)

    gpo = gp[prob.obs_point]
    b_p = gc - cam_reduce(jnp.einsum("nik,nk->ni", WcVinv, gpo))
    b_g = gg - fold(cam_reduce(jnp.einsum("nik,nk->ni", WgVinv, gpo)))
    b_p = b_p * free[:, None]
    b_g = b_g * gfree

    # SCHUR_JACOBI: diagonal pose + intrinsics blocks of S (segment-sum
    # reduce — see _obs_reduce_wide for the TPU kernel-fault workaround)
    Bc = jnp.einsum("nik,njk->nij", WcVinv, Wc)
    Sdiag_p = U_ppd - _obs_reduce_wide(
        Bc.reshape(-1, 36), prob, I).reshape(I, 6, 6)
    Sdiag_p = Sdiag_p * free[:, None, None] + \
        (1.0 - free)[:, None, None] * eye6[None]
    Sdiag_p = 0.5 * (Sdiag_p + jnp.swapaxes(Sdiag_p, -1, -2)) \
        + 1e-10 * eye6[None]
    Minv_p = jnp.linalg.solve(Sdiag_p, jnp.broadcast_to(
        eye6, Sdiag_p.shape))
    Bg = jnp.einsum("nik,njk->nij", WgVinv, Wg)
    Sdiag_g = U_ggd - fold(_obs_reduce_wide(
        Bg.reshape(-1, G * G), prob, I).reshape(I, G * G)).reshape(C, G, G)
    gf2 = gfree[:, :, None] * gfree[:, None, :]
    Sdiag_g = Sdiag_g * gf2 + (1.0 - gfree)[:, :, None] * eyeG[None] * \
        jnp.ones((C, 1, 1), dtype)
    Sdiag_g = 0.5 * (Sdiag_g + jnp.swapaxes(Sdiag_g, -1, -2)) \
        + 1e-10 * eyeG[None]
    Minv_g = jnp.linalg.solve(Sdiag_g, jnp.broadcast_to(
        eyeG, Sdiag_g.shape))

    # point-major copies hoisted out of the CG loop (see the non-joint
    # solver: per-matvec (N,·)-table gathers were the round-4 bottleneck)
    tmask3 = prob.trk_mask[..., None].astype(dtype)
    Wc_pt = Wc[prob.trk_obs] * tmask                        # (P,T,6,3)
    Wg_pt = Wg[prob.trk_obs] * tmask                        # (P,T,G,3)
    trk_img = prob.trk_img                                   # (P,T)
    trk_cam = prob.image_camidx[trk_img]                     # (P,T)

    def S_mv(xp, xg):
        xpm = xp * free[:, None]
        xgm = xg * gfree
        tmp = jnp.einsum("ptij,pti->pj", Wc_pt, xpm[trk_img]) + \
            jnp.einsum("ptij,pti->pj", Wg_pt, xgm[trk_cam])  # (P,3)
        y = jnp.einsum("pij,pj->pi", Vinv, tmp)
        yo = y[prob.obs_point]
        zc = cam_reduce(jnp.einsum("nij,nj->ni", Wc, yo))    # (I,6)
        zg = fold(cam_reduce(jnp.einsum("nij,nj->ni", Wg, yo)))  # (C,G)
        Sxp = jnp.einsum("iab,ib->ia", U_ppd, xpm) + \
            jnp.einsum("iab,ib->ia", U_pg, xgm[prob.image_camidx]) - zc
        Sxg = jnp.einsum("cab,cb->ca", U_ggd, xgm) + \
            fold(jnp.einsum("iab,ia->ib", U_pg, xpm)) - zg
        Sxp = Sxp * free[:, None] + xp * (1.0 - free)[:, None]
        Sxg = Sxg * gfree + xg * (1.0 - gfree)
        return Sxp, Sxg

    def precond(vp, vg):
        return (jnp.einsum("iab,ib->ia", Minv_p, vp),
                jnp.einsum("cab,cb->ca", Minv_g, vg))

    def dot(ap, ag, bp, bg):
        return jnp.sum(ap * bp) + jnp.sum(ag * bg)

    bnorm = jnp.sqrt(dot(b_p, b_g, b_p, b_g))
    tol = opts.linear_rtol * jnp.maximum(bnorm, 1e-30)

    if x_init is None:
        xp0 = jnp.zeros_like(b_p)
        xg0 = jnp.zeros_like(b_g)
        rp0, rg0 = b_p, b_g
    else:
        xp0 = x_init * free[:, None]
        xg0 = jnp.zeros_like(b_g)
        Ap0, Ag0 = S_mv(xp0, xg0)
        rp0, rg0 = b_p - Ap0, b_g - Ag0
    zp0, zg0 = precond(rp0, rg0)
    rz0 = dot(rp0, rg0, zp0, zg0)

    def cond(state):
        k, _, _, rp, rg, _, _, _ = state
        return (k < opts.max_linear_iterations) & \
            (jnp.sqrt(dot(rp, rg, rp, rg)) > tol)

    def body(state):
        k, xp, xg, rp, rg, pp, pg, rz = state
        Ap, Ag = S_mv(pp, pg)
        pAp = dot(pp, pg, Ap, Ag)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        xp = xp + alpha * pp
        xg = xg + alpha * pg
        rp = rp - alpha * Ap
        rg = rg - alpha * Ag
        zp, zg = precond(rp, rg)
        rz_new = dot(rp, rg, zp, zg)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        return k + 1, xp, xg, rp, rg, zp + beta * pp, zg + beta * pg, rz_new

    _, dcam, dint, *_ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), xp0, xg0, rp0, rg0, zp0, zg0, rz0))
    dcam = dcam * free[:, None]
    dint = dint * gfree

    dc_slots = dcam[trk_img] * tmask3
    dg_slots = dint[trk_cam] * tmask3
    wtd = jnp.einsum("ptij,pti->pj", Wc_pt, dc_slots) + \
        jnp.einsum("ptij,pti->pj", Wg_pt, dg_slots)
    dpt = jnp.einsum("pij,pj->pi", Vinv, gp - wtd)
    dpt = dpt * (~prob.const_points)[:, None].astype(dtype)
    return dcam, dint, dpt


def _obs_reduce_wide(z, prob, num_images: int):
    """Per-observation (N, K) payload -> per-image (I, K) sums.

    Under the image-major layout this is a masked reshape+sum — a dense
    bandwidth-bound reduce with no gather and no scatter. (History: the
    round-3 gather-based slot reduce hit an XLA:TPU kernel fault at
    ~400k observations with M=512, and its segment_sum replacement cost
    10 ms per call at 1M obs; both are gone with the layout change.)"""
    zm = z * prob.obs_mask[:, None].astype(z.dtype)
    return _cam_slot_view(zm, prob).sum(axis=1)


def _build_and_solve_iterative(prob: BAProblem, r_w, Jc_w, Jp_w, lam,
                               opts: BAOptions, x_init=None):
    """ITERATIVE_SCHUR regime: SCHUR_JACOBI-preconditioned CG on the
    reduced camera system, never materializing S as (I,I,6,6).

    Mirrors the reference's large-scene pick
    (/root/reference/src/optim/bundle_adjustment.cc:273-284: >1000 images
    -> ITERATIVE_SCHUR + SCHUR_JACOBI). The matvec S·x is matrix-free,
    scatter-free AND (camera-side) gather-free under the image-major
    layout:

        S·x = U_damped·x − W V⁻¹ Wᵀ·x
        Wᵀ·x : x broadcast per-obs (layout), folded straight to points
               through the point-major W copy (W_pt) in one einsum;
        W·y  : y gathered at obs_point (small (P,3) table) + block
               product, camera-reduced by a reshape+sum.

    TPU gather cost is proportional to gathered ROW BYTES (~6.5 GB/s
    effective vs ~80 GB/s dense, measured round 5), so the build phase
    gathers only narrow rows: one (P,T)-slot gather of [Jp_w | r_w]
    (32 B rows — the 104 B payload that also carried W cost 3x) and one
    obs-level gather of the packed point table [Vinv | Vinv·gp] (48 B
    rows, replacing separate Vinv and gp gathers). W is never gathered:
    every Wᵀ·(camera vector) product is formed at OBS level, where the
    camera vector broadcasts for free under the image-major layout, and
    only the narrow (·,3) result is gathered into track slots. x_init
    warm-starts CG from the previous LM iteration's solution
    (Ceres-style), typically halving CG iterations once LM settles.
    """
    I = prob.image_qvec.shape[0]
    dtype = r_w.dtype
    eyeC = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    free = (~prob.const_image).astype(dtype)

    # per-camera blocks U, gc via camera-slot reshapes (layout)
    cmask = prob.cam_mask.astype(dtype)[..., None, None]
    Jc_slot = _cam_slot_view(Jc_w, prob) * cmask            # (I,M,2,6)
    rc_slot = _cam_slot_view(r_w, prob) * cmask[..., 0]     # (I,M,2)
    U = jnp.einsum("imra,imrb->iab", Jc_slot, Jc_slot)      # (I,6,6)
    gc = -jnp.einsum("imra,imr->ia", Jc_slot, rc_slot)      # (I,6)

    # point-major copies: ONE narrow (P,T)-slot gather of [Jp_w | r_w]
    # (32 B rows) per linear solve — W deliberately NOT in the payload
    # (it is never needed track-major; see docstring).
    obs_live = prob.obs_mask.astype(dtype)[:, None, None]
    W = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w) * obs_live   # (N,6,3)
    payload = jnp.concatenate([Jp_w.reshape(-1, 6), r_w], axis=1)  # (N,8)
    tmask = prob.trk_mask.astype(dtype)[..., None]
    slot = payload[prob.trk_obs] * tmask                    # (P,T,8)
    Jp_slot = slot[..., :6].reshape(*slot.shape[:2], 2, 3)
    rp_slot = slot[..., 6:8]
    V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, rp_slot)

    Ud = U + lam * eyeC[None] * jnp.maximum(
        jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)[..., None]
    Vd = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
        + opts.point_damping) * eye3[None]
    Vinv = _inv3(Vd + 1e-12 * eye3[None])                   # (P,3,3)

    # one packed obs-level gather of the point tables: [Vinv | Vinv·gp]
    # (48 B rows) instead of separate Vinv (36 B) + gp (12 B) gathers
    u = jnp.einsum("pij,pj->pi", Vinv, gp)                  # (P,3)
    G_obs = jnp.concatenate(
        [Vinv.reshape(-1, 9), u], axis=1)[prob.obs_point]   # (N,12)
    Vinv_obs = G_obs[:, :9].reshape(-1, 3, 3)
    WVinv = jnp.einsum("nij,njk->nik", W, Vinv_obs)         # (N,6,3)

    def cam_reduce(z):
        """(N,K) per-obs values -> (I,K) sums by image (reshape+sum)."""
        return _cam_slot_view(z, prob).sum(axis=1)

    # rhs: b = gc − W (V⁻¹ gp), camera-reduced — u already per point
    b = gc - cam_reduce(jnp.einsum("nij,nj->ni", W, G_obs[:, 9:]))
    b = b * free[:, None]

    # SCHUR_JACOBI preconditioner: diagonal blocks of S via the slot-view
    # einsum — the (N,36) B tensor is never materialized (writing+
    # re-reading it cost ~316 MB of HBM traffic per LM iteration)
    Sdiag = Ud - jnp.einsum("imak,imbk->iab",
                            _cam_slot_view(WVinv, prob),
                            _cam_slot_view(W, prob))
    Sdiag = Sdiag * free[:, None, None] + \
        (1.0 - free)[:, None, None] * eyeC[None]
    Sdiag = 0.5 * (Sdiag + jnp.swapaxes(Sdiag, -1, -2)) + 1e-10 * eyeC[None]
    Minv = jnp.linalg.solve(Sdiag, jnp.broadcast_to(eyeC, Sdiag.shape))

    tmask_t = prob.trk_mask.astype(dtype)[..., None]         # (P,T,1)

    def point_reduce(s):
        """(N,3) per-obs values -> (P,3) sums by track: one narrow
        12 B-row gather into track slots + masked sum over T."""
        return jnp.sum(s[prob.trk_obs] * tmask_t, axis=1)

    def S_mv(x):
        xm = x * free[:, None]
        x_obs = _expand_cam(xm, prob)                        # (N,6) bcast
        s = jnp.einsum("nij,ni->nj", W, x_obs)               # (N,3) Wᵀx
        y = jnp.einsum("pij,pj->pi", Vinv, point_reduce(s))
        z = jnp.einsum("nij,nj->ni", W, y[prob.obs_point])   # (N,6)
        Sx = jnp.einsum("iab,ib->ia", Ud, xm) - cam_reduce(z)
        return Sx * free[:, None] + x * (1.0 - free)[:, None]

    def precond(v):
        return jnp.einsum("iab,ib->ia", Minv, v)

    # PCG with early exit (while_loop: no wasted matvecs once converged)
    bnorm = jnp.sqrt(jnp.sum(b * b))
    tol = opts.linear_rtol * jnp.maximum(bnorm, 1e-30)

    if x_init is None:
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        x0 = x_init * free[:, None]
        r0 = b - S_mv(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(state):
        k, _, r, _, _ = state
        return (k < opts.max_linear_iterations) & \
            (jnp.sqrt(jnp.sum(r * r)) > tol)

    def body(state):
        k, x, r, p, rz = state
        Ap = S_mv(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return k + 1, x, r, p, rz_new

    _, dcam, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), x0, r0, p0, rz0))
    dcam = dcam * free[:, None]

    # back-substitute points: dx_p = Vinv (gp − Σ_k Wᵀ_k dcam_{i_k}),
    # Wᵀ·dcam formed at obs level (dcam broadcasts; only (N,3) gathered)
    sd = jnp.einsum("nij,ni->nj", W, _expand_cam(dcam, prob))
    dpt = jnp.einsum("pij,pj->pi", Vinv, gp - point_reduce(sd))
    dpt = dpt * (~prob.const_points)[:, None].astype(dtype)
    return dcam, dpt


def _refine_any(opts: BAOptions) -> bool:
    return opts.refine_focal or opts.refine_principal or opts.refine_extra


def _build_and_solve(prob: BAProblem, r, Jc, Jp, Jg, w, lam,
                     opts: BAOptions, x_init=None):
    """One damped Gauss-Newton step via dense Schur complement.

    Returns (dcam (I, 6), dint (C, 8), dpt (P, 3)). x_init warm-starts
    the iterative solvers' CG from the previous LM step's dcam.
    """
    I = prob.image_qvec.shape[0]
    P = prob.points.shape[0]
    dtype = r.dtype

    # const_image observations still constrain points; only their camera
    # jacobians vanish (masked below via camfree).
    wm = (w * prob.obs_mask.astype(dtype))[:, None, None]
    sw = jnp.sqrt(wm)
    camfree = _expand_cam(
        (~prob.const_image).astype(dtype), prob)[:, None, None]
    ptfree = (~prob.const_points)[prob.obs_point].astype(dtype)[:, None, None]
    Jc_w = Jc * sw * camfree
    Jp_w = Jp * sw * ptfree
    r_w = r * sw[..., 0]

    solver = opts.solver
    if solver == "auto":
        solver = "iterative" if I > opts.dense_threshold else "dense"

    if _refine_any(opts):
        # intrinsics observations of const images still constrain the
        # (shared) camera — weight Jg by robust weights only
        Jg_w = Jg * sw
        if solver == "iterative":
            return _build_and_solve_iterative_joint(
                prob, r_w, Jc_w, Jp_w, Jg_w, lam, opts, x_init=x_init)
        return _build_and_solve_joint(prob, r_w, Jc_w, Jp_w, Jg_w, lam,
                                      opts)

    dint0 = jnp.zeros_like(prob.cam_refine)
    if solver == "iterative":
        dcam, dpt = _build_and_solve_iterative(prob, r_w, Jc_w, Jp_w,
                                               lam, opts, x_init=x_init)
        return dcam, dint0, dpt

    T = prob.trk_obs.shape[1]
    N = r.shape[0]
    mode = opts.schur_assembly
    if mode == "auto":
        # matmul path is scatter-free (TPU-fast) but materializes
        # (N, I) / (P, T, I) one-hots and (P, I, 6, 3) blocks
        if max(N * I, P * T * I, P * I * 18) * 4 < (1 << 28):
            mode = "matmul"
        elif P * T * T * 36 * 4 < (1 << 28):
            mode = "flat"
        else:
            mode = "scan"

    if mode == "matmul":
        dcam, dpt = _build_and_solve_matmul(prob, r_w, Jc_w, Jp_w, lam,
                                            opts)
        return dcam, dint0, dpt

    # blocks
    U = jax.ops.segment_sum(
        jnp.einsum("nri,nrj->nij", Jc_w, Jc_w), prob.obs_image, I)  # (I,6,6)
    V = jax.ops.segment_sum(
        jnp.einsum("nri,nrj->nij", Jp_w, Jp_w), prob.obs_point, P)  # (P,3,3)
    W = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w)                      # (N,6,3)
    gc = -jax.ops.segment_sum(
        jnp.einsum("nri,nr->ni", Jc_w, r_w), prob.obs_image, I)     # (I,6)
    gp = -jax.ops.segment_sum(
        jnp.einsum("nri,nr->ni", Jp_w, r_w), prob.obs_point, P)     # (P,3)

    # damping (Levenberg: multiplicative on diagonal)
    eyeC = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    U = U + lam * eyeC[None] * jnp.maximum(
        jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)[..., None]
    Vd = V + (lam * jnp.maximum(
        jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
        + opts.point_damping) * eye3[None]
    Vinv = _inv3(Vd + 1e-12 * eye3[None])                  # (P,3,3)

    # per-track-slot camera index & W block
    slot_img = prob.obs_image[prob.trk_obs]            # (P, T)
    slot_W = W[prob.trk_obs] * prob.trk_mask[..., None, None]       # (P,T,6,3)
    Y = jnp.einsum("ptij,pjk->ptik", slot_W, Vinv)                  # (P,T,6,3)

    # reduced rhs: b_i = gc_i - sum_(p,k with img=i) Y[p,k] gp_p
    corr = jnp.einsum("ptij,pj->pti", Y, gp)                        # (P,T,6)
    b = gc - jax.ops.segment_sum(
        corr.reshape(-1, 6), slot_img.reshape(-1), I)

    # reduced camera matrix: S = U - sum_p Y_k W_lᵀ scattered to (i_k, i_l)
    idx_flat = (slot_img[:, :, None] * I + slot_img[:, None, :])    # (P,T,T)
    if mode == "flat":
        # one batched einsum (MXU) + one segment_sum — no sequential scan
        blocks = jnp.einsum("ptij,pskj->ptsik", Y, slot_W)  # (P,T,T,6,6)
        S = -jax.ops.segment_sum(
            blocks.reshape(-1, 36), idx_flat.reshape(-1), I * I)
        S = S.reshape(I, I, 6, 6)
    else:
        S = jnp.zeros((I, I, 6, 6), dtype)

        def body(S, kl):
            k, l = kl // T, kl % T
            blk = jnp.einsum("pij,pkj->pik", Y[:, k], slot_W[:, l])
            S = S.reshape(I * I, 6, 6).at[idx_flat[:, k, l]].add(-blk) \
                .reshape(I, I, 6, 6)
            return S, None

        S, _ = jax.lax.scan(body, S, jnp.arange(T * T))
    S = S.at[jnp.arange(I), jnp.arange(I)].add(U)

    # pin constant cameras: identity rows/cols, zero rhs
    free = (~prob.const_image).astype(dtype)
    Sm = S * free[:, None, None, None] * free[None, :, None, None]
    Sm = Sm.at[jnp.arange(I), jnp.arange(I)].add(
        (1.0 - free)[:, None, None] * eyeC[None])
    b = b * free[:, None]

    # dense solve (I*6, I*6)
    Sfull = Sm.transpose(0, 2, 1, 3).reshape(I * 6, I * 6)
    bfull = b.reshape(I * 6)
    # symmetrize for numerical safety
    Sfull = 0.5 * (Sfull + Sfull.T)
    L, low = jax.scipy.linalg.cho_factor(
        Sfull + 1e-10 * jnp.eye(I * 6, dtype=dtype))
    dcam = jax.scipy.linalg.cho_solve((L, low), bfull).reshape(I, 6)

    # back-substitute points: dx_p = Vinv (gp - sum_k W_kᵀ dcam_{i_k})
    dc_slots = dcam[slot_img] * prob.trk_mask[..., None]            # (P,T,6)
    wtd = jnp.einsum("ptij,pti->pj", slot_W, dc_slots)              # (P,3)
    dpt = jnp.einsum("pij,pj->pi", Vinv, gp - wtd)
    dpt = dpt * (~prob.const_points)[:, None].astype(dtype)
    dcam = dcam * free[:, None]
    return dcam, dint0, dpt


def _apply_step(prob: BAProblem, dcam, dpt, dint=None) -> BAProblem:
    dq = rops.angleaxis_to_quat(dcam[:, :3])
    q = rops.quat_normalize(rops.quat_multiply(dq, prob.image_qvec))
    t = prob.image_tvec + dcam[:, 3:]
    pts = prob.points + dpt
    out = prob._replace(image_qvec=q, image_tvec=t, points=pts)
    if dint is not None:
        dint = dint * prob.cam_refine
        params = jax.vmap(cm.apply_intrinsics_delta)(
            prob.cam_model_id, prob.cam_params, dint)
        out = out._replace(cam_params=params)
    return out


def compute_cost(prob: BAProblem, opts: BAOptions) -> jax.Array:
    r, *_ = _residuals_and_jacobians(prob, False)
    r2 = jnp.sum(r * r, axis=-1)
    c = _robust_cost(r2, opts.loss, opts.loss_scale)
    return jnp.sum(jnp.where(prob.obs_mask, c, 0.0))


def _plain_cost(prob: BAProblem, opts: BAOptions) -> jax.Array:
    q = _expand_cam(prob.image_qvec, prob)
    t = _expand_cam(prob.image_tvec, prob)
    X = prob.points[prob.obs_point]
    Xc = rops.quat_rotate(q, X) + t
    if opts.pinhole_only:
        # skip the 11-way camera-model switch (same cut as the
        # jacobian fast path) — big trace/HLO reduction
        fpar = _expand_cam(_pinhole_fparams(prob)[prob.image_camidx],
                           prob)
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
        proj = Xc[:, :2] / z[:, None] * fpar[:, :2] + fpar[:, 2:]
    else:
        mid = _expand_cam(prob.cam_model_id[prob.image_camidx], prob)
        par = _expand_cam(prob.cam_params[prob.image_camidx], prob)
        proj = jax.vmap(cm.img_from_cam)(mid, par, Xc)
    r = proj - prob.obs_xy
    r = jnp.where((Xc[:, 2] > 1e-6)[:, None], r, 1e3)
    r2 = jnp.sum(r * r, axis=-1)
    c = _robust_cost(r2, opts.loss, opts.loss_scale)
    return jnp.sum(jnp.where(prob.obs_mask, c, 0.0))


def solve(prob: BAProblem, opts: BAOptions = BAOptions(),
          max_iters=None):
    """Run LM to convergence (early exit on ftol, adaptive lambda).

    Returns (problem, BAStats). Jit-safe; call under jax.jit for speed.

    max_iters: optional TRACED iteration bound overriding the static
    opts.max_iterations — callers that solve the same problem shapes
    with different budgets (local vs global BA in the incremental
    mapper) share one compiled executable instead of one per budget.
    With a dynamic bound or ftol > 0 the loop is a lax.while_loop
    (converged solves stop paying for the remaining budget; the
    reference's Ceres LM has the same function_tolerance exit). With a
    static bound and ftol <= 0 it stays a lax.scan — XLA schedules the
    statically-counted loop noticeably better (~1.7x on the dense
    100-camera benchmark), so fixed-iteration callers keep that rate.
    """
    refine = _refine_any(opts)
    pinhole_only = opts.pinhole_only and not refine
    init_cost = _plain_cost(prob, opts)

    # only the optimized state rides the scan carry; the (much larger)
    # static observation/track arrays are closed over, so the
    # accept/reject select touches four small arrays instead of the
    # whole problem pytree. cam_params rides the carry so accepted
    # intrinsics updates persist (the round-2 NotImplementedError guard
    # is gone: the carry now includes them).
    def lm_iter(carry):
        (q, t, X, cp), lam, cost, it, done, small_cnt, dprev = carry
        p = prob._replace(image_qvec=q, image_tvec=t, points=X,
                          cam_params=cp)
        r, Jc, Jp, Jg = _residuals_and_jacobians(p, refine, pinhole_only)
        r2 = jnp.sum(r * r, axis=-1)
        w = _robust_weights(r2, opts.loss, opts.loss_scale)
        dcam, dint, dpt = _build_and_solve(p, r, Jc, Jp, Jg, w, lam,
                                           opts, x_init=dprev)
        trial = _apply_step(p, dcam, dpt, dint if refine else None)
        new_cost = _plain_cost(trial, opts)
        accept = new_cost < cost
        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b),
            (trial.image_qvec, trial.image_tvec, trial.points,
             trial.cam_params),
            (q, t, X, cp))
        # converged: TWO CONSECUTIVE accepted steps with relative
        # improvement below ftol. A single small accepted step is not
        # convergence — after a rejection streak lambda is large and LM
        # takes tiny damped steps that later re-accelerate once lambda
        # anneals back down (observed: a one-step exit stranded the
        # init-pair BA at 100x its converged cost). Rejected steps keep
        # trying until the lambda ceiling marks stagnation.
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        small = accept & (rel < opts.ftol)
        small_cnt = jnp.where(small, small_cnt + 1, 0)
        done = (small_cnt >= 2) | (~accept & (lam >= 1e6))
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-10),
                        jnp.minimum(lam * 4.0, 1e6))
        # CG warm start for the next LM iteration (iterative solvers)
        return (state, lam, cost, it + 1, done, small_cnt, dcam)

    lam0 = jnp.asarray(opts.init_lambda, prob.obs_xy.dtype)
    state0 = (prob.image_qvec, prob.image_tvec, prob.points,
              prob.cam_params)
    d0 = jnp.zeros((prob.image_qvec.shape[0], 6), prob.obs_xy.dtype)
    carry0 = (state0, lam0, init_cost, jnp.asarray(0, jnp.int32),
              jnp.asarray(False), jnp.asarray(0, jnp.int32), d0)
    if max_iters is None and opts.ftol <= 0:
        (state, lam, cost, iters, _, _, _), _ = jax.lax.scan(
            lambda c, _: (lm_iter(c), None), carry0, None,
            length=opts.max_iterations)
    else:
        bound = jnp.asarray(opts.max_iterations if max_iters is None
                            else max_iters, jnp.int32)
        state, lam, cost, iters, _, _, _ = jax.lax.while_loop(
            lambda c: (c[3] < bound) & ~c[4], lm_iter, carry0)
    prob = prob._replace(image_qvec=state[0], image_tvec=state[1],
                         points=state[2], cam_params=state[3])
    stats = BAStats(init_cost, cost, iters, lam)
    return prob, stats


def mean_reproj_error_px(prob: BAProblem) -> jax.Array:
    """Unrobustified mean reprojection error in pixels."""
    q = prob.image_qvec[prob.obs_image]
    t = prob.image_tvec[prob.obs_image]
    cidx = prob.image_camidx[prob.obs_image]
    mid = prob.cam_model_id[cidx]
    par = prob.cam_params[cidx]
    X = prob.points[prob.obs_point]
    Xc = rops.quat_rotate(q, X) + t
    proj = jax.vmap(cm.img_from_cam)(mid, par, Xc)
    err = jnp.linalg.norm(proj - prob.obs_xy, axis=-1)
    n = jnp.maximum(jnp.sum(prob.obs_mask), 1)
    return jnp.sum(jnp.where(prob.obs_mask, err, 0.0)) / n
