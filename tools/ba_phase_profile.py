"""Per-phase breakdown + roofline for the 1000-cam / 1M-obs iterative BA.

Answers VERDICT r4 weak #3: where do the 435 ms per LM iteration go —
residual/Jacobian assembly, Schur prologue (U/V/W/B/Sdiag), PCG matvecs,
or host transfers — and what bound (bandwidth vs compute vs latency)
does each phase sit at. Writes BA_PHASES_r05.json.

Run on real TPU: python tools/ba_phase_profile.py [--smoke]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

V5E_HBM_GBPS = 820.0      # v5e HBM bandwidth estimate
V5E_PEAK_BF16_GFLOPS = 197_000.0


def t_it(fn, reps=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    ncam, npts, mtl = (200, 5000, 8) if args.smoke else (1000, 50000, 20)
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=ncam, num_points=npts, pixel_noise=0.5, seed=0,
        max_track_length=mtl)
    sc = synthetic.generate(spec)
    arrays = synthetic.to_scene_arrays(sc, dtype=np.float32)
    rng = np.random.default_rng(1)
    arrays = arrays._replace(points_xyz=arrays.points_xyz + rng.normal(
        0, 0.02, arrays.points_xyz.shape).astype(np.float32))
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const, dtype=jnp.float32,
                           max_track_len=mtl)
    I = prob.image_qvec.shape[0]
    P = prob.points.shape[0]
    N = prob.obs_xy.shape[0]
    T = prob.trk_obs.shape[1]
    M = prob.cam_obs.shape[1]
    nobs = int(np.asarray(prob.obs_mask).sum())
    shapes = {"I": I, "P": P, "N_padded": N, "N_valid": nobs,
              "T": T, "M": M,
              "slot_fill_cam": round(nobs / (I * M), 3),
              "slot_fill_trk": round(nobs / (P * T), 3)}
    print("shapes:", shapes)

    opts = ba.BAOptions(max_iterations=5, solver="iterative",
                        pinhole_only=True, ftol=0.0)

    # ---- full LM solve (bench axis reference point)
    solve = jax.jit(lambda p: ba.solve(p, opts))
    dt_full = t_it(lambda: solve(prob)[0].points, reps=2)
    per_iter = dt_full / 5
    print(f"full solve: {dt_full*1e3:.0f} ms -> {per_iter*1e3:.1f} ms/LM-iter")

    # ---- phase 1: residuals + jacobians (+ robust weights)
    @jax.jit
    def ph_resjac(p):
        r, Jc, Jp, _ = ba._residuals_and_jacobians(p, False, True)
        r2 = jnp.sum(r * r, axis=-1)
        w = ba._robust_weights(r2, opts.loss, opts.loss_scale)
        return r, Jc, Jp, w
    dt_rj = t_it(lambda: ph_resjac(prob))
    r, Jc, Jp, w = ph_resjac(prob)
    sw = jnp.sqrt(w)[:, None]
    r_w = jax.block_until_ready(r * sw)
    Jc_w = jax.block_until_ready(Jc * sw[..., None])
    Jp_w = jax.block_until_ready(Jp * sw[..., None])

    # ---- phase 2: cost evaluation (called once per LM iter on trial)
    cost_j = jax.jit(lambda p: ba._plain_cost(p, opts))
    dt_cost = t_it(lambda: cost_j(prob))

    # ---- phase 3: Schur prologue (narrow-gather form, mirrors
    # _build_and_solve_iterative after the round-5 gather restructure:
    # [Jp|r] 32 B track payload, packed [Vinv|Vinv·gp] 48 B obs gather,
    # W never gathered)
    lam = jnp.asarray(1e-4, jnp.float32)

    @jax.jit
    def ph_prologue(p, r_w, Jc_w, Jp_w):
        dtype = r_w.dtype
        eyeC = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        free = (~p.const_image).astype(dtype)
        cmask = p.cam_mask.astype(dtype)[..., None, None]
        Jc_slot = ba._cam_slot_view(Jc_w, p) * cmask
        rc_slot = ba._cam_slot_view(r_w, p) * cmask[..., 0]
        U = jnp.einsum("imra,imrb->iab", Jc_slot, Jc_slot)
        gc = -jnp.einsum("imra,imr->ia", Jc_slot, rc_slot)
        obs_live = p.obs_mask.astype(dtype)[:, None, None]
        W = jnp.einsum("nri,nrj->nij", Jc_w, Jp_w) * obs_live
        payload = jnp.concatenate([Jp_w.reshape(-1, 6), r_w], axis=1)
        tmask = p.trk_mask.astype(dtype)[..., None]
        slot = payload[p.trk_obs] * tmask
        Jp_slot = slot[..., :6].reshape(*slot.shape[:2], 2, 3)
        rp_slot = slot[..., 6:8]
        V = jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
        gp = -jnp.einsum("ptri,ptr->pi", Jp_slot, rp_slot)
        Ud = U + lam * eyeC[None] * jnp.maximum(
            jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)[..., None]
        Vd = V + (lam * jnp.maximum(
            jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
            + opts.point_damping) * eye3[None]
        Vinv = ba._inv3(Vd + 1e-12 * eye3[None])
        u = jnp.einsum("pij,pj->pi", Vinv, gp)
        G_obs = jnp.concatenate(
            [Vinv.reshape(-1, 9), u], axis=1)[p.obs_point]
        Vinv_obs = G_obs[:, :9].reshape(-1, 3, 3)
        WVinv = jnp.einsum("nij,njk->nik", W, Vinv_obs)
        Sdiag = Ud - jnp.einsum("imak,imbk->iab",
                                ba._cam_slot_view(WVinv, p),
                                ba._cam_slot_view(W, p))
        Minv = jnp.linalg.solve(
            Sdiag + 1e-10 * eyeC[None], jnp.broadcast_to(eyeC, Sdiag.shape))
        b = gc - ba._cam_slot_view(
            jnp.einsum("nij,nj->ni", W, G_obs[:, 9:]), p).sum(axis=1)
        return Ud, Vinv, W, Minv, gc, gp, b
    dt_pro = t_it(lambda: ph_prologue(prob, r_w, Jc_w, Jp_w))
    Ud, Vinv, W, Minv, gc, gp, _b = [
        jax.block_until_ready(x) for x in ph_prologue(prob, r_w, Jc_w, Jp_w)]

    # ---- phase 4: one CG matvec (S_mv), and a 30-matvec chain
    free = (~prob.const_image).astype(jnp.float32)
    tmask_t = prob.trk_mask.astype(jnp.float32)[..., None]

    @jax.jit
    def ph_matvec(x):
        xm = x * free[:, None]
        x_obs = ba._expand_cam(xm, prob)
        s = jnp.einsum("nij,ni->nj", W, x_obs)
        tmp = jnp.sum(s[prob.trk_obs] * tmask_t, axis=1)
        y = jnp.einsum("pij,pj->pi", Vinv, tmp)
        z = jnp.einsum("nij,nj->ni", W, y[prob.obs_point])
        Sx = jnp.einsum("iab,ib->ia", Ud, xm) - ba._cam_slot_view(z, prob).sum(axis=1)
        return Sx * free[:, None]
    x = jnp.ones((I, 6), jnp.float32)
    dt_mv = t_it(lambda: ph_matvec(x))

    @jax.jit
    def ph_matvec30(x):
        def body(k, x):
            return ph_matvec(x) * (1.0 / (1.0 + jnp.sum(x * x)))
        return jax.lax.fori_loop(0, 30, body, x)
    dt_mv30 = t_it(lambda: ph_matvec30(x))

    # ---- phase 5: full linear solve (prologue + PCG + backsub)
    @jax.jit
    def ph_linsolve(p, r_w, Jc_w, Jp_w):
        return ba._build_and_solve_iterative(p, r_w, Jc_w, Jp_w, lam, opts)
    dt_lin = t_it(lambda: ph_linsolve(prob, r_w, Jc_w, Jp_w))

    # ---- roofline estimates (bytes moved, f32)
    def gb(x):
        return x * 4 / 1e9
    bytes_rj = gb(nobs * (2 * 6 + 2 * 3 + 2 + 2 + 3) + I * 7 + P * 3)
    # prologue (narrow-gather form): Jc/Jp/r reads, [Jp|r] payload
    # write+gather, W write + 3 reads (WVinv/Sdiag/b), packed G gather,
    # WVinv write+read, small (P,·) tables
    bytes_pro = gb(N * (12 + 6 + 2) + N * 8 + P * T * 8 + N * 12
                   + N * 18 * 4 + N * 18 * 2 + P * 9 * 4)
    # matvec: read W twice (N*18*2), s write+gather (N*3+P*T*3),
    # y gather (N*3), slot sums
    bytes_mv = gb(N * 18 * 2 + N * 3 * 2 + P * T * 3 + N * 3 + P * 9)

    phases = {
        "lm_iter_ms": round(per_iter * 1e3, 1),
        "residual_jacobian_ms": round(dt_rj * 1e3, 1),
        "trial_cost_ms": round(dt_cost * 1e3, 1),
        "schur_prologue_ms": round(dt_pro * 1e3, 1),
        "cg_matvec_ms": round(dt_mv * 1e3, 2),
        "cg_30_matvecs_ms": round(dt_mv30 * 1e3, 1),
        "linear_solve_total_ms": round(dt_lin * 1e3, 1),
        "roofline": {
            "hbm_gbps_assumed": V5E_HBM_GBPS,
            "residual_jacobian": {
                "gb_moved": round(bytes_rj, 3),
                "bw_bound_ms": round(bytes_rj / V5E_HBM_GBPS * 1e3, 2),
                "achieved_gbps": round(bytes_rj / dt_rj, 1)},
            "schur_prologue": {
                "gb_moved": round(bytes_pro, 3),
                "bw_bound_ms": round(bytes_pro / V5E_HBM_GBPS * 1e3, 2),
                "achieved_gbps": round(bytes_pro / dt_pro, 1)},
            "cg_matvec": {
                "gb_moved": round(bytes_mv, 3),
                "bw_bound_ms": round(bytes_mv / V5E_HBM_GBPS * 1e3, 2),
                "achieved_gbps": round(bytes_mv / dt_mv, 1)},
        },
    }
    out = {"shapes": shapes, "phases": phases,
           "backend": jax.default_backend()}
    print(json.dumps(phases, indent=1))
    with open("BA_PHASES_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
