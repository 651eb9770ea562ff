"""Per-statement timing of the iterative-BA Schur prologue on TPU.

BA_PHASES_r05.json shows the prologue at 72.9 ms vs a ~1 ms bandwidth
bound; this probe times each constituent op in isolation (jitted, with
donated dummies where needed) to find the dominant term before
attempting a rewrite.  Run: python tools/prologue_probe.py [--smoke]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def t_it(fn, *a, reps=5):
    f = jax.jit(fn)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


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
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const, dtype=jnp.float32,
                           max_track_len=mtl)
    I, M = prob.cam_obs.shape
    P, T = prob.trk_obs.shape
    N = prob.obs_xy.shape[0]
    print(f"I={I} M={M} P={P} T={T} N={N}", flush=True)

    opts = ba.BAOptions(max_iterations=5, solver="iterative",
                        pinhole_only=True, ftol=0.0)
    r, Jc, Jp, _ = jax.jit(
        lambda p: ba._residuals_and_jacobians(p, False, True))(prob)
    r2 = jnp.sum(r * r, axis=-1)
    w = ba._robust_weights(r2, opts.loss, opts.loss_scale)
    sw = jnp.sqrt(w)[:, None]
    r_w = jax.block_until_ready(r * sw)
    Jc_w = jax.block_until_ready(Jc * sw[..., None])
    Jp_w = jax.block_until_ready(Jp * sw[..., None])
    lam = jnp.asarray(1e-4, jnp.float32)
    dtype = jnp.float32
    eyeC = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    cmask = jax.block_until_ready(prob.cam_mask.astype(dtype)[..., None, None])
    tmask = jax.block_until_ready(prob.trk_mask.astype(dtype)[..., None, None])
    obs_live = jax.block_until_ready(prob.obs_mask.astype(dtype)[:, None, None])

    # --- piecewise ---
    def f_slotmask(Jc_w):
        return ba._cam_slot_view(Jc_w, prob) * cmask
    print("Jc slot mask      :", t_it(f_slotmask, Jc_w), flush=True)
    Jc_slot = jax.block_until_ready(jax.jit(f_slotmask)(Jc_w))

    def f_U(Jc_slot):
        return jnp.einsum("imra,imrb->iab", Jc_slot, Jc_slot)
    print("U einsum          :", t_it(f_U, Jc_slot), flush=True)

    def f_U_mm(Jc_slot):
        x = Jc_slot.reshape(I, M * 2, 6)
        return jnp.matmul(x.transpose(0, 2, 1), x)
    print("U as bmm          :", t_it(f_U_mm, Jc_slot), flush=True)

    def f_trkgather(Jp_w):
        return Jp_w[prob.trk_obs] * tmask
    print("Jp trk gather     :", t_it(f_trkgather, Jp_w), flush=True)
    Jp_slot = jax.block_until_ready(jax.jit(f_trkgather)(Jp_w))

    def f_V(Jp_slot):
        return jnp.einsum("ptri,ptrj->pij", Jp_slot, Jp_slot)
    print("V einsum          :", t_it(f_V, Jp_slot), flush=True)

    def f_Vinv(V):
        Vd = V + (lam * jnp.maximum(
            jnp.diagonal(V, axis1=-2, axis2=-1), 1e-6)[..., None]
            + opts.point_damping) * eye3[None]
        return ba._inv3(Vd + 1e-12 * eye3[None])
    V = jax.block_until_ready(jax.jit(f_V)(Jp_slot))
    print("Vinv              :", t_it(f_Vinv, V), flush=True)
    Vinv = jax.block_until_ready(jax.jit(f_Vinv)(V))

    def f_W(Jc_w, Jp_w):
        return jnp.einsum("nri,nrj->nij", Jc_w, Jp_w) * obs_live
    print("W einsum          :", t_it(f_W, Jc_w, Jp_w), flush=True)
    W = jax.block_until_ready(jax.jit(f_W)(Jc_w, Jp_w))

    def f_Vgather(Vinv):
        return Vinv[prob.obs_point]
    print("Vinv obs gather   :", t_it(f_Vgather, Vinv), flush=True)
    Vg = jax.block_until_ready(jax.jit(f_Vgather)(Vinv))

    def f_WVinv(W, Vg):
        return jnp.einsum("nij,njk->nik", W, Vg)
    print("WVinv einsum      :", t_it(f_WVinv, W, Vg), flush=True)
    WVinv = jax.block_until_ready(jax.jit(f_WVinv)(W, Vg))

    def f_Sdiag(WVinv, W):
        return jnp.einsum("imak,imbk->iab",
                          ba._cam_slot_view(WVinv, prob),
                          ba._cam_slot_view(W, prob))
    print("Sdiag einsum      :", t_it(f_Sdiag, WVinv, W), flush=True)

    def f_Sdiag_mm(WVinv, W):
        a = ba._cam_slot_view(WVinv, prob).reshape(I, M, 18)
        b = ba._cam_slot_view(W, prob).reshape(I, M, 18)
        # iab = sum_m sum_k a[i,m,a,k] b[i,m,b,k] — contract over (m,k)
        av = ba._cam_slot_view(WVinv, prob).transpose(0, 2, 1, 3).reshape(I, 6, M * 3)
        bv = ba._cam_slot_view(W, prob).transpose(0, 2, 1, 3).reshape(I, 6, M * 3)
        return jnp.matmul(av, bv.transpose(0, 2, 1))
    print("Sdiag as bmm      :", t_it(f_Sdiag_mm, WVinv, W), flush=True)

    def f_Minv(Sd):
        return jnp.linalg.solve(
            Sd + 1e-10 * eyeC[None], jnp.broadcast_to(eyeC, Sd.shape))
    Sd = jax.block_until_ready(jax.jit(f_Sdiag)(WVinv, W))
    print("Minv solve        :", t_it(f_Minv, Sd), flush=True)

    def f_Wtrk(W):
        return W[prob.trk_obs] * tmask
    print("W trk gather      :", t_it(f_Wtrk, W), flush=True)

    def f_gc(Jc_slot, r_w):
        rc_slot = ba._cam_slot_view(r_w, prob) * cmask[..., 0]
        return -jnp.einsum("imra,imr->ia", Jc_slot, rc_slot)
    print("gc einsum         :", t_it(f_gc, Jc_slot, r_w), flush=True)

    def f_gp(Jp_slot, r_w):
        rp_slot = r_w[prob.trk_obs] * tmask[..., 0]
        return -jnp.einsum("ptri,ptr->pi", Jp_slot, rp_slot)
    print("gp einsum+gather  :", t_it(f_gp, Jp_slot, r_w), flush=True)


if __name__ == "__main__":
    main()
