"""Profile the full two-view classification path on real TPU.

Splits the 64-pair full-classification time into: device E/F/H RANSAC
(by component), host prep, host _select_model. Run: python tools/profile_two_view.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import two_view_classify as tvc
from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import ransac as rnsc


def make_pairs(n_pairs=64, npts=256, seed=3):
    rng = np.random.default_rng(seed)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    pair_data = []
    for k in range(n_pairs):
        X = rng.uniform([-2, -2, 4], [2, 2, 8], (npts, 3))
        aa = rng.normal(0, 0.1, 3)
        th = np.linalg.norm(aa)
        ax = aa / max(th, 1e-9)
        ct, st = np.cos(th), np.sin(th)
        R = (ct * np.eye(3) + st * np.cross(np.eye(3), ax)
             + (1 - ct) * np.outer(ax, ax))
        t = rng.normal(0, 0.3, 3)
        x1 = X @ K.T
        x1 = x1[:, :2] / x1[:, 2:]
        x2 = (X @ R.T + t) @ K.T
        x2 = x2[:, :2] / x2[:, 2:]
        x1 += rng.normal(0, 0.5, x1.shape)
        x2 += rng.normal(0, 0.5, x2.shape)
        pair_data.append(((k, k + 1000), x1, x2, K, K,
                          (640, 480), (640, 480), True))
    return pair_data


def t_it(fn, reps=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    n_pairs = 64
    pair_data = make_pairs(n_pairs)
    opts = tvc.TwoViewOptions()

    # full classify_pairs (warm)
    tvc.classify_pairs(pair_data, opts, seed=0)
    t_full = t_it(lambda: tvc.classify_pairs(pair_data, opts, seed=1), 3)
    print(f"classify_pairs full     : {t_full*1e3:8.1f} ms  ({n_pairs/t_full:.1f} pairs/s)")

    # build the batched arrays once
    B, N = n_pairs, 256
    x1b = np.zeros((B, N, 2)); x2b = np.zeros((B, N, 2))
    p1b = np.zeros((B, N, 2)); p2b = np.zeros((B, N, 2))
    mb = np.zeros((B, N), bool); tnb = np.zeros(B); tpb = np.zeros(B)
    K = pair_data[0][3]
    for k, row in enumerate(pair_data):
        (_pk, pix1, pix2, K1, K2, _s1, _s2, _c) = row
        x1 = (pix1 - K1[:2, 2]) / np.array([K1[0, 0], K1[1, 1]])
        x2 = (pix2 - K2[:2, 2]) / np.array([K2[0, 0], K2[1, 1]])
        x1b[k], x2b[k], p1b[k], p2b[k] = x1, x2, pix1, pix2
        mb[k] = True
        f_mean = K1[0, 0]
        tnb[k] = (opts.max_error_px / f_mean) ** 2
        tpb[k] = opts.max_error_px ** 2
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    jx1, jx2, jp1, jp2 = map(jnp.asarray, (x1b, x2b, p1b, p2b))
    jm, jtn, jtp = map(jnp.asarray, (mb, tnb, tpb))
    jK = jnp.asarray(np.broadcast_to(K, (B, 3, 3)))

    def dev(fn):
        def run():
            out = fn()
            jax.block_until_ready(out)
        return run

    # full EFH device batch
    t_efh = t_it(dev(lambda: tvc._efh_batched(keys, jx1, jx2, jp1, jp2, jm, jtn, jtp, jK, jK, opts.num_hypotheses)))
    print(f"_efh_batched device     : {t_efh*1e3:8.1f} ms")

    t_e = t_it(dev(lambda: tvc._e_batched(keys, jx1, jx2, jm, jtn, opts.num_hypotheses)))
    print(f"_e_batched device       : {t_e*1e3:8.1f} ms")

    # individual RANSACs, vmapped over pairs
    def mk(solver, resid, data, ss, thr, refit):
        @jax.jit
        def run():
            def one(key, a, b, m, t):
                return rnsc.ransac(key, solver=solver, residual_fn=resid,
                                   data=(a, b), mask=m, sample_size=ss,
                                   threshold=t, num_hypotheses=opts.num_hypotheses,
                                   refit=refit).num_inliers
            return jax.vmap(one)(keys, *data, jm, thr)
        return run

    tE = t_it(dev(mk(epi.essential_5pt, epi.sampson_error, (jx1, jx2), 5, jtn,
                     lambda u, v, inl: epi.essential_8pt(u, v, mask=inl)[0][0])))
    tF = t_it(dev(mk(epi.fundamental_7pt, epi.sampson_error, (jp1, jp2), 7, jtp,
                     lambda u, v, inl: epi.fundamental_8pt(u, v, mask=inl)[0][0])))
    tH = t_it(dev(mk(epi.homography_dlt, epi.homography_error, (jp1, jp2), 4, jtp,
                     lambda u, v, inl: epi.homography_dlt(u, v, mask=inl)[0][0])))
    print(f"  E ransac only         : {tE*1e3:8.1f} ms")
    print(f"  F ransac only         : {tF*1e3:8.1f} ms")
    print(f"  H ransac only         : {tH*1e3:8.1f} ms")

    # host select_model cost: run device part once, then time the host loop
    res = tvc._efh_batched(keys, jx1, jx2, jp1, jp2, jm, jtn, jtp, jK, jK, opts.num_hypotheses)
    res = [np.asarray(r) for r in res]

    def host_loop():
        for k, row in enumerate(pair_data):
            (_pk, pix1, pix2, K1, K2, s1, s2, _c) = row
            x1 = x1b[k]; x2 = x2b[k]
            tvc._select_model(pix1, pix2, x1, x2, K1, K2, s1, s2, True, opts,
                              E=res[0][k], nE=int(res[1][k]), inlE=res[2][k][:len(pix1)],
                              R_E=res[3][k], t_E=res[4][k], nf=int(res[5][k]),
                              F=res[6][k], nF=int(res[7][k]), inlF=res[8][k][:len(pix1)],
                              H=res[9][k], nH=int(res[10][k]), inlH=res[11][k][:len(pix1)])
    t_host = t_it(host_loop)
    print(f"host _select_model x64  : {t_host*1e3:8.1f} ms")

    # fetch cost
    def fetch():
        r2 = tvc._efh_batched(keys, jx1, jx2, jp1, jp2, jm, jtn, jtp, jK, jK, opts.num_hypotheses)
        import jax as _j; _j.device_get(r2)
    t_fetch = t_it(fetch)
    print(f"efh + full fetch        : {t_fetch*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
