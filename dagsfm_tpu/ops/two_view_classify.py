"""Two-view geometry classification: E/F/H model selection + degeneracy.

TPU-native counterpart of /root/reference/src/estimators/two_view_geometry.
{h,cc}: the config enum (two_view_geometry.h:83: DEGENERATE / CALIBRATED /
UNCALIBRATED / PLANAR / PANORAMIC / PLANAR_OR_PANORAMIC / WATERMARK) and
`Estimate`'s model-selection logic (two_view_geometry.cc:113): run
E-, F- and H-RANSAC, compare inlier counts (GRIC-like ratio test with
max_H_inlier_ratio), detect watermarks (pure 2D border translation), and
recover pose from the winning model. All three RANSACs run batched; the
selection itself is scalar host logic.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import ransac as rnsc


# config values mirror ref two_view_geometry.h:83
DEGENERATE = 1
CALIBRATED = 2
UNCALIBRATED = 3
PLANAR = 4
PANORAMIC = 5
PLANAR_OR_PANORAMIC = 6
WATERMARK = 7

CONFIG_NAMES = {
    DEGENERATE: "DEGENERATE", CALIBRATED: "CALIBRATED",
    UNCALIBRATED: "UNCALIBRATED", PLANAR: "PLANAR",
    PANORAMIC: "PANORAMIC", PLANAR_OR_PANORAMIC: "PLANAR_OR_PANORAMIC",
    WATERMARK: "WATERMARK",
}


@dataclasses.dataclass
class TwoViewOptions:
    """Mirrors ref TwoViewGeometry::Options + SiftMatchingOptions."""
    min_num_inliers: int = 15
    max_error_px: float = 4.0
    max_h_inlier_ratio: float = 0.8      # ref: H/E ratio for planar flag
    watermark_min_inlier_ratio: float = 0.7
    watermark_border_size: float = 0.1
    detect_watermark: bool = True
    num_hypotheses: int = 256
    compute_relative_pose: bool = True
    # speed knob: calibrated pairs run ONLY the essential-matrix RANSAC
    # (skips F and H -> ~3x cheaper verification; loses PLANAR/
    # PANORAMIC/WATERMARK classification for those pairs). The reference
    # always estimates all three (two_view_geometry.cc:113); default off.
    essential_only: bool = False


class TwoViewResult(NamedTuple):
    config: int
    E: np.ndarray | None
    F: np.ndarray | None
    H: np.ndarray | None
    R: np.ndarray | None
    t: np.ndarray | None
    inlier_mask: np.ndarray
    num_inliers: int


def _pad(a, n):
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: len(a)] = a
    return out


def _bucket(n, m=64):
    b = m
    while b < n:
        b *= 2
    return b


import functools


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _efh_batched(keys, x1, x2, p1, p2, mask, thr_n, thr_p, K1b, K2b,
                 num_hyps):
    """E + F + H RANSAC for a BATCH of pairs in one compiled program.

    keys (B, 2); x1/x2 (B, N, 2) normalized coords; p1/p2 (B, N, 2)
    pixels; mask (B, N); thr_n/thr_p (B,) squared thresholds (normalized /
    pixel); K1b/K2b (B, 3, 3) intrinsics (for the F -> E pose upgrade).
    This is the production verification kernel — the reference runs the
    same three estimations per pair inside verifier threads
    (two_view_geometry.cc:113 + matching.cc:550-608); here all pairs and
    all hypotheses run as one device batch, INCLUDING both pose
    recoveries (E-path and the F->E upgrade, two_view_geometry.cc:169) —
    host model selection then never needs a per-pair device dispatch,
    which at ~26 ms per tunnel round trip used to dominate the stage.
    """

    def one(key, a, b, pa, pb, m, tn, tp, Ka, Kb):
        kE, kF, kH = jax.random.split(key, 3)
        resE = rnsc.ransac(
            kE, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
            data=(a, b), mask=m, sample_size=5, threshold=tn,
            num_hypotheses=num_hyps,
            refit=lambda u, v, inl: epi.essential_8pt(u, v, mask=inl)[0][0])
        resF = rnsc.ransac(
            kF, solver=epi.fundamental_7pt, residual_fn=epi.sampson_error,
            data=(pa, pb), mask=m, sample_size=7, threshold=tp,
            num_hypotheses=num_hyps,
            refit=lambda u, v, inl: epi.fundamental_8pt(u, v,
                                                        mask=inl)[0][0])
        resH = rnsc.ransac(
            kH, solver=epi.homography_dlt, residual_fn=epi.homography_error,
            data=(pa, pb), mask=m, sample_size=4, threshold=tp,
            num_hypotheses=num_hyps,
            refit=lambda u, v, inl: epi.homography_dlt(u, v,
                                                       mask=inl)[0][0])
        R, t, nf = epi.pose_from_essential(resE.model, a, b, resE.inliers)
        E_up = jnp.swapaxes(Kb, -1, -2) @ resF.model @ Ka
        R_F, t_F, _nfF = epi.pose_from_essential(E_up, a, b, resF.inliers)
        return (resE.model, resE.num_inliers, resE.inliers, R, t, nf,
                resF.model, resF.num_inliers, resF.inliers,
                resH.model, resH.num_inliers, resH.inliers, R_F, t_F)

    return jax.vmap(one)(keys, x1, x2, p1, p2, mask, thr_n, thr_p,
                         K1b, K2b)


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def _e_batched(keys, x1, x2, mask, thr_n, num_hyps):
    """Essential-only RANSAC batch (the essential_only fast path)."""

    def one(key, a, b, m, tn):
        resE = rnsc.ransac(
            key, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
            data=(a, b), mask=m, sample_size=5, threshold=tn,
            num_hypotheses=num_hyps,
            refit=lambda u, v, inl: epi.essential_8pt(u, v, mask=inl)[0][0])
        R, t, nf = epi.pose_from_essential(resE.model, a, b, resE.inliers)
        return (resE.model, resE.num_inliers, resE.inliers, R, t, nf)

    return jax.vmap(one)(keys, x1, x2, mask, thr_n)


@jax.jit
def _pose_from_e(E, x1, x2, inl):
    return epi.pose_from_essential(E, x1, x2, inl)


def classify_pairs(pair_data: list,
                   options: TwoViewOptions = TwoViewOptions(),
                   seed: int = 0,
                   batch_size: int | None = None) -> dict:
    """Full E/F/H model-selected verification over many pairs.

    pair_data rows: (pair_key, pix1 (M,2), pix2 (M,2), K1, K2,
    image_size1, image_size2, calibrated: bool).
    Returns dict pair_key -> TwoViewResult.

    Pairs are bucketed by padded correspondence count and run through
    `_efh_batched` in device batches (batch_size pairs per compiled
    call); model selection + pose recovery for the winning model is host
    logic per pair. batch_size=None picks 32 on device backends and 1 on
    CPU (XLA:CPU compile time scales badly with the pair batch dim).
    """
    if batch_size is None:
        batch_size = 64 if jax.default_backend() != "cpu" else 1
    key0 = jax.random.PRNGKey(seed)

    # precompute per-pair normalized coords + thresholds, group by bucket
    prep = []
    for row in pair_data:
        (pk, pix1, pix2, K1, K2, sz1, sz2, calibrated) = row
        n = len(pix1)
        if n < max(options.min_num_inliers, 8):
            prep.append((pk, None))
            continue
        x1 = (pix1 - K1[:2, 2]) / np.array([K1[0, 0], K1[1, 1]])
        x2 = (pix2 - K2[:2, 2]) / np.array([K2[0, 0], K2[1, 1]])
        f_mean = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
        thr_n = (options.max_error_px / f_mean) ** 2
        thr_p = options.max_error_px ** 2
        prep.append((pk, (pix1, pix2, x1, x2, thr_n, thr_p, K1, K2,
                          sz1, sz2, calibrated, _bucket(n))))

    out = {}
    by_bucket: dict[int, list] = {}
    for idx, (pk, p) in enumerate(prep):
        if p is None:
            n0 = len(pair_data[idx][1])
            out[pk] = TwoViewResult(DEGENERATE, None, None, None, None,
                                    None, np.zeros(n0, bool), 0)
        else:
            by_bucket.setdefault(p[-1], []).append((pk, p))

    keys_all = jax.random.split(key0, max(1, len(pair_data)))
    # build the chunk work list first, then execute — on CPU the chunks
    # run on a small thread pool (XLA releases the GIL during execution;
    # the reference's verifier-thread parallelism, matching.cc:550-608)
    key_idx = 0
    work = []
    for N, all_rows in sorted(by_bucket.items()):
        if options.essential_only:
            groups = [
                ("e", [r for r in all_rows if r[1][10]]),      # calibrated
                ("efh", [r for r in all_rows if not r[1][10]]),
            ]
        else:
            groups = [("efh", all_rows)]
        for kind, rows in groups:
            for s in range(0, len(rows), batch_size):
                chunk = rows[s: s + batch_size]
                if chunk:
                    work.append((kind, N, chunk, key_idx))
                    key_idx += len(chunk)

    def _run_chunk(item):
        kind, N, chunk, kidx = item
        B = len(chunk)
        x1b = np.zeros((B, N, 2))
        x2b = np.zeros((B, N, 2))
        p1b = np.zeros((B, N, 2))
        p2b = np.zeros((B, N, 2))
        mb = np.zeros((B, N), bool)
        tnb = np.zeros(B)
        tpb = np.zeros(B)
        K1b = np.zeros((B, 3, 3))
        K2b = np.zeros((B, 3, 3))
        for k, (pk, p) in enumerate(chunk):
            (pix1, pix2, x1, x2, thr_n, thr_p, K1, K2, *_rest) = p
            n = len(pix1)
            x1b[k, :n] = x1
            x2b[k, :n] = x2
            p1b[k, :n] = pix1
            p2b[k, :n] = pix2
            mb[k, :n] = True
            tnb[k] = thr_n
            tpb[k] = thr_p
            K1b[k] = K1
            K2b[k] = K2
        keys = keys_all[kidx: kidx + B]
        results = []
        if kind == "e":
            # one transfer for the whole tuple: per-array np.asarray paid
            # one tunnel round trip EACH (~270 ms per 64-pair chunk)
            resE = jax.device_get(_e_batched(
                keys, jnp.asarray(x1b), jnp.asarray(x2b),
                jnp.asarray(mb), jnp.asarray(tnb),
                options.num_hypotheses))
            zero3 = np.zeros((3, 3))
            for k, (pk, p) in enumerate(chunk):
                (pix1, pix2, x1, x2, thr_n, thr_p, K1, K2, sz1,
                 sz2, calibrated, _N) = p
                nwin = len(pix1)
                results.append((pk, _select_model(
                    pix1, pix2, x1, x2, K1, K2, sz1, sz2,
                    calibrated, options,
                    E=resE[0][k], nE=int(resE[1][k]),
                    inlE=resE[2][k][:nwin],
                    R_E=resE[3][k], t_E=resE[4][k],
                    nf=int(resE[5][k]),
                    F=zero3, nF=0, inlF=np.zeros(nwin, bool),
                    H=zero3, nH=0, inlH=np.zeros(nwin, bool))))
            return results
        res = jax.device_get(_efh_batched(
            keys, jnp.asarray(x1b), jnp.asarray(x2b),
            jnp.asarray(p1b), jnp.asarray(p2b), jnp.asarray(mb),
            jnp.asarray(tnb), jnp.asarray(tpb),
            jnp.asarray(K1b), jnp.asarray(K2b),
            options.num_hypotheses))
        for k, (pk, p) in enumerate(chunk):
            (pix1, pix2, x1, x2, thr_n, thr_p, K1, K2, sz1, sz2,
             calibrated, _N) = p
            results.append((pk, _select_model(
                pix1, pix2, x1, x2, K1, K2, sz1, sz2, calibrated,
                options,
                E=res[0][k], nE=int(res[1][k]),
                inlE=res[2][k][: len(pix1)],
                R_E=res[3][k], t_E=res[4][k], nf=int(res[5][k]),
                F=res[6][k], nF=int(res[7][k]),
                inlF=res[8][k][: len(pix1)],
                H=res[9][k], nH=int(res[10][k]),
                inlH=res[11][k][: len(pix1)],
                R_F=res[12][k], t_F=res[13][k])))
        return results

    n_threads = 1
    if jax.default_backend() == "cpu" and len(work) > 1:
        n_threads = min(os.cpu_count() or 1, 8)
    if n_threads > 1:
        # warm the compile caches sequentially (one item per distinct
        # (kind, N) shape) so threads don't race the same compilation
        seen_shapes = set()
        warm, rest = [], []
        for item in work:
            sig = (item[0], item[1], len(item[2]))
            if sig in seen_shapes:
                rest.append(item)
            else:
                seen_shapes.add(sig)
                warm.append(item)
        for item in warm:
            for pk, r in _run_chunk(item):
                out[pk] = r
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=n_threads) as ex:
            for results in ex.map(_run_chunk, rest):
                for pk, r in results:
                    out[pk] = r
    else:
        for item in work:
            for pk, r in _run_chunk(item):
                out[pk] = r
    return out


def _select_model(pix1, pix2, x1, x2, K1, K2, image_size1, image_size2,
                  calibrated, options, *, E, nE, inlE, R_E, t_E, nf,
                  F, nF, inlF, H, nH, inlH,
                  R_F=None, t_F=None) -> TwoViewResult:
    """Model selection from precomputed E/F/H RANSAC results (host; ref
    two_view_geometry.cc:113 flow incl. planar/panoramic/watermark)."""
    n = len(pix1)
    if calibrated and nE >= options.min_num_inliers and nE >= nF:
        config, num_inl, inliers = CALIBRATED, nE, inlE
    elif nF >= options.min_num_inliers:
        config, num_inl, inliers = UNCALIBRATED, nF, inlF
    elif nH >= options.min_num_inliers:
        config, num_inl, inliers = PLANAR_OR_PANORAMIC, nH, inlH
    else:
        return TwoViewResult(DEGENERATE, None, None, None, None, None,
                             np.zeros(n, bool), 0)

    if config in (CALIBRATED, UNCALIBRATED) and \
            nH > options.max_h_inlier_ratio * num_inl:
        config, num_inl, inliers = PLANAR_OR_PANORAMIC, nH, inlH

    inliers = np.asarray(inliers, bool)

    # watermark: homography that is a pure border translation
    if options.detect_watermark and config == PLANAR_OR_PANORAMIC:
        d = pix2[inliers] - pix1[inliers]
        if len(d) >= options.min_num_inliers:
            spread = np.abs(d - d.mean(0)).mean()
            w1, h1 = image_size1
            bx = options.watermark_border_size * w1
            by = options.watermark_border_size * h1
            pin = pix1[inliers]
            in_border = ((pin[:, 0] < bx) | (pin[:, 0] > w1 - bx)
                         | (pin[:, 1] < by) | (pin[:, 1] > h1 - by))
            if spread < 1.0 and in_border.mean() > \
                    options.watermark_min_inlier_ratio:
                config = WATERMARK

    R = t = None
    E_out = F_out = H_out = None
    if config == CALIBRATED:
        E_out = np.asarray(E)
        if options.compute_relative_pose:
            R, t = np.asarray(R_E), np.asarray(t_E)
        # F = K2^-T E K1^-1 — 3x3 host algebra. (An eager device call
        # here cost one tunnel round trip PER PAIR on remote TPU,
        # dominating the whole verification stage.)
        F_out = np.linalg.inv(np.asarray(K2)).T @ np.asarray(E) @ \
            np.linalg.inv(np.asarray(K1))
    elif config == UNCALIBRATED:
        F_out = np.asarray(F)
        if options.compute_relative_pose:
            # pose via the F -> E upgrade with (prior) intrinsics
            # (ref two_view_geometry.cc:169 EstimateRelativePose) —
            # already computed inside the batched device kernel; fall
            # back to a per-pair dispatch only when called outside it
            if R_F is not None:
                R, t = np.asarray(R_F), np.asarray(t_F)
            else:
                E_up = K2.T @ np.asarray(F) @ K1
                N = _bucket(n)
                Rj, tj, _nf = _pose_from_e(
                    jnp.asarray(E_up), jnp.asarray(_pad(x1, N)),
                    jnp.asarray(_pad(x2, N)),
                    jnp.asarray(_pad(inliers, N)))
                R, t = np.asarray(Rj), np.asarray(tj)
    elif config in (PLANAR_OR_PANORAMIC, PLANAR, PANORAMIC, WATERMARK):
        H_out = np.asarray(H)
        if options.compute_relative_pose and config != WATERMARK:
            Hn = np.linalg.inv(K2) @ H_out @ K1
            R, t, n_pts = pose_from_homography(Hn, x1[inliers],
                                               x2[inliers])
            config = PANORAMIC if np.linalg.norm(t) < 1e-4 else PLANAR

    return TwoViewResult(config, E_out, F_out, H_out, R, t, inliers,
                         num_inl)


def classify_two_view(pix1: np.ndarray, pix2: np.ndarray,
                      K1: np.ndarray, K2: np.ndarray,
                      image_size1: tuple, image_size2: tuple,
                      options: TwoViewOptions = TwoViewOptions(),
                      calibrated: bool = True,
                      seed: int = 0) -> TwoViewResult:
    """Full two-view estimation with model selection for ONE pair.

    pix1/pix2 (N, 2) pixel correspondences; K1/K2 3x3 intrinsics;
    image_size = (width, height). Thin wrapper over classify_pairs.
    """
    out = classify_pairs(
        [(0, np.asarray(pix1, float), np.asarray(pix2, float), K1, K2,
          image_size1, image_size2, calibrated)],
        options=options, seed=seed, batch_size=1)
    return out[0]


def pose_from_homography(Hn: np.ndarray, x1: np.ndarray, x2: np.ndarray):
    """(R, t) from a calibrated homography (Malis-Vargas style).

    Ref: base/homography_matrix.cc DecomposeHomographyMatrix +
    PoseFromHomographyMatrix. Returns the cheirality-best candidate.
    """
    # normalize by middle singular value
    U, S, Vt = np.linalg.svd(Hn)
    H = Hn / S[1]
    # candidates from the SVD-based decomposition (Faugeras)
    s = np.linalg.det(U) * np.linalg.det(Vt)
    d1, d2, d3 = S / S[1]
    if abs(d1 - d3) < 1e-9:   # pure rotation
        return H * np.sign(np.linalg.det(H)), np.zeros(3), len(x1)
    x1_ = np.sqrt(max((d1 ** 2 - 1.0), 0) / max(d1 ** 2 - d3 ** 2, 1e-12))
    x3_ = np.sqrt(max((1.0 - d3 ** 2), 0) / max(d1 ** 2 - d3 ** 2, 1e-12))
    sin_t = np.sqrt(max((d1 ** 2 - 1.0) * (1.0 - d3 ** 2), 0)) \
        / max(d1 * d3, 1e-12) if d1 * d3 > 0 else 0.0
    cos_t = (d1 * d3 + 1.0) / max(d1 + d3, 1e-12) \
        if (d1 + d3) > 0 else 1.0
    cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            Rp = np.array([[cos_t, 0, -e1 * e3 * sin_t],
                           [0, 1, 0],
                           [e1 * e3 * sin_t, 0, cos_t]])
            tp = (d1 - d3) * np.array([e1 * x1_, 0.0, -e3 * x3_])
            R = s * U @ Rp @ Vt
            t = U @ tp
            cands.append((R, t))
            cands.append((R, -t))
    # cheirality: count points with positive depth in BOTH views. Pure
    # host numpy — per candidate, solve the 3x2 least squares
    # z2*h2 = z1*R*h1 + t for (z1, z2) per point via normal equations.
    # (The previous per-candidate eager device triangulation cost 16
    # unbucketed dispatches per pair — on remote TPU it dominated the
    # entire verification stage.)
    h1 = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)  # (n,3)
    h2 = np.concatenate([x2, np.ones((len(x2), 1))], axis=1)
    best = None
    best_count = -1
    for (R, t) in cands:
        if len(x1) == 0:
            best = (R, t)
            break
        a = h1 @ R.T                                   # (n,3) = R h1
        b = -h2
        # normal equations for [a_i, b_i] [z1, z2]^T = -t
        aa = np.sum(a * a, axis=1)
        ab = np.sum(a * b, axis=1)
        bb = np.sum(b * b, axis=1)
        at = a @ (-t)
        bt = b @ (-t)
        det = aa * bb - ab * ab
        det = np.where(np.abs(det) < 1e-12, 1e-12, det)
        z1 = (at * bb - ab * bt) / det
        z2 = (aa * bt - ab * at) / det
        count = int(((z1 > 0) & (z2 > 0)).sum())
        if count > best_count:
            best_count = count
            best = (R, t)
    R, t = best
    nt = np.linalg.norm(t)
    if nt > 1e-12:
        t = t / nt
    return R, t, best_count
