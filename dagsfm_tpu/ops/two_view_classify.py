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


@jax.jit
def _h_ransac(key, x1, x2, mask, thr):
    return rnsc.ransac(
        key, solver=epi.homography_dlt, residual_fn=epi.homography_error,
        data=(x1, x2), mask=mask, sample_size=4, threshold=thr,
        num_hypotheses=256,
        refit=lambda a, b, inl: epi.homography_dlt(a, b, mask=inl)[0][0])


@jax.jit
def _f_ransac(key, x1, x2, mask, thr):
    return rnsc.ransac(
        key, solver=epi.fundamental_7pt, residual_fn=epi.sampson_error,
        data=(x1, x2), mask=mask, sample_size=7, threshold=thr,
        num_hypotheses=256,
        refit=lambda a, b, inl: epi.fundamental_8pt(a, b, mask=inl)[0][0])


@jax.jit
def _e_ransac(key, x1, x2, mask, thr):
    return rnsc.ransac(
        key, solver=epi.essential_5pt, residual_fn=epi.sampson_error,
        data=(x1, x2), mask=mask, sample_size=5, threshold=thr,
        num_hypotheses=256,
        refit=lambda a, b, inl: epi.essential_8pt(a, b, mask=inl)[0][0])


def classify_two_view(pix1: np.ndarray, pix2: np.ndarray,
                      K1: np.ndarray, K2: np.ndarray,
                      image_size1: tuple, image_size2: tuple,
                      options: TwoViewOptions = TwoViewOptions(),
                      calibrated: bool = True,
                      seed: int = 0) -> TwoViewResult:
    """Full two-view estimation with model selection.

    pix1/pix2 (N, 2) pixel correspondences; K1/K2 3x3 intrinsics;
    image_size = (width, height).
    """
    n = len(pix1)
    if n < max(options.min_num_inliers, 8):
        return TwoViewResult(DEGENERATE, None, None, None, None, None,
                             np.zeros(n, bool), 0)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    N = _bucket(n)
    mask = np.zeros(N, bool)
    mask[:n] = True

    x1 = (pix1 - K1[:2, 2]) / np.array([K1[0, 0], K1[1, 1]])
    x2 = (pix2 - K2[:2, 2]) / np.array([K2[0, 0], K2[1, 1]])
    f_mean = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
    thr_norm = (options.max_error_px / f_mean) ** 2
    thr_pix = options.max_error_px ** 2

    x1p = jnp.asarray(_pad(x1, N))
    x2p = jnp.asarray(_pad(x2, N))
    p1p = jnp.asarray(_pad(np.asarray(pix1, float), N))
    p2p = jnp.asarray(_pad(np.asarray(pix2, float), N))
    maskj = jnp.asarray(mask)

    resE = _e_ransac(k1, x1p, x2p, maskj, thr_norm)
    resF = _f_ransac(k2, p1p, p2p, maskj, thr_pix)
    resH = _h_ransac(k3, p1p, p2p, maskj, thr_pix)
    nE, nF, nH = (int(resE.num_inliers), int(resF.num_inliers),
                  int(resH.num_inliers))

    # model selection (ref two_view_geometry.cc:113 flow)
    if calibrated and nE >= options.min_num_inliers and nE >= nF:
        best, num_inl, config = resE, nE, CALIBRATED
    elif nF >= options.min_num_inliers:
        best, num_inl, config = resF, nF, UNCALIBRATED
    elif nH >= options.min_num_inliers:
        best, num_inl, config = resH, nH, PLANAR_OR_PANORAMIC
    else:
        return TwoViewResult(DEGENERATE, None, None, None, None, None,
                             np.zeros(n, bool), 0)

    if config in (CALIBRATED, UNCALIBRATED) and \
            nH > options.max_h_inlier_ratio * num_inl:
        config = PLANAR_OR_PANORAMIC
        best, num_inl = resH, nH

    inliers = np.asarray(best.inliers)[:n]

    # watermark: homography that is a pure translation acting on border
    # points (ref DetectWatermark)
    if options.detect_watermark and config == PLANAR_OR_PANORAMIC:
        H = np.asarray(resH.model)
        d = pix2[inliers[: len(pix2)]] - pix1[inliers[: len(pix1)]] \
            if inliers.any() else np.zeros((0, 2))
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
    E = F = H = None
    if config == CALIBRATED:
        E = np.asarray(resE.model)
        if options.compute_relative_pose:
            Rj, tj, nf = epi.pose_from_essential(resE.model, x1p, x2p,
                                                 best.inliers)
            R, t = np.asarray(Rj), np.asarray(tj)
        F = np.asarray(epi.fundamental_from_essential(
            resE.model, jnp.asarray(K1), jnp.asarray(K2)))
    elif config == UNCALIBRATED:
        F = np.asarray(resF.model)
    elif config in (PLANAR_OR_PANORAMIC, PLANAR, PANORAMIC, WATERMARK):
        H = np.asarray(resH.model)
        if options.compute_relative_pose and config != WATERMARK:
            # pose from H in normalized coords
            Hn = np.linalg.inv(K2) @ H @ K1
            R, t, n_pts = pose_from_homography(Hn, x1[inliers], x2[inliers])
            # pure rotation -> PANORAMIC, else PLANAR
            if np.linalg.norm(t) < 1e-4:
                config = PANORAMIC
            else:
                config = PLANAR

    return TwoViewResult(config, E, F, H, R, t, inliers, num_inl)


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
    # cheirality via two-view triangulation: count points with positive
    # depth in BOTH views (same test as essential decomposition)
    import jax.numpy as jnp
    from dagsfm_tpu.ops import rotations as rops
    from dagsfm_tpu.ops import triangulation as tri
    best = None
    best_count = -1
    for (R, t) in cands:
        if len(x1) == 0:
            best = (R, t)
            break
        n_pts = len(x1)
        q1 = np.broadcast_to(np.array([1.0, 0, 0, 0]), (n_pts, 4))
        t1 = np.zeros((n_pts, 3))
        q2 = np.broadcast_to(
            np.asarray(rops.rotmat_to_quat(jnp.asarray(R))), (n_pts, 4))
        t2v = np.broadcast_to(t, (n_pts, 3))
        X = np.asarray(tri.triangulate_two_view(
            jnp.asarray(q1), jnp.asarray(t1), jnp.asarray(q2),
            jnp.asarray(t2v), jnp.asarray(x1), jnp.asarray(x2)))
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        count = int(((z1 > 0) & (z2 > 0)).sum())
        if count > best_count:
            best_count = count
            best = (R, t)
    R, t = best
    nt = np.linalg.norm(t)
    if nt > 1e-12:
        t = t / nt
    return R, t, best_count
