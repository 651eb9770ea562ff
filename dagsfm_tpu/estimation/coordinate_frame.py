"""Coordinate-frame estimation: gravity + Manhattan-world alignment.

Counterpart of /root/reference/src/estimators/coordinate_frame.{h,cc}:

- ``find_best_consensus_axis``  (ref FindBestConsensusAxis, :91-140)
- ``estimate_gravity_vector_from_image_orientation``  (ref :144-153)
- ``estimate_manhattan_world_frame``  (ref :155-239)
- ``rotation_from_unit_vectors``  (ref util/math RotationFromUnitVectors)

TPU-first redesign of the line/vanishing-point stack: the reference runs
LSD (C library) per image and a 2-line RANSAC per orientation class.  Here
edge evidence is accumulated by a gradient-weighted Hough transform — a
batched conv + scatter-add that XLA maps onto the MXU/VPU — and vanishing
points are scored *exhaustively* over all line pairs in one vectorized
pass (the line count is tiny, so exhaustive beats sampling and is
deterministic).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import rotations as rops


# --------------------------------------------------------------- consensus


def find_best_consensus_axis(axes, max_distance: float = 0.05) -> np.ndarray:
    """Pick the axis with most inliers (1 - dot <= max_distance) and
    return the inlier mean (ref FindBestConsensusAxis; O(n^2) pairwise
    dots vectorized)."""
    A = np.asarray(axes, float)
    if A.size == 0:
        return np.zeros(3)
    D = 1.0 - A @ A.T                       # (n, n) pairwise distances
    inl = (D <= max_distance)
    np.fill_diagonal(inl, True)
    counts = inl.sum(axis=1)
    sums = np.where(inl, D, 0.0).sum(axis=1)
    # most inliers, ties broken by smallest inlier distance sum
    best = np.lexsort((sums, -counts))[0]
    sel = inl[best]
    axis = A[sel].sum(axis=0) / sel.sum()
    return axis


def estimate_gravity_vector_from_image_orientation(
        rec, max_axis_distance: float = 0.05) -> np.ndarray:
    """Consensus of per-image downward axes R.row(1)
    (ref coordinate_frame.cc:144-153)."""
    axes = []
    for iid in rec.reg_image_ids:
        im = rec.images[iid]
        R = np.asarray(rops.quat_to_rotmat_np(im.qvec))
        axes.append(R[1])
    return find_best_consensus_axis(axes, max_axis_distance)


def rotation_from_unit_vectors(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit vector v1 onto v2 (Eigen
    Quaterniond::FromTwoVectors parity)."""
    a = np.asarray(v1, float)
    a = a / np.linalg.norm(a)
    b = np.asarray(v2, float)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        if c > 0:
            return np.eye(3)
        # 180°: rotate about any axis orthogonal to a
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, [0.0, 1.0, 0.0])
        axis /= np.linalg.norm(axis)
        return np.asarray(rops.angleaxis_to_rotmat(
            jnp.asarray(axis * np.pi)))
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx / (1.0 + c)


# ------------------------------------------------------- line detection


@dataclasses.dataclass
class ManhattanOptions:
    """Mirrors ref ManhattanWorldFrameEstimationOptions
    (estimators/coordinate_frame.h:46-55)."""
    max_image_size: int = 1024
    num_theta_bins: int = 60
    num_rho_bins: int = 128
    num_lines: int = 24
    min_line_support: float = 20.0
    vertical_tol_deg: float = 20.0       # ref line classification tolerance
    inlier_thresh: float = 0.02
    max_axis_distance: float = 0.05


@functools.partial(jax.jit, static_argnames=("num_theta", "num_rho"))
def _hough_accumulate(img, num_theta: int = 60, num_rho: int = 128):
    """Gradient-weighted Hough accumulator.

    Sobel gradients (conv, VPU/MXU-friendly), each pixel votes into its
    gradient-orientation bin at rho = x cosθ + y sinθ with weight |∇I|.
    Returns (acc[T, R], rho_max).
    """
    img = img.astype(jnp.float32)
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")[None, None]
    gx = jax.lax.conv(pad, kx[None, None], (1, 1), "VALID")[0, 0]
    gy = jax.lax.conv(pad, ky[None, None], (1, 1), "VALID")[0, 0]
    mag = jnp.sqrt(gx * gx + gy * gy)
    # orientation of the gradient = normal of the edge line, in [0, pi)
    theta = jnp.mod(jnp.arctan2(gy, gx), jnp.pi)
    h, w = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    rho = (xs * jnp.cos(theta) + ys * jnp.sin(theta))
    rho_max = jnp.sqrt(float(h * h + w * w))
    t_idx = jnp.clip((theta / jnp.pi * num_theta).astype(jnp.int32),
                     0, num_theta - 1)
    r_idx = jnp.clip(((rho + rho_max) / (2 * rho_max) * num_rho)
                     .astype(jnp.int32), 0, num_rho - 1)
    # suppress weak gradients so texture noise doesn't vote
    thresh = jnp.percentile(mag, 90.0)
    weight = jnp.where(mag > thresh, mag, 0.0)
    acc = jnp.zeros((num_theta, num_rho), jnp.float32)
    acc = acc.at[t_idx.ravel(), r_idx.ravel()].add(weight.ravel())
    return acc, rho_max


def detect_lines(img: np.ndarray, opts: ManhattanOptions = None):
    """Top-K Hough-peak lines.  Returns (lines[K,3] homogeneous with unit
    normal, support[K], theta[K]); lines in pixel coordinates."""
    opts = opts or ManhattanOptions()
    acc, rho_max = _hough_accumulate(
        jnp.asarray(img), opts.num_theta_bins, opts.num_rho_bins)
    acc = np.asarray(acc)
    rho_max = float(rho_max)
    # 3x3 non-max suppression (theta wraps)
    padded = np.pad(acc, ((1, 1), (1, 1)), mode="wrap")
    neigh = np.max(
        [padded[i:i + acc.shape[0], j:j + acc.shape[1]]
         for i in range(3) for j in range(3)], axis=0)
    peaks = np.where(acc >= neigh, acc, 0.0)
    flat = np.argsort(peaks.ravel())[::-1][:opts.num_lines]
    t_idx, r_idx = np.unravel_index(flat, acc.shape)
    support = peaks.ravel()[flat]
    keep = support > opts.min_line_support
    t_idx, r_idx, support = t_idx[keep], r_idx[keep], support[keep]
    theta = (t_idx + 0.5) / opts.num_theta_bins * np.pi
    rho = (r_idx + 0.5) / opts.num_rho_bins * 2 * rho_max - rho_max
    lines = np.stack([np.cos(theta), np.sin(theta), -rho], axis=1)
    return lines, support, theta


def estimate_vanishing_point(lines: np.ndarray, weights: np.ndarray,
                             inlier_thresh: float = 0.02,
                             focal: float = 1.0):
    """Best vanishing point by exhaustive pair scoring (replaces the ref's
    2-line RANSAC, coordinate_frame.cc:45-89 — exhaustive is cheap and
    deterministic at K<=32 lines).

    Lines must have unit normals; residual is the normalized incidence
    |l · v̂| with v scaled so the point part is comparable to focal units.
    Returns (vp[3] or None, inlier_mask).
    """
    K = len(lines)
    if K < 2:
        return None, np.zeros(K, bool)
    ii, jj = np.triu_indices(K, 1)
    vps = np.cross(lines[ii], lines[jj])          # (P, 3)
    # normalize candidates: scale homogeneous part by focal so angular
    # residuals are scale-free
    vn = vps / np.maximum(
        np.linalg.norm(vps[:, :2], axis=1, keepdims=True)
        + np.abs(vps[:, 2:]) / focal, 1e-12)
    res = np.abs(vn @ lines.T) / focal            # (P, K)
    inl = res < inlier_thresh
    score = (inl * weights[None, :]).sum(axis=1)
    best = int(np.argmax(score))
    if score[best] <= 0:
        return None, np.zeros(K, bool)
    return vps[best], inl[best]


def estimate_manhattan_world_frame(rec, images: dict,
                                   opts: ManhattanOptions = None,
                                   cameras: dict = None) -> np.ndarray:
    """Estimate the Manhattan frame [right | down | forward] in world
    coordinates (ref EstimateManhattanWorldFrame,
    coordinate_frame.cc:155-239).

    ``images`` maps image_id -> grayscale float array.  Per image: Hough
    lines -> classify near-vertical vs horizontal by line direction (ref
    ClassifyLineSegmentOrientations) -> one VP per class -> back-project
    VP through K^-1, rotate to world, consensus over images.
    """
    opts = opts or ManhattanOptions()
    down_axes, right_axes = [], []
    for iid in rec.reg_image_ids:
        if iid not in images:
            continue
        img = np.asarray(images[iid], np.float32)
        scale = 1.0
        m = max(img.shape)
        if m > opts.max_image_size:
            step = int(np.ceil(m / opts.max_image_size))
            img = img[::step, ::step]
            scale = 1.0 / step
        im = rec.images[iid]
        cam = (cameras or rec.cameras)[im.camera_id]
        f = float(np.mean(cam.focal())) * scale if hasattr(cam, "focal") \
            else float(cam.params[0]) * scale
        cx, cy = img.shape[1] / 2.0, img.shape[0] / 2.0
        lines, support, theta = detect_lines(img, opts)
        if len(lines) < 4:
            continue
        # shift lines to principal-point-centered coords:
        # l' = [a, b, c + a*cx + b*cy]
        lines_c = lines.copy()
        lines_c[:, 2] += lines[:, 0] * cx + lines[:, 1] * cy
        # vertical image lines have near-horizontal normals (theta ~ 0/pi)
        tol = np.deg2rad(opts.vertical_tol_deg)
        is_vert = np.minimum(theta, np.pi - theta) < tol
        R = np.asarray(rops.quat_to_rotmat_np(rec.images[iid].qvec))
        for mask, store, ref_dir in (
                (is_vert, down_axes, np.array([0.0, 1.0, 0.0])),
                (~is_vert, right_axes, np.array([1.0, 0.0, 0.0]))):
            if mask.sum() < 2:
                continue
            vp, _ = estimate_vanishing_point(
                lines_c[mask], support[mask], opts.inlier_thresh, f)
            if vp is None:
                continue
            d_cam = np.array([vp[0] / f, vp[1] / f, vp[2]])
            n = np.linalg.norm(d_cam)
            if n < 1e-9:
                continue
            d_cam /= n
            if d_cam @ ref_dir < 0:
                d_cam = -d_cam
            store.append(R.T @ d_cam)
    down = find_best_consensus_axis(down_axes, opts.max_axis_distance) \
        if down_axes else np.zeros(3)
    right = find_best_consensus_axis(right_axes, opts.max_axis_distance) \
        if right_axes else np.zeros(3)
    frame = np.zeros((3, 3))
    if np.linalg.norm(down) > 0:
        frame[:, 1] = down / np.linalg.norm(down)
    if np.linalg.norm(right) > 0:
        r = right
        if np.linalg.norm(down) > 0:      # orthogonalize against down
            r = r - (r @ frame[:, 1]) * frame[:, 1]
        if np.linalg.norm(r) > 1e-9:
            frame[:, 0] = r / np.linalg.norm(r)
    if np.linalg.norm(frame[:, 0]) > 0 and np.linalg.norm(frame[:, 1]) > 0:
        frame[:, 2] = np.cross(frame[:, 0], frame[:, 1])
    return frame


def align_to_manhattan_world(rec, frame: np.ndarray) -> np.ndarray:
    """Rotation applied by model_orientation_aligner given an estimated
    frame (ref exe/colmap.cc:1347-1373): full frame -> frame^T; one axis
    -> rotation of that axis onto the canonical direction."""
    if np.count_nonzero(frame[:, 0]) == 0:
        return rotation_from_unit_vectors(frame[:, 1], [0, 1, 0])
    if np.count_nonzero(frame[:, 1]) == 0:
        return rotation_from_unit_vectors(frame[:, 0], [1, 0, 0])
    return frame.T


# -------------------------------------------------- line segments (LSD role)


def detect_line_segments(img: np.ndarray, min_length: float = 3.0,
                         opts: ManhattanOptions = None,
                         band_px: float = 2.0, gap_px: float = 4.0):
    """Line SEGMENTS with endpoints (ref base/line.h DetectLineSegments,
    backed there by the vendored LSD C library).

    TPU-first replacement for LSD's sequential region growing: Hough
    peaks give candidate lines (one batched accumulation, detect_lines);
    each line's supporting pixels (gradient orientation within the
    line's theta bin AND within band_px of the line) are projected onto
    the line direction in one vectorized pass, and contiguous runs
    (gaps > gap_px split) become segments. Returns (segments (S, 2, 2)
    [start, end] in pixel coords, line_idx (S,) into the Hough lines).
    """
    opts = opts or ManhattanOptions()
    lines, support, thetas = detect_lines(img, opts)
    if len(lines) == 0:
        return np.zeros((0, 2, 2)), np.zeros(0, int)

    im = np.asarray(img, np.float32)
    gx = np.zeros_like(im)
    gy = np.zeros_like(im)
    gx[:, 1:-1] = im[:, 2:] - im[:, :-2]
    gy[1:-1, :] = im[2:, :] - im[:-2, :]
    mag = np.hypot(gx, gy)
    ang = np.mod(np.arctan2(gy, gx), np.pi)
    strong = mag > np.percentile(mag, 90.0)
    ys, xs = np.nonzero(strong)
    pix_ang = ang[ys, xs]

    segments = []
    seg_line = []
    dth = np.pi / opts.num_theta_bins
    for k, (ln, th) in enumerate(zip(lines, thetas)):
        # orientation gate (wrap at pi) + distance-to-line gate
        dang = np.abs(np.mod(pix_ang - th + np.pi / 2, np.pi) - np.pi / 2)
        near = dang < dth
        d = np.abs(ln[0] * xs[near] + ln[1] * ys[near] + ln[2])
        sel = d < band_px
        if sel.sum() < min_length:
            continue
        xn, yn = xs[near][sel], ys[near][sel]
        # parameter along the line direction (-sin, cos)
        t = -np.sin(th) * xn + np.cos(th) * yn
        order = np.argsort(t)
        ts = t[order]
        cut = np.nonzero(np.diff(ts) > gap_px)[0]
        starts = np.concatenate([[0], cut + 1])
        ends = np.concatenate([cut, [len(ts) - 1]])
        # foot of the line: point closest to origin
        x0, y0 = -ln[2] * ln[0], -ln[2] * ln[1]
        dvec = np.array([-np.sin(th), np.cos(th)])
        for s, e in zip(starts, ends):
            if ts[e] - ts[s] >= min_length:
                p0 = np.array([x0, y0]) + ts[s] * dvec
                p1 = np.array([x0, y0]) + ts[e] * dvec
                segments.append(np.stack([p0, p1]))
                seg_line.append(k)
    if not segments:
        return np.zeros((0, 2, 2)), np.zeros(0, int)
    return np.stack(segments), np.asarray(seg_line)


HORIZONTAL, VERTICAL, UNDEFINED = 1, -1, 0


def classify_line_segment_orientations(segments: np.ndarray,
                                       tolerance: float = 0.25):
    """HORIZONTAL / VERTICAL / UNDEFINED per segment (ref base/line.h
    ClassifyLineSegmentOrientations: |direction| component within
    `tolerance` of axis-aligned)."""
    if len(segments) == 0:
        return np.zeros(0, int)
    d = segments[:, 1] - segments[:, 0]
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    out = np.full(len(segments), UNDEFINED, int)
    out[np.abs(d[:, 1]) < tolerance] = HORIZONTAL
    out[np.abs(d[:, 0]) < tolerance] = VERTICAL
    return out
