"""Batched SIFT extraction as one jitted XLA program.

TPU-native counterpart of /root/reference/src/feature/sift.{h,cc}
(VLFeat CPU path `ExtractSiftFeaturesCPU` sift.h:169 and the SiftGPU
path :182-187) and of the resizer→extractor→writer thread pipeline
(feature/extraction.{h,cc}:50-105,112-207). The thread pipeline becomes a
single fused batch: (B, H, W) images in, padded keypoint/descriptor
arrays out.

Stages (all fixed-shape, fully vmapped over the batch):
  1. Gaussian scale-space pyramid — separable convs (XLA fuses to MXU/VPU).
  2. DoG extrema: 3x3x3 neighborhood argmax via shifted comparisons.
  3. Fixed-budget candidate selection per octave via top_k on |DoG|.
  4. Sub-pixel/scale refinement: one 3x3 Hessian solve per candidate
     + contrast & edge-ratio rejection (Lowe's checks; ref sift.h:44-114
     options peak_threshold / edge_threshold).
  5. Orientation: 36-bin smoothed gradient histogram, parabola-refined
     dominant peak.
  6. Descriptor: rotated 4x4x8 gradient histogram over a bilinear-sampled
     patch grid, trilinear soft-binning, L2->clip(0.2)->renorm, then
     L1-root (ref SiftExtractionOptions::Normalization::L1_ROOT default).

Output keypoints use COLMAP pixel convention (x right, y down, origin at
top-left corner of pixel 0 = coordinate 0.5 offsets preserved by the
caller's usage; scale/orientation returned for parity).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class SiftOptions(NamedTuple):
    # ref sift.h:44-114 defaults: num_octaves 4 (VLFeat: from image size
    # when negative), first_octave -1 (2x upsampled base octave),
    # max_image_size 3200, max_num_features 8192
    num_octaves: int = 0                # 0 = derive from image size
    first_octave: int = -1              # -1 = 2x upsampling (ref default)
    max_image_size: int = 3200          # resize bound (applied by caller
                                        # helpers / FeaturePipeline)
    scales_per_octave: int = 3          # ref octave_resolution 3
    sigma0: float = 1.6
    first_octave_blur: float = 0.5      # assumed input blur
    peak_threshold: float = 0.0067      # ref 0.02 / octave_resolution
    edge_threshold: float = 10.0
    max_num_features: int = 8192        # per image (ref 8192)
    candidates_per_octave: int = 1024
    # scale each octave's candidate budget by its pixel area (the
    # per-candidate refine/orient/describe work is the SIFT hot loop;
    # small octaves physically cannot produce `candidates_per_octave`
    # extrema, so fixed budgets waste ~2x device time)
    adaptive_candidates: bool = True
    descriptor_patch: int = 16          # sample grid (4 bins x 4 samples)
    l1_root: bool = True
    # ref sift.h:44-114 extras:
    upright: bool = False               # skip orientation (ref upright)
    domain_size_pooling: bool = False   # DSP-SIFT (ref dsp_*)
    dsp_min_scale: float = 1.0 / 6.0
    dsp_max_scale: float = 3.0
    dsp_num_scales: int = 10
    estimate_affine_shape: bool = False  # covdet-style affine adaptation
    # patch sampling: per-keypoint dynamic-slice patch extraction + in-
    # patch bilinear via one-hot matmuls — replaces per-sample HBM
    # scalar gathers (the TPU SIFT hot spot; scalar gathers serialize)
    # with contiguous patch DMAs + MXU work (2.5x extract throughput on
    # one v5e chip, bit-identical descriptors). None = auto: on for
    # accelerator backends, off for CPU (CPU gathers are cheap, one-hot
    # matmuls are not). Falls back to the gather path for DSP/affine
    # variants (their sample extents exceed the static patch bound).
    patch_sampling: bool | None = None
    patch_chunk: int = 128               # keypoints per patch batch


class SiftFeatures(NamedTuple):
    xy: jax.Array       # (B, K, 2) pixel coords (x, y)
    scale: jax.Array    # (B, K) sigma in input-image pixels
    orientation: jax.Array  # (B, K) radians
    score: jax.Array    # (B, K) |DoG| response
    descriptor: jax.Array   # (B, K, 128) float32, normalized
    mask: jax.Array     # (B, K) valid


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur for (B, H, W).

    Implemented as static shifted-slice multiply-adds instead of
    conv_general_dilated: a (B, 1, H, W) single-channel conv makes
    XLA:TPU tile the (B, C) dims — a 128x layout-padding blowup that
    OOMs on upsampled pyramids. Shifted adds keep the clean (H, W)
    minor-dims layout and fuse into one VPU loop.
    """
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gauss_kernel1d(sigma, radius)
    B, H, W = img.shape
    xp = jnp.pad(img, ((0, 0), (0, 0), (radius, radius)))
    out = k[0] * xp[:, :, 0:W]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * xp[:, :, i:i + W]
    xp = jnp.pad(out, ((0, 0), (radius, radius), (0, 0)))
    out = k[0] * xp[:, 0:H, :]
    for i in range(1, 2 * radius + 1):
        out = out + k[i] * xp[:, i:i + H, :]
    return out


def _downsample(img: jax.Array) -> jax.Array:
    return img[:, ::2, ::2]


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """img (H, W); y, x broadcastable float coords -> samples."""
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    dy = jnp.clip(y - y0, 0.0, 1.0)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - dy) * (1 - dx) + v01 * (1 - dy) * dx
            + v10 * dy * (1 - dx) + v11 * dy * dx)


def _bilinear_lvl(gauss: jax.Array, lvl: jax.Array, y: jax.Array,
                  x: jax.Array) -> jax.Array:
    """Bilinear sample of level `lvl` of a (NS, H, W) stack.

    The level index is FUSED into the gather: `gauss[lvl][y, x]` under a
    per-keypoint vmap would materialize a (K, H, W) copy of the pyramid
    level (a 40GB intermediate at 8192 keypoints on upsampled images —
    a real TPU OOM); `gauss[lvl, y, x]` is one small gather per sample.
    """
    NS, H, W = gauss.shape
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    dy = jnp.clip(y - y0, 0.0, 1.0)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    v00 = gauss[lvl, y0, x0]
    v01 = gauss[lvl, y0, x0 + 1]
    v10 = gauss[lvl, y0 + 1, x0]
    v11 = gauss[lvl, y0 + 1, x0 + 1]
    return (v00 * (1 - dy) * (1 - dx) + v01 * (1 - dy) * dx
            + v10 * dy * (1 - dx) + v11 * dy * dx)


def _octave_budget(H: int, W: int, opts: SiftOptions) -> int:
    """Candidate slots for an octave of H x W pixels: ~1 per 128 px,
    rounded up to a lane multiple, clamped to candidates_per_octave."""
    if not opts.adaptive_candidates:
        return opts.candidates_per_octave
    want = -(-(H * W) // 128)
    want = -(-want // 128) * 128
    return int(min(opts.candidates_per_octave, max(128, want)))


def _nearest_lvl(gauss: jax.Array, lvl: jax.Array, y: jax.Array,
                 x: jax.Array) -> jax.Array:
    """Nearest-pixel sample of level `lvl` of a (NS, H, W) stack — one
    gather per sample vs four for bilinear. Used for the orientation
    histogram, which is 2x-smoothed and parabola-refined and therefore
    insensitive to sub-pixel sampling (VLFeat likewise accumulates the
    orientation window over integer pixels)."""
    NS, H, W = gauss.shape
    yi = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
    return gauss[lvl, yi, xi]


def _extract_octave(gauss: jax.Array, octave: int, opts: SiftOptions):
    """Per-octave candidate detection + refinement + orientation + desc.

    gauss: (B, S+3, H, W) Gaussian images of this octave.
    Returns per-image padded candidate arrays (fixed K_oct).
    """
    B, NS, H, W = gauss.shape
    S = opts.scales_per_octave
    dog = gauss[:, 1:] - gauss[:, :-1]                  # (B, S+2, H, W)
    K_oct = _octave_budget(H, W, opts)

    # ---- 3x3x3 extrema ---------------------------------------------------
    def shift(a, ds, dy, dx):
        return jnp.roll(a, (-ds, -dy, -dx), axis=(1, 2, 3))

    center = dog
    is_max = jnp.ones_like(dog, bool)
    is_min = jnp.ones_like(dog, bool)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == dy == dx == 0:
                    continue
                nb = shift(dog, ds, dy, dx)
                is_max = is_max & (center > nb)
                is_min = is_min & (center < nb)
    extremum = (is_max | is_min) & \
        (jnp.abs(center) > 0.8 * opts.peak_threshold)
    # valid interior only: scales 1..S, borders of 8px
    bm = jnp.zeros((NS - 1, H, W), bool)
    bm = bm.at[1:S + 1, 8:H - 8, 8:W - 8].set(True)
    extremum = extremum & bm[None]

    score = jnp.where(extremum, jnp.abs(center), 0.0)   # (B, S+2, H, W)
    flat = score.reshape(B, -1)
    if flat.shape[-1] > (1 << 16):
        # TPU-native approximate top-k (bitonic partial reduction) —
        # candidate selection needs no exact ordering
        vals, idx = jax.lax.approx_max_k(flat, K_oct,
                                         recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(flat, K_oct)          # (B, K_oct)
    ks = idx // (H * W)
    ky = (idx // W) % H
    kx = idx % W
    valid = vals > opts.peak_threshold * 0.8

    # ---- sub-pixel refinement (one Newton step) -------------------------
    def refine_one(dog_b, s, y, x):
        # 3D gradient & Hessian via central differences
        g = jnp.array([
            (dog_b[s + 1, y, x] - dog_b[s - 1, y, x]) * 0.5,
            (dog_b[s, y + 1, x] - dog_b[s, y - 1, x]) * 0.5,
            (dog_b[s, y, x + 1] - dog_b[s, y, x - 1]) * 0.5,
        ])
        c = dog_b[s, y, x]
        hss = dog_b[s + 1, y, x] + dog_b[s - 1, y, x] - 2 * c
        hyy = dog_b[s, y + 1, x] + dog_b[s, y - 1, x] - 2 * c
        hxx = dog_b[s, y, x + 1] + dog_b[s, y, x - 1] - 2 * c
        hsy = (dog_b[s + 1, y + 1, x] - dog_b[s + 1, y - 1, x]
               - dog_b[s - 1, y + 1, x] + dog_b[s - 1, y - 1, x]) * 0.25
        hsx = (dog_b[s + 1, y, x + 1] - dog_b[s + 1, y, x - 1]
               - dog_b[s - 1, y, x + 1] + dog_b[s - 1, y, x - 1]) * 0.25
        hyx = (dog_b[s, y + 1, x + 1] - dog_b[s, y + 1, x - 1]
               - dog_b[s, y - 1, x + 1] + dog_b[s, y - 1, x - 1]) * 0.25
        Hm = jnp.array([[hss, hsy, hsx], [hsy, hyy, hyx], [hsx, hyx, hxx]])
        Hm = Hm + 1e-9 * jnp.eye(3)
        off = -jnp.linalg.solve(Hm, g)
        contrast = c + 0.5 * jnp.dot(g, off)
        # edge check on spatial Hessian
        tr = hyy + hxx
        det = hyy * hxx - hyx * hyx
        r = opts.edge_threshold
        edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
        off_ok = jnp.all(jnp.abs(off) < 1.5)
        ok = edge_ok & off_ok & \
            (jnp.abs(contrast) > opts.peak_threshold)
        return off, ok

    def per_image(dog_b, gauss_b, ks_b, ky_b, kx_b, valid_b):
        offs, oks = jax.vmap(lambda s, y, x: refine_one(dog_b, s, y, x))(
            ks_b, ky_b, kx_b)
        sf = ks_b + offs[:, 0]
        yf = ky_b + offs[:, 1]
        xf = kx_b + offs[:, 2]
        ok = valid_b & oks
        sigma = opts.sigma0 * 2.0 ** (sf / S)           # octave units
        # orientation + descriptor from nearest gauss level
        lvl = jnp.clip(jnp.round(sf).astype(jnp.int32), 0, S + 1)
        ori, desc = _orient_and_describe(gauss_b, lvl, yf, xf, sigma, opts)
        return xf, yf, sigma, ori, desc, ok

    xf, yf, sigma, ori, desc, ok = jax.vmap(per_image)(
        dog, gauss, ks, ky, kx, valid)
    scale_mult = 2.0 ** octave  # negative octave = upsampled base
    return (jnp.stack([xf, yf], -1) * scale_mult, sigma * scale_mult,
            ori, vals, desc, ok)


def _patch_size(opts: SiftOptions) -> int:
    """Static per-octave patch bound covering every sample position:
    descriptor extent 6σ rotated (×√2) at the octave's max level σ."""
    sigma_max = opts.sigma0 * 2.0 ** ((opts.scales_per_octave + 1)
                                      / opts.scales_per_octave)
    half = 6.0 * sigma_max * math.sqrt(2.0) + 2.0
    ps = 2 * int(math.ceil(half)) + 2
    return -(-ps // 8) * 8


def _extract_patches(gauss_b, lvl, yf, xf, PS: int):
    """(C, PS, PS) level-local patches around keypoints + int origins.

    One vmapped dynamic_slice per keypoint: a contiguous (PS, PS) DMA
    instead of hundreds of scalar gathers."""
    NS, H, W = gauss_b.shape
    oy = jnp.clip(jnp.round(yf).astype(jnp.int32) - PS // 2, 0,
                  max(H - PS, 0))
    ox = jnp.clip(jnp.round(xf).astype(jnp.int32) - PS // 2, 0,
                  max(W - PS, 0))

    def one(l, oy1, ox1):
        return jax.lax.dynamic_slice(gauss_b, (l, oy1, ox1),
                                     (1, PS, PS))[0]

    return jax.vmap(one)(lvl, oy, ox), oy, ox


@functools.lru_cache(maxsize=4)
def _spatial_weight_matrix_np(P: int):
    """(P², 16) constant trilinear spatial-bin weights of the 4x4 grid.

    Returns NUMPY (cached); jnp conversion happens at the use site — a
    cached jnp array created inside one jit trace would leak its tracer
    into later traces."""
    half = P / 2.0
    gg_np = ((np.arange(P, dtype=np.float32) - half + 0.5) / half)
    by = np.broadcast_to(((gg_np[:, None] + 1.0) * 2.0 - 0.5), (P, P))
    bx = np.broadcast_to(((gg_np[None, :] + 1.0) * 2.0 - 0.5), (P, P))
    S = np.zeros((P * P, 16), np.float32)
    y0 = np.floor(by)
    x0 = np.floor(bx)
    for dyy in (0, 1):
        for dxx in (0, 1):
            yy = y0 + dyy
            xx = x0 + dxx
            w = (1 - np.abs(by - yy)) * (1 - np.abs(bx - xx))
            ok = (yy >= 0) & (yy < 4) & (xx >= 0) & (xx < 4)
            lin = (np.clip(yy, 0, 3) * 4 + np.clip(xx, 0, 3))
            np.add.at(S, (np.arange(P * P),
                          lin.astype(np.int64).reshape(-1)),
                      np.where(ok, w, 0.0).reshape(-1))
    return S


def _spatial_weight_matrix(P: int):
    return jnp.asarray(_spatial_weight_matrix_np(P))


def _normalize_desc(out, l1_root: bool):
    """L2 -> clip 0.2 -> L2; optional L1-root (ref L1_ROOT)."""
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1,
                                            keepdims=True), 1e-9)
    out = jnp.minimum(out, 0.2)
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1,
                                            keepdims=True), 1e-9)
    if l1_root:
        out = jnp.sqrt(out / jnp.maximum(
            jnp.sum(jnp.abs(out), axis=-1, keepdims=True), 1e-9))
    return out


def _nearest_patch(patch, yr, xr):
    """Nearest-pixel samples of one (PS, PS) patch via one-hot matmuls
    (matches the gather path's orientation sampling exactly)."""
    PS = patch.shape[0]
    yi = jnp.clip(jnp.round(yr), 0, PS - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(xr), 0, PS - 1).astype(jnp.int32)
    Ay = jax.nn.one_hot(yi, PS, dtype=patch.dtype)
    Ax = jax.nn.one_hot(xi, PS, dtype=patch.dtype)
    T = Ay @ patch
    return jnp.einsum("mp,mp->m", T, Ax)


def _bilinear_patch(patch, yr, xr):
    """Bilinear samples of one (PS, PS) patch at flat float positions —
    expressed as two thin one-hot matmuls so the whole sampling runs on
    the MXU (zero gathers)."""
    PS = patch.shape[0]
    y0 = jnp.clip(jnp.floor(yr), 0, PS - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xr), 0, PS - 2).astype(jnp.int32)
    wy = jnp.clip(yr - y0, 0.0, 1.0)
    wx = jnp.clip(xr - x0, 0.0, 1.0)
    Ay = jax.nn.one_hot(y0, PS, dtype=patch.dtype) * (1 - wy)[:, None] \
        + jax.nn.one_hot(y0 + 1, PS, dtype=patch.dtype) * wy[:, None]
    Ax = jax.nn.one_hot(x0, PS, dtype=patch.dtype) * (1 - wx)[:, None] \
        + jax.nn.one_hot(x0 + 1, PS, dtype=patch.dtype) * wx[:, None]
    T = Ay @ patch                                       # (m, PS)
    return jnp.einsum("mp,mp->m", T, Ax)


def _orient_and_describe(gauss_b, lvl, yf, xf, sigma, opts: SiftOptions):
    """Orientation histogram + 128-d descriptor for K keypoints of one
    image. gauss_b (NS, H, W); lvl/yf/xf/sigma (K,)."""
    NS, H, W = gauss_b.shape
    K = yf.shape[0]
    P = opts.descriptor_patch

    PS = _patch_size(opts)
    if (opts.patch_sampling and not opts.estimate_affine_shape
            and not opts.domain_size_pooling and H >= PS and W >= PS
            and K % opts.patch_chunk == 0):
        return _orient_and_describe_patches(gauss_b, lvl, yf, xf, sigma,
                                            opts, PS)

    # --- orientation: 36-bin histogram over a square window ~ r=4 sigma
    nb = 8  # half-window samples
    grid = jnp.arange(-nb, nb + 1, dtype=jnp.float32)    # 17

    def orient_one(lvl, y, x, s):
        step = 1.5 * s / nb * 3.0
        ys = y + grid[:, None] * step
        xs = x + grid[None, :] * step
        v = _nearest_lvl(gauss_b, lvl, ys, xs)           # (17, 17)
        gy = jnp.gradient(v, axis=0)
        gx = jnp.gradient(v, axis=1)
        mag = jnp.sqrt(gx * gx + gy * gy)
        w = jnp.exp(-(grid[:, None] ** 2 + grid[None, :] ** 2)
                    / (2 * (nb / 1.5) ** 2))
        ang = jnp.arctan2(gy, gx)
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(
            jnp.int32) % 36
        # scatter-free histogram: one-hot matmul (vmapped -> MXU batch)
        hist = jnp.einsum("s,sb->b", (mag * w).reshape(-1),
                          jax.nn.one_hot(bins.reshape(-1), 36))
        # circular smooth x2
        for _ in range(2):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        l = hist[(peak - 1) % 36]
        c = hist[peak]
        r = hist[(peak + 1) % 36]
        denom = l - 2 * c + r
        dpk = jnp.where(jnp.abs(denom) < 1e-9, 0.0,
                        0.5 * (l - r) / denom)
        theta = (peak + dpk + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi
        return theta

    if opts.upright:
        theta = jnp.zeros_like(yf)
    else:
        theta = jax.vmap(orient_one)(lvl, yf, xf, sigma)

    # --- optional affine shape (ref estimate_affine_shape / covdet):
    # one-shot second-moment-matrix adaptation — the sampling grid is
    # warped by M^{-1/2} (normalized to unit det) around the keypoint
    if opts.estimate_affine_shape:
        def affine_one(lvl, y, x, s):
            step = 1.5 * s / nb * 2.0
            ys = y + grid[:, None] * step
            xs = x + grid[None, :] * step
            v = _bilinear_lvl(gauss_b, lvl, ys, xs)
            gy = jnp.gradient(v, axis=0)
            gx = jnp.gradient(v, axis=1)
            w = jnp.exp(-(grid[:, None] ** 2 + grid[None, :] ** 2)
                        / (2 * (nb / 1.5) ** 2))
            mxx = jnp.sum(w * gx * gx)
            mxy = jnp.sum(w * gx * gy)
            myy = jnp.sum(w * gy * gy)
            M = jnp.array([[mxx, mxy], [mxy, myy]])
            M = M / jnp.maximum(jnp.trace(M), 1e-12)
            # inverse square root via eigendecomposition (2x2 closed)
            tr = M[0, 0] + M[1, 1]
            det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
            disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 1e-18))
            l1 = tr / 2 + disc
            l2 = jnp.maximum(tr / 2 - disc, 1e-9)
            # eigvec for l1
            e1 = jnp.where(jnp.abs(M[0, 1]) > 1e-12,
                           jnp.array([M[0, 1], l1 - M[0, 0]]),
                           jnp.array([1.0, 0.0]))
            e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
            e2 = jnp.array([-e1[1], e1[0]])
            V = jnp.stack([e1, e2], axis=1)
            Ainv = V @ jnp.diag(jnp.array(
                [l1 ** -0.5, l2 ** -0.5])) @ V.T
            # normalize to unit determinant so scale stays s
            Ainv = Ainv / jnp.sqrt(jnp.maximum(
                jnp.linalg.det(Ainv), 1e-12))
            return Ainv

        Aff = jax.vmap(affine_one)(lvl, yf, xf, sigma)   # (K, 2, 2)
    else:
        Aff = jnp.broadcast_to(jnp.eye(2), (K, 2, 2))

    # --- descriptor: 4x4 spatial bins x 8 orientation bins.
    # The spatial-bin soft weights depend only on the FIXED sample grid,
    # so trilinear binning factorizes into descriptor = Sᵀ·diag(mag)·O:
    # S (P², 16) is a CONSTANT spatial-weight matrix, O (P², 8) the
    # data-dependent orientation-weight matrix — one small MXU matmul
    # per keypoint instead of 8 scatter-add passes (TPU scatters
    # serialize and bloat the HLO).
    half = P / 2.0
    gg = (jnp.arange(P, dtype=jnp.float32) - half + 0.5) / half  # [-1,1)

    S_mat = _spatial_weight_matrix(P)                    # (P², 16) const
    w_gauss = jnp.exp(-(gg[:, None] ** 2 + gg[None, :] ** 2) / (2 * 0.5))

    def desc_one(lvl, y, x, s, th, A):
        ct = jnp.cos(th)
        st = jnp.sin(th)
        # patch extent: 4 bins * 3 sigma per bin / 2 = 6 sigma half-width
        ext = 6.0 * s
        u = gg[:, None] * ext                            # (P, 1) local y
        v = gg[None, :] * ext                            # (1, P) local x
        # rotate local coords by theta, then affine-warp
        uy = u * ct - v * st
        ux = u * st + v * ct
        ys = y + A[0, 0] * uy + A[0, 1] * ux
        xs = x + A[1, 0] * uy + A[1, 1] * ux
        val = _bilinear_lvl(gauss_b, lvl, ys, xs)        # (P, P)
        gy = jnp.gradient(val, axis=0)
        gx = jnp.gradient(val, axis=1)
        mag = (jnp.sqrt(gx * gx + gy * gy) * w_gauss).reshape(-1)
        ang = jnp.arctan2(gy, gx) - th
        ob = ((ang + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi)
              * 8.0).reshape(-1)
        o0 = jnp.floor(ob)
        fo = ob - o0
        o0i = o0.astype(jnp.int32) % 8
        O = jax.nn.one_hot(o0i, 8) * (1.0 - fo)[:, None] + \
            jax.nn.one_hot((o0i + 1) % 8, 8) * fo[:, None]  # (P², 8)
        D = jnp.einsum("s,si,sj->ij", mag, S_mat, O)        # (16, 8)
        return D.reshape(128)

    def normalize(out):
        return _normalize_desc(out, opts.l1_root)

    if opts.domain_size_pooling:
        # DSP-SIFT (ref dsp_min/max_scale, dsp_num_scales): pool the raw
        # histograms over a range of domain sizes, then normalize once —
        # one extra vmap axis, embarrassingly batched on device
        mults = jnp.linspace(opts.dsp_min_scale, opts.dsp_max_scale,
                             opts.dsp_num_scales)
        raw = jax.vmap(
            lambda m: jax.vmap(desc_one)(lvl, yf, xf, sigma * m, theta,
                                         Aff))(mults)    # (M, K, 128)
        desc = normalize(jnp.mean(raw, axis=0))
    else:
        desc = normalize(jax.vmap(desc_one)(lvl, yf, xf, sigma, theta,
                                            Aff))
    return theta, desc


def _orient_and_describe_patches(gauss_b, lvl, yf, xf, sigma,
                                 opts: SiftOptions, PS: int):
    """Patch-sampling variant of _orient_and_describe: one contiguous
    (PS, PS) dynamic-slice DMA per keypoint, then ALL sample
    interpolation as one-hot matmuls inside the patch — zero scalar
    gathers on the hot path (the TPU bottleneck the gather variant
    hits). Keypoints are processed in fixed chunks under lax.map to
    bound the patch working set.
    """
    K = yf.shape[0]
    P = opts.descriptor_patch
    CH = opts.patch_chunk
    nb = 8
    ogrid = jnp.arange(-nb, nb + 1, dtype=jnp.float32)   # 17
    w_orient = jnp.exp(-(ogrid[:, None] ** 2 + ogrid[None, :] ** 2)
                       / (2 * (nb / 1.5) ** 2)).reshape(-1)
    half = P / 2.0
    gg = (jnp.arange(P, dtype=jnp.float32) - half + 0.5) / half
    S_mat = _spatial_weight_matrix(P)
    w_gauss = jnp.exp(-(gg[:, None] ** 2 + gg[None, :] ** 2)
                      / (2 * 0.5)).reshape(-1)

    def orient_one(patch, ry, rx, s):
        step = 1.5 * s / nb * 3.0
        ys = (ry + ogrid[:, None] * step
              + jnp.zeros_like(ogrid)[None, :]).reshape(-1)
        xs = (rx + ogrid[None, :] * step
              + jnp.zeros_like(ogrid)[:, None]).reshape(-1)
        v = _nearest_patch(patch, ys, xs).reshape(17, 17)
        gy = jnp.gradient(v, axis=0)
        gx = jnp.gradient(v, axis=1)
        mag = jnp.sqrt(gx * gx + gy * gy).reshape(-1)
        ang = jnp.arctan2(gy, gx)
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(
            jnp.int32).reshape(-1) % 36
        hist = jnp.einsum("s,sb->b", mag * w_orient,
                          jax.nn.one_hot(bins, 36))
        for _ in range(2):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        left = hist[(peak - 1) % 36]
        c = hist[peak]
        right = hist[(peak + 1) % 36]
        denom = left - 2 * c + right
        dpk = jnp.where(jnp.abs(denom) < 1e-9, 0.0,
                        0.5 * (left - right) / denom)
        return (peak + dpk + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    def desc_one(patch, ry, rx, s, th):
        ct = jnp.cos(th)
        st = jnp.sin(th)
        ext = 6.0 * s
        u = gg[:, None] * ext
        v = gg[None, :] * ext
        uy = u * ct - v * st
        ux = u * st + v * ct
        ys = (ry + uy).reshape(-1)
        xs = (rx + ux).reshape(-1)
        val = _bilinear_patch(patch, ys, xs).reshape(P, P)
        gy = jnp.gradient(val, axis=0)
        gx = jnp.gradient(val, axis=1)
        mag = (jnp.sqrt(gx * gx + gy * gy)).reshape(-1) * w_gauss
        ang = (jnp.arctan2(gy, gx) - th).reshape(-1)
        ob = (ang + 2 * jnp.pi) % (2 * jnp.pi) / (2 * jnp.pi) * 8.0
        o0 = jnp.floor(ob)
        fo = ob - o0
        o0i = o0.astype(jnp.int32) % 8
        O = jax.nn.one_hot(o0i, 8) * (1.0 - fo)[:, None] + \
            jax.nn.one_hot((o0i + 1) % 8, 8) * fo[:, None]
        D = jnp.einsum("s,si,sj->ij", mag, S_mat, O)
        return D.reshape(128)

    def chunk_fn(args):
        lvl_c, yf_c, xf_c, sg_c = args
        patches, oy, ox = _extract_patches(gauss_b, lvl_c, yf_c, xf_c, PS)
        ry = yf_c - oy
        rx = xf_c - ox
        if opts.upright:
            theta_c = jnp.zeros_like(yf_c)
        else:
            theta_c = jax.vmap(orient_one)(patches, ry, rx, sg_c)
        desc_c = jax.vmap(desc_one)(patches, ry, rx, sg_c, theta_c)
        return theta_c, desc_c

    nch = K // CH
    args = (lvl.reshape(nch, CH), yf.reshape(nch, CH),
            xf.reshape(nch, CH), sigma.reshape(nch, CH))
    theta, desc = jax.lax.map(chunk_fn, args)
    return (theta.reshape(K),
            _normalize_desc(desc.reshape(K, 128), opts.l1_root))


def extract(images: jax.Array, opts: SiftOptions = SiftOptions()
            ) -> SiftFeatures:
    """Public entry: resolves patch_sampling=None by backend, then runs
    the jitted kernel (opts is the static jit key)."""
    if opts.patch_sampling is None:
        opts = opts._replace(
            patch_sampling=jax.default_backend() != "cpu")
    return _extract(images, opts)


@functools.partial(jax.jit, static_argnames=("opts",))
def _extract(images: jax.Array, opts: SiftOptions = SiftOptions()
             ) -> SiftFeatures:
    """SIFT for a batch of grayscale images (B, H, W) float32 in [0, 1].

    first_octave=-1 (the reference/COLMAP default, sift.h:44-114)
    upsamples the image 2x for the base octave — roughly quadrupling the
    keypoint yield on small structures; keypoint coordinates stay in the
    ORIGINAL pixel frame.
    """
    B, H, W = images.shape
    S = opts.scales_per_octave
    k = 2.0 ** (1.0 / S)

    first_octave = min(opts.first_octave, 0)
    img = images.astype(jnp.float32)
    input_blur = opts.first_octave_blur
    if first_octave < 0:
        up = 2 ** (-first_octave)
        img = jax.image.resize(img, (B, H * up, W * up), "linear")
        input_blur = opts.first_octave_blur * up  # assumed blur scales up

    # base blur to sigma0
    base_sigma = math.sqrt(max(opts.sigma0 ** 2 - input_blur ** 2, 0.01))
    img = _blur(img, base_sigma)

    # octave count from image size (VLFeat convention) unless pinned
    if opts.num_octaves > 0:
        n_oct = opts.num_octaves
    else:
        n_oct = max(1, int(math.floor(math.log2(
            min(img.shape[1], img.shape[2])))) - 3)

    per_octave = []
    for o in range(n_oct):
        if img.shape[1] < 32 or img.shape[2] < 32:
            break
        # build S+3 gaussian levels
        levels = [img]
        sigma_prev = opts.sigma0
        for s in range(1, S + 3):
            sigma_total = opts.sigma0 * k ** s
            sigma_extra = math.sqrt(max(sigma_total ** 2
                                        - sigma_prev ** 2, 0.01))
            levels.append(_blur(levels[-1], sigma_extra))
            sigma_prev = sigma_total
        gauss = jnp.stack(levels, axis=1)               # (B, S+3, h, w)
        per_octave.append(_extract_octave(gauss, o + first_octave, opts))
        img = _downsample(levels[S])                    # 2x sigma0 level

    xy = jnp.concatenate([p[0] for p in per_octave], axis=1)
    scale = jnp.concatenate([p[1] for p in per_octave], axis=1)
    ori = jnp.concatenate([p[2] for p in per_octave], axis=1)
    score = jnp.concatenate([p[3] for p in per_octave], axis=1)
    desc = jnp.concatenate([p[4] for p in per_octave], axis=1)
    ok = jnp.concatenate([p[5] for p in per_octave], axis=1)

    # global top-K by score among valid
    K = min(opts.max_num_features, int(xy.shape[1]))
    sc = jnp.where(ok, score, -1.0)
    vals, idx = jax.lax.top_k(sc, K)                    # (B, K)
    take = lambda a: jnp.take_along_axis(
        a, idx.reshape(B, K, *([1] * (a.ndim - 2))).astype(jnp.int32)
        if a.ndim > 2 else idx, axis=1)
    xy_k = jnp.take_along_axis(xy, idx[..., None].repeat(2, -1), axis=1)
    desc_k = jnp.take_along_axis(desc, idx[..., None].repeat(128, -1),
                                 axis=1)
    return SiftFeatures(
        xy=xy_k,
        scale=jnp.take_along_axis(scale, idx, axis=1),
        orientation=jnp.take_along_axis(ori, idx, axis=1),
        score=vals,
        descriptor=desc_k,
        mask=vals > 0,
    )


def descriptors_to_uint8(desc: jax.Array) -> np.ndarray:
    """COLMAP-compatible uint8 quantization (512 * value, clipped)."""
    return np.asarray(jnp.clip(jnp.round(desc * 512.0), 0, 255)
                      ).astype(np.uint8)
