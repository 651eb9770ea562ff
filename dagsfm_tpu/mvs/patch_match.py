"""Multi-view stereo depth/normal estimation: plane-sweep + PatchMatch-style
refinement, fully on-device.

TPU-native counterpart of /root/reference/src/mvs/patch_match.{h,cc} and
patch_match_cuda.cu (GPU PatchMatch stereo with geometric consistency) —
redesigned for XLA rather than translated:

  - The CUDA kernel walks pixels with per-pixel random plane hypotheses and
    sequential red/black propagation sweeps. On TPU the equivalent program
    is (1) a fronto-parallel *plane sweep* over D depth hypotheses — each
    hypothesis is one batched homography warp + windowed ZNCC, i.e. pure
    conv/elementwise work the XLA fuser tiles onto the VPU/MXU — followed
    by (2) PatchMatch-style refinement iterations under `lax.scan`: each
    iteration proposes depths from 4-neighbor *shifts* of the current map
    (propagation) plus multiplicative random perturbations (random search),
    scores all proposals for every pixel at once, and keeps the argmin.
  - Geometric consistency (patch_match.h:174 filter options) is a separate
    batched pass in fusion.py.

Cameras are pinhole (undistort first: scene/undistortion.py), COLMAP
convention: x_cam = R @ X_world + t, pixel = K @ x_cam.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PatchMatchOptions(NamedTuple):
    num_depths: int = 64           # plane-sweep hypotheses
    window_radius: int = 2         # ZNCC window = (2r+1)^2 (ref window_radius 5)
    num_iterations: int = 5        # refinement sweeps (ref num_iterations 5)
    perturbation: float = 0.1      # random-search relative depth range
    min_triangulation_angle: float = 1.0   # deg (ref :174 options)
    top_k: int = 2                 # average the k best source costs


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> tuple:
    """Sample (H, W) image at float coords; returns (values, in_bounds)."""
    H, W = img.shape
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    xi = x0.astype(jnp.int32); yi = y0.astype(jnp.int32)
    fx = x - x0; fy = y - y0
    ok = (x >= 0) & (x <= W - 1.001) & (y >= 0) & (y <= H - 1.001)
    xi = jnp.clip(xi, 0, W - 2); yi = jnp.clip(yi, 0, H - 2)
    v00 = img[yi, xi]; v01 = img[yi, xi + 1]
    v10 = img[yi + 1, xi]; v11 = img[yi + 1, xi + 1]
    v = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
         + v10 * fy * (1 - fx) + v11 * fy * fx)
    return v, ok


def _box(img: jax.Array, r: int) -> jax.Array:
    """(…, H, W) mean filter with window (2r+1)^2 (XLA reduce-window)."""
    w = 2 * r + 1
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1,) * (img.ndim - 2) + (w, w),
        (1,) * img.ndim, "SAME")
    cnt = jax.lax.reduce_window(
        jnp.ones_like(img), 0.0, jax.lax.add,
        (1,) * (img.ndim - 2) + (w, w), (1,) * img.ndim, "SAME")
    return s / cnt


def _zncc_cost(ref: jax.Array, warped: jax.Array, valid: jax.Array,
               r: int) -> jax.Array:
    """1 - ZNCC over (2r+1)^2 windows; invalid pixels get max cost 2."""
    w = jnp.where(valid, warped, 0.0)
    mu_r = _box(ref, r); mu_w = _box(w, r)
    var_r = _box(ref * ref, r) - mu_r ** 2
    var_w = _box(w * w, r) - mu_w ** 2
    cov = _box(ref * w, r) - mu_r * mu_w
    ncc = cov * jax.lax.rsqrt(jnp.maximum(var_r * var_w, 1e-10))
    cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
    return jnp.where(valid, cost, 2.0)


def _warp_cost(ref_img, src_img, Kr_inv, Ks, R_rel, t_rel, depth,
               window_radius: int):
    """Cost of depth map `depth` (H, W) against one source view.

    Homography per pixel for its fronto-parallel plane: back-project ref
    pixel at depth, transform into src, project — equivalent to
    H(d) = Ks (R_rel + t_rel nᵀ / d) Kr⁻¹ evaluated per pixel.
    """
    H, W = ref_img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                          jnp.arange(W, dtype=depth.dtype), indexing="ij")
    ray = jnp.stack([xs, ys, jnp.ones_like(xs)], 0).reshape(3, -1)
    ray = Kr_inv @ ray                           # (3, HW) unit-plane dirs
    X = ray * depth.reshape(1, -1)               # ref-cam 3D
    Xs = R_rel @ X + t_rel[:, None]
    ps = Ks @ Xs
    z = ps[2]
    u = ps[0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    v = ps[1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    warped, ok = _bilinear(src_img, v.reshape(H, W), u.reshape(H, W))
    ok = ok & (z.reshape(H, W) > 1e-6)
    return _zncc_cost(ref_img, warped, ok, window_radius)


def _multi_view_cost(ref_img, src_imgs, Kr_inv, Ks, R_rel, t_rel, depth,
                     opts: PatchMatchOptions):
    """(S,…) source stack -> per-pixel aggregated cost (mean of top-k)."""
    costs = jax.vmap(
        lambda si, ks, rr, tr: _warp_cost(
            ref_img, si, Kr_inv, ks, rr, tr, depth, opts.window_radius)
    )(src_imgs, Ks, R_rel, t_rel)                # (S, H, W)
    k = min(opts.top_k, costs.shape[0])
    top = -jax.lax.top_k(-jnp.moveaxis(costs, 0, -1), k)[0]  # k smallest
    return jnp.mean(top, axis=-1)


@functools.partial(jax.jit, static_argnames=("opts",))
def plane_sweep(ref_img: jax.Array, src_imgs: jax.Array,
                K_ref: jax.Array, K_src: jax.Array,
                R_rel: jax.Array, t_rel: jax.Array,
                depth_min: float, depth_max: float,
                opts: PatchMatchOptions = PatchMatchOptions()):
    """Initial depth by sweeping fronto-parallel planes.

    ref_img (H, W); src_imgs (S, H, W); K_src/R_rel/t_rel (S, 3, 3)/(S, 3):
    src-from-ref transforms. Inverse-depth-uniform hypotheses (near planes
    denser — matches PatchMatch sampling density).
    Returns (depth (H, W), cost (H, W)).
    """
    Kr_inv = jnp.linalg.inv(K_ref)
    inv_d = jnp.linspace(1.0 / depth_max, 1.0 / depth_min, opts.num_depths)
    depths = 1.0 / inv_d

    def sweep_one(d):
        dmap = jnp.full(ref_img.shape, d, ref_img.dtype)
        return _multi_view_cost(ref_img, src_imgs, Kr_inv, K_src, R_rel,
                                t_rel, dmap, opts)

    cost_vol = jax.lax.map(sweep_one, depths)       # (D, H, W)
    best = jnp.argmin(cost_vol, axis=0)             # (H, W)
    cmin = jnp.min(cost_vol, axis=0)

    # sub-pixel: parabola fit over the argmin neighborhood in inv-depth
    D = opts.num_depths
    b0 = jnp.clip(best, 1, D - 2)
    c_m = jnp.take_along_axis(cost_vol, (b0 - 1)[None], 0)[0]
    c_0 = jnp.take_along_axis(cost_vol, b0[None], 0)[0]
    c_p = jnp.take_along_axis(cost_vol, (b0 + 1)[None], 0)[0]
    denom = c_m - 2 * c_0 + c_p
    off = jnp.where(jnp.abs(denom) > 1e-9,
                    0.5 * (c_m - c_p) / jnp.where(jnp.abs(denom) < 1e-9,
                                                  1.0, denom), 0.0)
    off = jnp.clip(off, -1.0, 1.0)
    idx = jnp.clip(b0 + off, 0, D - 1)
    step = (inv_d[-1] - inv_d[0]) / (D - 1)
    inv = inv_d[0] + idx * step
    depth = 1.0 / jnp.maximum(inv, 1e-9)
    return depth, cmin


@functools.partial(jax.jit, static_argnames=("opts",))
def refine(key, ref_img, src_imgs, K_ref, K_src, R_rel, t_rel,
           depth, depth_min: float, depth_max: float,
           opts: PatchMatchOptions = PatchMatchOptions()):
    """PatchMatch refinement: neighbor propagation + random search.

    Each iteration scores 4 shifted copies of the depth map (propagation)
    and 2 random multiplicative perturbations (search) for every pixel at
    once; all proposals reuse the batched warp+ZNCC. Returns
    (depth, cost)."""
    Kr_inv = jnp.linalg.inv(K_ref)

    def cost_of(d):
        return _multi_view_cost(ref_img, src_imgs, Kr_inv, K_src, R_rel,
                                t_rel, d, opts)

    def body(carry, it_key):
        d, c = carry
        props = [
            jnp.roll(d, 1, axis=0), jnp.roll(d, -1, axis=0),
            jnp.roll(d, 1, axis=1), jnp.roll(d, -1, axis=1),
        ]
        k1, k2 = jax.random.split(it_key)
        for kk, scale in ((k1, opts.perturbation),
                          (k2, 0.25 * opts.perturbation)):
            f = jnp.exp(jax.random.uniform(kk, d.shape,
                                           minval=-scale, maxval=scale))
            props.append(jnp.clip(d * f, depth_min, depth_max))
        for p in props:
            pc = cost_of(p)
            take = pc < c
            d = jnp.where(take, p, d)
            c = jnp.where(take, pc, c)
        return (d, c), None

    c0 = cost_of(depth)
    keys = jax.random.split(key, opts.num_iterations)
    (depth, cost), _ = jax.lax.scan(body, (depth, c0), keys)
    return depth, cost


def normals_from_depth(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Per-pixel normals from back-projected depth gradients (H, W, 3),
    oriented toward the camera (ref patch_match normal maps)."""
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                          jnp.arange(W, dtype=depth.dtype), indexing="ij")
    Kinv = jnp.linalg.inv(K)
    ray = jnp.einsum("ij,jhw->ihw", Kinv,
                     jnp.stack([xs, ys, jnp.ones_like(xs)]))
    P = ray * depth[None]                          # (3, H, W) cam coords
    dx = jnp.gradient(P, axis=2)
    dy = jnp.gradient(P, axis=1)
    n = jnp.cross(jnp.moveaxis(dx, 0, -1), jnp.moveaxis(dy, 0, -1))
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # orient toward camera: n·view < 0
    view = jnp.moveaxis(P, 0, -1)
    flip = jnp.sum(n * view, -1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def estimate_depth_map(key, ref_img, src_imgs, K_ref, K_src, R_rel, t_rel,
                       depth_min: float, depth_max: float,
                       opts: PatchMatchOptions = PatchMatchOptions()):
    """Full per-view pipeline: sweep -> PatchMatch refine -> normals.

    Returns (depth (H, W), normal (H, W, 3), cost (H, W))."""
    depth, _ = plane_sweep(ref_img, src_imgs, K_ref, K_src, R_rel, t_rel,
                           depth_min, depth_max, opts)
    depth, cost = refine(key, ref_img, src_imgs, K_ref, K_src, R_rel,
                         t_rel, depth, depth_min, depth_max, opts)
    normal = normals_from_depth(depth, K_ref)
    return depth, normal, cost
