"""PatchMatch controller: dense reconstruction of a sparse model.

Counterpart of /root/reference/src/mvs/patch_match.h:248
(PatchMatchController) + workspace.h: for each registered reference image
pick source views by shared sparse points (the reference's
"__auto__" src_images selection), derive the depth range from the sparse
points visible in the view (workspace depth_ranges), run the batched
plane-sweep + PatchMatch refinement (patch_match.py), write
COLMAP-format depth/normal maps, then fuse (fusion.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import rotations as rops
from ..scene import cameras as cm
from . import fusion, io as mvs_io, patch_match as pm


class DenseOptions(NamedTuple):
    max_src_images: int = 4       # ref PatchMatchOptions max_num_src_images
    depth_margin: float = 0.25    # widen sparse range by this fraction
    patch_match: pm.PatchMatchOptions = pm.PatchMatchOptions()
    fusion: fusion.FusionOptions = fusion.FusionOptions()


def _K_R_t(rec, image_id):
    im = rec.images[image_id]
    cam = rec.cameras[im.camera_id]
    K = np.asarray(cam.calibration_matrix(), np.float64)
    R = np.asarray(rops.quat_to_rotmat_np(im.qvec))
    return K, R, np.asarray(im.tvec, np.float64)


def select_source_images(rec, ref_id: int, max_src: int) -> list:
    """Source views ranked by shared sparse 3D points (ref workspace
    src_images "__auto__": shared-point counts)."""
    ref = rec.images[ref_id]
    ref_pts = set(int(p) for p in ref.point3D_ids if p >= 0)
    scores = []
    for iid in rec.reg_image_ids:
        if iid == ref_id:
            continue
        im = rec.images[iid]
        shared = sum(1 for p in im.point3D_ids if p >= 0 and int(p) in
                     ref_pts)
        if shared > 0:
            scores.append((shared, iid))
    scores.sort(reverse=True)
    return [iid for _, iid in scores[:max_src]]


def depth_range(rec, image_id: int, margin: float) -> tuple:
    """Depth range from the view's sparse points (ref workspace
    ComputeDepthRanges: robust percentile span, widened)."""
    K, R, t = _K_R_t(rec, image_id)
    im = rec.images[image_id]
    pts = [rec.points3D[int(p)].xyz for p in im.point3D_ids if p >= 0]
    if not pts:
        return 0.1, 100.0
    z = (np.asarray(pts) @ R.T + t)[:, 2]
    z = z[z > 1e-6]
    if len(z) == 0:
        return 0.1, 100.0
    lo, hi = np.percentile(z, [1, 99])
    span = max(hi - lo, 1e-3)
    return max(lo - margin * span, 1e-3), hi + margin * span


def dense_reconstruct(rec, images: dict, workspace: str | None = None,
                      opts: DenseOptions = DenseOptions(),
                      seed: int = 0) -> dict:
    """Run MVS over all registered images of `rec`.

    images: image_id -> (H, W) float grayscale (undistorted).
    Returns the fused point cloud dict; if `workspace` is given, also
    writes COLMAP-format depth/normal maps + fused.ply under it.
    """
    reg = [i for i in rec.reg_image_ids if i in images]
    depth_maps, normal_maps, Ks, Rs, ts, imgs_used = {}, {}, [], [], [], []
    key = jax.random.PRNGKey(seed)
    for ref_id in reg:
        srcs = select_source_images(rec, ref_id, opts.max_src_images)
        srcs = [s for s in srcs if s in images]
        if not srcs:
            continue
        K_r, R_r, t_r = _K_R_t(rec, ref_id)
        K_s, R_rel, t_rel = [], [], []
        for s in srcs:
            K2, R2, t2 = _K_R_t(rec, s)
            Rr = R2 @ R_r.T
            K_s.append(K2)
            R_rel.append(Rr)
            t_rel.append(t2 - Rr @ t_r)
        dmin, dmax = depth_range(rec, ref_id, opts.depth_margin)
        key, sub = jax.random.split(key)
        depth, normal, cost = pm.estimate_depth_map(
            sub, jnp.asarray(images[ref_id], jnp.float32),
            jnp.asarray(np.stack([images[s] for s in srcs]), jnp.float32),
            jnp.asarray(K_r, jnp.float32),
            jnp.asarray(np.stack(K_s), jnp.float32),
            jnp.asarray(np.stack(R_rel), jnp.float32),
            jnp.asarray(np.stack(t_rel), jnp.float32),
            float(dmin), float(dmax), opts.patch_match)
        depth_maps[ref_id] = np.asarray(depth)
        normal_maps[ref_id] = np.asarray(normal)
        if workspace is not None:
            name = rec.images[ref_id].name
            mvs_io.write_map_bin(
                mvs_io.depth_map_path(workspace, name), depth_maps[ref_id])
            mvs_io.write_map_bin(
                mvs_io.normal_map_path(workspace, name),
                normal_maps[ref_id])

    order = sorted(depth_maps)
    for i in order:
        K_r, R_r, t_r = _K_R_t(rec, i)
        Ks.append(K_r); Rs.append(R_r); ts.append(t_r)
        imgs_used.append(images[i])
    fused = fusion.fuse([depth_maps[i] for i in order],
                        [normal_maps[i] for i in order],
                        imgs_used, Ks, Rs, ts, opts.fusion)
    if workspace is not None and len(fused["xyz"]):
        import os
        mvs_io.write_ply_points(os.path.join(workspace, "fused.ply"),
                                fused["xyz"], fused["normal"],
                                fused["color"])
    return fused
