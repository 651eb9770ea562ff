"""Batched projection & reprojection-error kernels.

TPU-native counterpart of /root/reference/src/base/projection.{h,cc}.
All functions operate on flat observation arrays (gather-based), which is
the layout the BA and triangulation kernels consume: one big batch of
(observation -> image, point) indices instead of per-image loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import cameras as cm


def world_to_cam(qvec: jax.Array, tvec: jax.Array, xyz: jax.Array):
    """X_c = R(q) @ X_w + t, broadcastable over leading dims."""
    return rops.quat_rotate(qvec, xyz) + tvec


def project_simple(qvec, tvec, focal, pp, xyz):
    """Pinhole projection without distortion (fast path for BA inner loop)."""
    Xc = world_to_cam(qvec, tvec, xyz)
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-12, 1e-12, Xc[..., 2])
    return Xc[..., :2] / z[..., None] * focal + pp, Xc[..., 2]


def project_full(model_id, params, qvec, tvec, xyz):
    """Full camera-model projection (per-element model dispatch)."""
    Xc = world_to_cam(qvec, tvec, xyz)
    return cm.img_from_cam(model_id, params, Xc), Xc[..., 2]


def reproj_errors_obs(scene, dtype=jnp.float64):
    """Per-observation reprojection error for a SceneArrays pytree.

    Returns (errors (N,), depths (N,), mask (N,)). Gathers image/camera/point
    data per observation then projects the whole batch at once — the
    MXU/VPU-friendly layout (no ragged per-image work).
    """
    q = scene.image_qvec[scene.obs_image]
    t = scene.image_tvec[scene.obs_image]
    cam_idx = scene.image_camidx[scene.obs_image]
    model_id = scene.cam_model_id[cam_idx]
    params = scene.cam_params[cam_idx]
    xyz = scene.points_xyz[scene.obs_point]
    proj, depth = jax.vmap(project_full)(model_id, params, q, t, xyz)
    err = jnp.linalg.norm(proj - scene.obs_xy, axis=-1)
    mask = (scene.obs_mask
            & scene.image_mask[scene.obs_image]
            & scene.points_mask[scene.obs_point])
    return err, depth, mask


def mean_reproj_error(scene) -> jax.Array:
    err, depth, mask = reproj_errors_obs(scene)
    good = mask & (depth > 0)
    return jnp.sum(jnp.where(good, err, 0.0)) / jnp.maximum(
        jnp.sum(good), 1)


def angular_error(qvec, tvec, xyz, ray):
    """Angle between observed ray and point direction (for filtering)."""
    Xc = world_to_cam(qvec, tvec, xyz)
    Xc = Xc / jnp.maximum(jnp.linalg.norm(Xc, axis=-1, keepdims=True), 1e-12)
    r = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
    return jnp.arccos(jnp.clip(jnp.sum(Xc * r, axis=-1), -1.0, 1.0))


def triangulation_angles(q1, t1, q2, t2, xyz):
    """Angle subtended at the 3D point by the two camera centers (radians).

    Ref: base/triangulation.cc CalculateTriangulationAngle.
    """
    c1 = rops.camera_center(rops.quat_to_rotmat(q1), t1)
    c2 = rops.camera_center(rops.quat_to_rotmat(q2), t2)
    b1 = c1 - xyz
    b2 = c2 - xyz
    cos = jnp.sum(b1 * b2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(b1, axis=-1) * jnp.linalg.norm(b2, axis=-1), 1e-12)
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))
