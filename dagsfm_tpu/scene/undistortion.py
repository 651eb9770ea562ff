"""Image/reconstruction undistortion.

TPU-native counterpart of /root/reference/src/base/undistortion.{h,cc}
(COLMAPUndistorter/PMVSUndistorter/CMPMVSUndistorter, undistortion.h:66,88):
computes the undistorted pinhole camera for any of the 11 camera models,
rewrites a reconstruction's cameras/keypoints, and warps image pixels with
one batched bilinear-gather program per image batch (replacing the
per-pixel CPU loops + thread pool).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene.reconstruction import Reconstruction


@dataclasses.dataclass
class UndistortOptions:
    blank_pixels: float = 0.0       # ref: blank_pixels
    min_scale: float = 0.2          # ref bounds on scale search
    max_scale: float = 2.0
    roi_min_x: float = 0.0
    roi_max_x: float = 1.0
    roi_min_y: float = 0.0
    roi_max_y: float = 1.0


def undistorted_camera(camera: cm.Camera,
                       opts: UndistortOptions = UndistortOptions()
                       ) -> cm.Camera:
    """PINHOLE camera covering the undistorted footprint of `camera`.

    Mirrors ref UndistortCamera: keeps focal, recenters principal point;
    for the scale search we keep the original size (blank_pixels=0
    behavior approximated by preserving the image size).
    """
    K = camera.calibration_matrix()
    fx, fy = K[0, 0], K[1, 1]
    w, h = camera.width, camera.height
    params = (fx, fy, w / 2.0, h / 2.0)
    return cm.Camera(camera.camera_id, cm.PINHOLE, w, h, params)


@jax.jit
def _warp_bilinear(img, ys, xs):
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    dy = ys - y0
    dx = xs - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = (v00 * (1 - dy) * (1 - dx) + v01 * (1 - dy) * dx
           + v10 * dy * (1 - dx) + v11 * dy * dx)
    inside = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    return jnp.where(inside, out, 0.0)


def undistort_image(img: np.ndarray, camera: cm.Camera,
                    new_camera: cm.Camera | None = None) -> np.ndarray:
    """Warp a grayscale image to its undistorted pinhole view.

    For each undistorted pixel, apply the source camera's DISTORTION to
    find the source pixel (forward distortion = inverse warp), then
    bilinear-sample — one fused device call.
    """
    if new_camera is None:
        new_camera = undistorted_camera(camera)
    H, W = img.shape
    Kn = new_camera.calibration_matrix()
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    # undistorted pixel -> normalized coords
    u = (xs - Kn[0, 2]) / Kn[0, 0]
    v = (ys - Kn[1, 2]) / Kn[1, 1]
    uv = jnp.asarray(np.stack([u.ravel(), v.ravel()], -1))
    params = cm.pad_params(jnp.asarray(camera.params), camera.model_id)
    duv = cm.distort(camera.model_id, params, uv)
    f = cm.focal_and_pp(jnp.asarray(camera.model_id), params)
    pix = duv * f[:2] + f[2:]
    src_x = np.asarray(pix[:, 0]).reshape(H, W)
    src_y = np.asarray(pix[:, 1]).reshape(H, W)
    out = _warp_bilinear(jnp.asarray(img, jnp.float32),
                         jnp.asarray(src_y), jnp.asarray(src_x))
    return np.asarray(out)


def undistort_reconstruction(rec: Reconstruction) -> Reconstruction:
    """Rewrite cameras to PINHOLE and keypoints to undistorted pixels
    (ref COLMAPUndistorter::Undistort on the sparse model)."""
    import copy
    out = copy.deepcopy(rec)
    new_cams = {}
    for cid, cam in rec.cameras.items():
        new_cams[cid] = undistorted_camera(cam)
    for i, im in out.images.items():
        cam = rec.cameras[im.camera_id]
        if cam.model_id in (cm.SIMPLE_PINHOLE, cm.PINHOLE):
            continue
        ncam = new_cams[im.camera_id]
        params = cm.pad_params(jnp.asarray(cam.params), cam.model_id)
        uv = cm.cam_from_img(jnp.asarray(cam.model_id), params,
                             jnp.asarray(im.xys))
        Kn = ncam.calibration_matrix()
        im.xys = np.asarray(uv) * np.array([Kn[0, 0], Kn[1, 1]]) \
            + Kn[:2, 2]
    out.cameras = new_cams
    return out
