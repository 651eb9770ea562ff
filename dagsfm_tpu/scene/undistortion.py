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


# ------------------------------------------------------ stereo rectification


def rectify_stereo_cameras(camera1: cm.Camera, camera2: cm.Camera,
                           qvec: np.ndarray, tvec: np.ndarray):
    """Planar rectification of a calibrated stereo pair.

    Ref RectifyStereoCameras (base/undistortion.cc:882-943): split the
    relative rotation evenly between the two views, rotate so the
    baseline coincides with the x-axis, and build homographies H1/H2 plus
    the disparity-to-depth matrix Q.  Cameras must be (SIMPLE_)PINHOLE.
    Returns (H1, H2, Q).
    """
    from dagsfm_tpu.ops import rotations as rops

    assert camera1.model_id in (cm.SIMPLE_PINHOLE, cm.PINHOLE)
    assert camera2.model_id in (cm.SIMPLE_PINHOLE, cm.PINHOLE)
    q = np.asarray(qvec, float)
    aa = np.asarray(rops.quat_to_angleaxis(jnp.asarray(q)))
    R2 = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(-0.5 * aa)))
    R1 = R2.T
    t = R2 @ np.asarray(tvec, float)
    x_unit = np.array([1.0, 0.0, 0.0])
    if t @ x_unit < 0:
        x_unit = -x_unit
    axis = np.cross(t, x_unit)
    if np.linalg.norm(axis) < 1e-15:
        R_x = np.eye(3)
    else:
        angle = np.arccos(abs(t @ x_unit) / np.linalg.norm(t))
        axis = axis / np.linalg.norm(axis)
        R_x = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(axis * angle)))
    R1 = R_x @ R1
    R2 = R_x @ R2
    t = R_x @ t
    K1 = np.asarray(camera1.calibration_matrix())
    K2 = np.asarray(camera2.calibration_matrix())
    K = np.eye(3)
    K[0, 0] = K[1, 1] = min((K1[0, 0] + K1[1, 1]) / 2,
                            (K2[0, 0] + K2[1, 1]) / 2)
    K[0, 2] = K1[0, 2]
    K[1, 2] = (K1[1, 2] + K2[1, 2]) / 2
    H1 = K @ R1 @ np.linalg.inv(K1)
    H2 = K @ R2 @ np.linalg.inv(K2)
    Q = np.eye(4)
    Q[3, 0] = -K[1, 2]
    Q[3, 1] = -K[0, 2]
    Q[3, 2] = K[0, 0]
    Q[2, 3] = -1.0 / t[0]
    Q[3, 3] = 0.0
    return H1, H2, Q


def warp_image_with_homography(img: np.ndarray, H: np.ndarray,
                               out_shape=None) -> np.ndarray:
    """Inverse-warp an image by homography H (dst <- H @ src pixel map);
    one batched bilinear gather on device (ref WarpImageWithHomography,
    base/warp.cc)."""
    Hh, Ww = out_shape or img.shape
    Hi = np.linalg.inv(np.asarray(H, float))
    ys, xs = np.mgrid[0:Hh, 0:Ww].astype(np.float64)
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
    src = Hi @ pts
    sx = (src[0] / src[2]).reshape(Hh, Ww)
    sy = (src[1] / src[2]).reshape(Hh, Ww)
    out = _warp_bilinear(jnp.asarray(img, jnp.float32),
                         jnp.asarray(sy), jnp.asarray(sx))
    return np.asarray(out)


def rectify_and_undistort_stereo_pair(img1, img2, camera1, camera2,
                                      qvec, tvec):
    """Full stereo rectification of an image pair (ref
    RectifyAndUndistortStereoImages, base/undistortion.cc:944-975):
    undistort both cameras to pinhole, then apply the rectifying
    homographies.  Returns (rect1, rect2, Q)."""
    uc1 = undistorted_camera(camera1)
    uc2 = undistorted_camera(camera2)
    u1 = undistort_image(np.asarray(img1, np.float32), camera1, uc1)
    u2 = undistort_image(np.asarray(img2, np.float32), camera2, uc2)
    H1, H2, Q = rectify_stereo_cameras(uc1, uc2, qvec, tvec)
    return (warp_image_with_homography(u1, H1),
            warp_image_with_homography(u2, H2), Q)
