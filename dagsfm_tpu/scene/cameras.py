"""Camera models: batched project / distort / undistort kernels.

TPU-native counterpart of the reference's camera model suite
(/root/reference/src/base/camera_models.h:117-360). All 11 COLMAP model
ids are supported with identical parameter layouts so that COLMAP
databases / reconstructions interoperate bit-for-bit.

Params are stored padded to MAX_CAMERA_PARAMS so a whole reconstruction's
cameras live in one (C, MAX_CAMERA_PARAMS) array; per-point model dispatch
is a `lax.switch`, which under `vmap` lowers to a select over the (cheap,
elementwise) model branches — no dynamic shapes, MXU-friendly callers.

Conventions: world->cam points X_c; normalized coords u = x/z, v = y/z;
pixel = focal * distort(u, v) + principal point.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_CAMERA_PARAMS = 12

# Model ids — must match COLMAP/reference numbering (camera_models.h).
SIMPLE_PINHOLE = 0
PINHOLE = 1
SIMPLE_RADIAL = 2
RADIAL = 3
OPENCV = 4
OPENCV_FISHEYE = 5
FULL_OPENCV = 6
FOV = 7
SIMPLE_RADIAL_FISHEYE = 8
RADIAL_FISHEYE = 9
THIN_PRISM_FISHEYE = 10

CAMERA_MODEL_NAMES = {
    SIMPLE_PINHOLE: "SIMPLE_PINHOLE",
    PINHOLE: "PINHOLE",
    SIMPLE_RADIAL: "SIMPLE_RADIAL",
    RADIAL: "RADIAL",
    OPENCV: "OPENCV",
    OPENCV_FISHEYE: "OPENCV_FISHEYE",
    FULL_OPENCV: "FULL_OPENCV",
    FOV: "FOV",
    SIMPLE_RADIAL_FISHEYE: "SIMPLE_RADIAL_FISHEYE",
    RADIAL_FISHEYE: "RADIAL_FISHEYE",
    THIN_PRISM_FISHEYE: "THIN_PRISM_FISHEYE",
}
CAMERA_MODEL_IDS = {v: k for k, v in CAMERA_MODEL_NAMES.items()}

CAMERA_MODEL_NUM_PARAMS = {
    SIMPLE_PINHOLE: 3,
    PINHOLE: 4,
    SIMPLE_RADIAL: 4,
    RADIAL: 5,
    OPENCV: 8,
    OPENCV_FISHEYE: 8,
    FULL_OPENCV: 12,
    FOV: 5,
    SIMPLE_RADIAL_FISHEYE: 4,
    RADIAL_FISHEYE: 5,
    THIN_PRISM_FISHEYE: 12,
}

# models whose params start (f, cx, cy, ...) instead of (fx, fy, cx, cy, ...)
_SINGLE_FOCAL = (SIMPLE_PINHOLE, SIMPLE_RADIAL, SIMPLE_RADIAL_FISHEYE,
                 RADIAL, RADIAL_FISHEYE)

NUM_MODELS = 11


def pad_params(params, model_id: int) -> jnp.ndarray:
    """Pad a per-model parameter list to MAX_CAMERA_PARAMS."""
    params = jnp.asarray(params, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n = CAMERA_MODEL_NUM_PARAMS[model_id]
    assert params.shape[-1] == n, (params.shape, model_id)
    pad = MAX_CAMERA_PARAMS - n
    return jnp.pad(params, [(0, 0)] * (params.ndim - 1) + [(0, pad)])


def focal_and_pp(model_id, params):
    """(fx, fy, cx, cy) for any model id (traced-friendly switch)."""
    def single(p):
        return jnp.stack([p[0], p[0], p[1], p[2]])

    def double(p):
        return jnp.stack([p[0], p[1], p[2], p[3]])

    is_single = _is_single_focal(model_id)
    return jnp.where(is_single, single(params), double(params))


def _is_single_focal(model_id):
    m = jnp.asarray(model_id)
    out = jnp.zeros(m.shape, dtype=bool)
    for mid in _SINGLE_FOCAL:
        out = out | (m == mid)
    return out


# --------------------------------------------------------------------------
# Intrinsics increment parameterization for bundle adjustment.
#
# The reference's Ceres BA treats the raw camera parameter vector as the
# variable block (optim/bundle_adjustment.cc:338 AddImageToProblem; which
# slots stay constant is decided by BundleAdjustmentOptions refine_*
# flags, bundle_adjustment.h:97-162). Here the BA increment is a FIXED
# 8-slot local parameterization shared by all models so the whole
# camera array stays one (C, 8) block on device:
#
#   slot 0: log-focal scale (applied to f, or to both fx and fy)
#   slot 1: log-aspect (fy only; masked off for single-focal models)
#   slot 2: principal point cx delta (pixels)
#   slot 3: principal point cy delta (pixels)
#   slot 4-7: first four extra (distortion) parameter deltas
#
# Models with >4 extra params (FULL_OPENCV, THIN_PRISM_FISHEYE) refine
# only k1,k2,p1,p2 — the higher-order terms stay at their prior values
# (the reference optimizes all of them; in practice COLMAP's defaults
# zero-initialize and barely move them without strong coverage).
# --------------------------------------------------------------------------

NUM_INTRINSIC_SLOTS = 8


def apply_intrinsics_delta(model_id, params, dint):
    """Apply an 8-slot intrinsics increment to a padded param vector.

    Traced-friendly for a single camera: params (MAX_CAMERA_PARAMS,),
    dint (8,). Vmap over cameras for the (C, ...) case.
    """
    single = _is_single_focal(model_id)
    fscale = jnp.exp(dint[0])
    p = params
    p = p.at[0].multiply(fscale)
    p = p.at[1].set(jnp.where(single, p[1],
                              p[1] * fscale * jnp.exp(dint[1])))
    pp0 = jnp.where(single, 1, 2)
    idx = jnp.arange(MAX_CAMERA_PARAMS)
    add = jnp.zeros_like(p)
    add = jnp.where(idx == pp0, dint[2], add)
    add = jnp.where(idx == pp0 + 1, dint[3], add)
    for k in range(4):
        add = jnp.where(idx == pp0 + 2 + k, dint[4 + k], add)
    npar = _num_params_traced(model_id)
    add = jnp.where(idx < npar, add, 0.0)
    return p + add


def _num_params_traced(model_id):
    m = jnp.asarray(model_id)
    out = jnp.zeros(m.shape, dtype=jnp.int32)
    for mid, n in CAMERA_MODEL_NUM_PARAMS.items():
        out = jnp.where(m == mid, n, out)
    return out


def intrinsics_refine_mask(model_ids, refine_focal: bool,
                           refine_principal: bool, refine_extra: bool,
                           eligible=None, eligible_extra=None):
    """(C, 8) float mask of refinable intrinsic slots (host-side).

    eligible: optional (C,) bool — cameras whose FOCAL (and principal
    point) may refine (~prior_focal: a calibrated/EXIF focal is trusted,
    ref incremental_mapper_controller.h:100-110 + prior_focal_length
    semantics).
    eligible_extra: optional (C,) bool — cameras whose DISTORTION slots
    may refine; defaults to `eligible`. The reference's
    ba_refine_extra_params=true refines zero-initialized distortion even
    for prior-focal cameras (an EXIF focal says nothing about k1), so
    the mapper passes all-true here.
    """
    import numpy as np
    mids = np.asarray(model_ids)
    C = mids.shape[0]
    single = np.isin(mids, _SINGLE_FOCAL)
    npar = np.vectorize(CAMERA_MODEL_NUM_PARAMS.get)(mids)
    n_extra = npar - np.where(single, 3, 4)
    mask = np.zeros((C, NUM_INTRINSIC_SLOTS), np.float64)
    if refine_focal:
        mask[:, 0] = 1.0
        mask[:, 1] = (~single).astype(np.float64)
    if refine_principal:
        mask[:, 2:4] = 1.0
    if eligible is not None:
        mask *= np.asarray(eligible, bool)[:, None].astype(np.float64)
    if refine_extra:
        if eligible_extra is None:
            eligible_extra = eligible
        ex = (np.ones(C, bool) if eligible_extra is None
              else np.asarray(eligible_extra, bool))
        for k in range(4):
            mask[:, 4 + k] = (n_extra > k) * ex
    return mask


# ----------------------------------------------------------------------------
# Per-model distortion of normalized coords (u, v) -> (du, dv).
# Each fn takes the padded param vector; distortion params start at the
# offset after focal+pp.
# ----------------------------------------------------------------------------

def _dist_none3(p, u, v):          # SIMPLE_PINHOLE
    return u, v


def _dist_none4(p, u, v):          # PINHOLE
    return u, v


def _dist_simple_radial(p, u, v):  # f cx cy k
    k = p[3]
    r2 = u * u + v * v
    radial = 1.0 + k * r2
    return u * radial, v * radial


def _dist_radial(p, u, v):         # f cx cy k1 k2
    k1, k2 = p[3], p[4]
    r2 = u * u + v * v
    radial = 1.0 + r2 * (k1 + k2 * r2)
    return u * radial, v * radial


def _dist_opencv(p, u, v):         # fx fy cx cy k1 k2 p1 p2
    k1, k2, p1, p2 = p[4], p[5], p[6], p[7]
    r2 = u * u + v * v
    radial = 1.0 + r2 * (k1 + k2 * r2)
    uv = u * v
    du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u * u)
    dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v * v)
    return du, dv


def _dist_full_opencv(p, u, v):    # fx fy cx cy k1 k2 p1 p2 k3 k4 k5 k6
    k1, k2, p1, p2 = p[4], p[5], p[6], p[7]
    k3, k4, k5, k6 = p[8], p[9], p[10], p[11]
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    uv = u * v
    du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u * u)
    dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v * v)
    return du, dv


def _fisheye_theta(u, v):
    r = jnp.sqrt(jnp.maximum(u * u + v * v, 1e-24))
    theta = jnp.arctan(r)
    return r, theta


def _dist_opencv_fisheye(p, u, v):  # fx fy cx cy k1 k2 k3 k4
    k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
    r, th = _fisheye_theta(u, v)
    th2 = th * th
    thd = th * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    small = r < 1e-8
    s = jnp.where(small, 1.0, thd / r)
    return u * s, v * s


def _dist_fov(p, u, v):            # fx fy cx cy omega
    omega = p[4]
    r2 = u * u + v * v
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    # COLMAP FOV camera (Devernay & Faugeras); small-omega / small-r limits.
    tan_half = jnp.tan(omega / 2.0)
    num = jnp.arctan(2.0 * r * tan_half)
    omega_safe = jnp.where(jnp.abs(omega) < 1e-8, 1.0, omega)
    factor = jnp.where(
        jnp.abs(omega) < 1e-8,
        1.0,
        jnp.where(r < 1e-8, 2.0 * tan_half / omega_safe, num / (r * omega_safe)),
    )
    return u * factor, v * factor


def _dist_simple_radial_fisheye(p, u, v):  # f cx cy k
    k = p[3]
    r, th = _fisheye_theta(u, v)
    th2 = th * th
    thd = th * (1.0 + k * th2)
    small = r < 1e-8
    s = jnp.where(small, 1.0, thd / r)
    return u * s, v * s


def _dist_radial_fisheye(p, u, v):  # f cx cy k1 k2
    k1, k2 = p[3], p[4]
    r, th = _fisheye_theta(u, v)
    th2 = th * th
    thd = th * (1.0 + th2 * (k1 + th2 * k2))
    small = r < 1e-8
    s = jnp.where(small, 1.0, thd / r)
    return u * s, v * s


def _dist_thin_prism_fisheye(p, u, v):
    # fx fy cx cy k1 k2 p1 p2 k3 k4 sx1 sy1
    k1, k2, p1, p2 = p[4], p[5], p[6], p[7]
    k3, k4, sx1, sy1 = p[8], p[9], p[10], p[11]
    r, th = _fisheye_theta(u, v)
    small = r < 1e-8
    s = jnp.where(small, 1.0, th / r)
    uu, vv = u * s, v * s
    r2 = uu * uu + vv * vv
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    uv = uu * vv
    du = uu * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * uu * uu) + sx1 * r2
    dv = vv * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * vv * vv) + sy1 * r2
    return du, dv


_DISTORT_FNS = [
    _dist_none3,                 # SIMPLE_PINHOLE
    _dist_none4,                 # PINHOLE
    _dist_simple_radial,         # SIMPLE_RADIAL
    _dist_radial,                # RADIAL
    _dist_opencv,                # OPENCV
    _dist_opencv_fisheye,        # OPENCV_FISHEYE
    _dist_full_opencv,           # FULL_OPENCV
    _dist_fov,                   # FOV
    _dist_simple_radial_fisheye, # SIMPLE_RADIAL_FISHEYE
    _dist_radial_fisheye,        # RADIAL_FISHEYE
    _dist_thin_prism_fisheye,    # THIN_PRISM_FISHEYE
]


def distort(model_id, params, uv):
    """Apply model distortion to normalized coords uv (..., 2) (scalar model)."""
    u, v = uv[..., 0], uv[..., 1]
    branches = [functools.partial(lambda f, op: jnp.stack(f(op[0], op[1][0], op[1][1]), -1), f)
                for f in _DISTORT_FNS]
    return jax.lax.switch(model_id, branches, (params, (u, v)))


def img_from_cam(model_id, params, xyz):
    """Project camera-frame point(s) xyz (..., 3) to pixels (..., 2).

    Points behind the camera (z<=0) still produce finite output (caller
    masks by cheirality); z is clamped away from 0 for stability.
    """
    z = xyz[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uv = xyz[..., :2] / z_safe[..., None]
    duv = distort(model_id, params, uv)
    f = focal_and_pp(model_id, params)
    return duv * f[..., :2] + f[..., 2:]


def cam_from_img(model_id, params, xy, num_iters: int = 25):
    """Pixel(s) (..., 2) -> normalized camera ray coords (u, v).

    Iterative Newton undistortion (ref: camera_models.h IterativeUndistortion)
    with a fixed trip count so it stays jittable. Batched inputs are
    vmapped internally (the Newton Jacobian is per-point 2x2).
    """
    if xy.ndim > 1:
        flat = xy.reshape(-1, 2)
        out = jax.vmap(lambda p: cam_from_img(model_id, params, p,
                                              num_iters))(flat)
        return out.reshape(xy.shape)
    f = focal_and_pp(model_id, params)
    uv_dist = (xy - f[..., 2:]) / f[..., :2]

    def dist_fn(uv):
        return distort(model_id, params, uv)

    def body(_, uv):
        d = dist_fn(uv)
        J = jax.jacfwd(dist_fn)(uv)  # (2, 2) per point when vmapped
        r = d - uv_dist
        det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
        det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
        du = (J[..., 1, 1] * r[..., 0] - J[..., 0, 1] * r[..., 1]) / det
        dv = (-J[..., 1, 0] * r[..., 0] + J[..., 0, 0] * r[..., 1]) / det
        return uv - jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, num_iters, body, uv_dist)


# Batched (per-point model id / params) versions.
distort_batched = jax.vmap(distort, in_axes=(0, 0, 0))
img_from_cam_batched = jax.vmap(img_from_cam, in_axes=(0, 0, 0))
cam_from_img_batched = jax.vmap(cam_from_img, in_axes=(0, 0, 0))


class Camera(NamedTuple):
    """Host-side camera record (mirrors reference base/camera.h).

    prior_focal mirrors the reference's prior_focal_length flag (set when
    the focal comes from EXIF rather than the 1.2*max-dim heuristic); it
    drives E-vs-F model selection in two-view estimation
    (ref estimators/two_view_geometry.cc:113).
    """
    camera_id: int
    model_id: int
    width: int
    height: int
    params: tuple
    prior_focal: bool = True

    @property
    def model_name(self) -> str:
        return CAMERA_MODEL_NAMES[self.model_id]

    def focal(self) -> float:
        return float(self.params[0])

    def calibration_matrix(self):
        import numpy as np
        fx, fy, cx, cy = (
            (self.params[0], self.params[0], self.params[1], self.params[2])
            if self.model_id in _SINGLE_FOCAL
            else (self.params[0], self.params[1], self.params[2], self.params[3])
        )
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def scale_focal(cam: Camera, factor: float) -> Camera:
    """Camera with focal length(s) scaled by `factor` (used by the
    focal-grid absolute-pose search, ref estimators/pose.cc:79: the best
    grid focal is written back to the camera).

    prior_focal stays as-is: a coarse grid estimate is NOT a calibration
    prior — BA intrinsics refinement must remain enabled to polish it
    (the grid is log-spaced at ~26% steps; freezing its pick as a
    "prior" would lock in up-to-13% focal error)."""
    p = list(cam.params)
    p[0] = p[0] * factor
    if cam.model_id not in _SINGLE_FOCAL:
        p[1] = p[1] * factor
    return cam._replace(params=tuple(p))


def make_simple_camera(camera_id: int, width: int, height: int,
                       focal: float | None = None,
                       model: str = "SIMPLE_PINHOLE") -> Camera:
    """Default camera like the reference's prior-focal heuristic (1.2*max dim)."""
    prior_focal = focal is not None
    if focal is None:
        focal = 1.2 * max(width, height)
    model_id = CAMERA_MODEL_IDS[model]
    base = [focal, width / 2.0, height / 2.0]
    if model == "SIMPLE_PINHOLE":
        params = tuple(base)
    elif model == "PINHOLE":
        params = (focal, focal, width / 2.0, height / 2.0)
    elif model == "SIMPLE_RADIAL":
        params = tuple(base + [0.0])
    else:
        raise ValueError(f"unsupported default model {model}")
    return Camera(camera_id, model_id, width, height, params,
                  prior_focal=prior_focal)
