"""Image warping between camera models / homographies.

Counterpart of /root/reference/src/base/warp.{h,cc}: WarpImageBetweenCameras
(resample source image so it looks as if taken by the target camera),
WarpImageWithHomography, and ResampleImageBilinear. Batched device code:
the coordinate grids and bilinear gathers are one fused XLA program
(vmappable over image batches).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import cameras as cm


def _bilinear(img: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    H, W = img.shape[:2]
    xi = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    # fractions relative to the CLIPPED base so edge pixels interpolate
    # correctly (x = W-1 must sample img[., W-1], not img[., W-2])
    fx = jnp.clip(x - xi.astype(x.dtype), 0.0, 1.0)
    fy = jnp.clip(y - yi.astype(y.dtype), 0.0, 1.0)
    v00 = img[yi, xi]; v01 = img[yi, xi + 1]
    v10 = img[yi + 1, xi]; v11 = img[yi + 1, xi + 1]
    ok = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    if img.ndim == 3:
        fx = fx[..., None]; fy = fy[..., None]; ok = ok[..., None]
    v = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
         + v10 * fy * (1 - fx) + v11 * fy * fx)
    return jnp.where(ok, v, 0.0)


def warp_image_with_homography(img: jax.Array, H: jax.Array,
                               out_shape: tuple | None = None) -> jax.Array:
    """Warp so that out(x) = img(H @ x) (ref WarpImageWithHomography)."""
    Ho, Wo = out_shape if out_shape is not None else img.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(Ho, dtype=img.dtype),
                          jnp.arange(Wo, dtype=img.dtype), indexing="ij")
    p = jnp.stack([xs, ys, jnp.ones_like(xs)])
    q = jnp.einsum("ij,jhw->ihw", jnp.asarray(H, img.dtype), p)
    z = jnp.where(jnp.abs(q[2]) < 1e-12, 1e-12, q[2])
    return _bilinear(img, q[1] / z, q[0] / z)


def warp_image_between_cameras(src_cam: cm.Camera, dst_cam: cm.Camera,
                               img: jax.Array) -> jax.Array:
    """Resample `img` (taken by src_cam) as seen by dst_cam with the same
    pose (ref WarpImageBetweenCameras): for every target pixel, lift to
    the normalized plane with the target model, re-project with the
    source model, sample bilinearly."""
    Ho, Wo = int(dst_cam.height) or img.shape[0], \
        int(dst_cam.width) or img.shape[1]
    ys, xs = np.meshgrid(np.arange(Ho), np.arange(Wo), indexing="ij")
    pix = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2), img.dtype)
    uv = cm.cam_from_img(dst_cam.model_id,
                         jnp.asarray(dst_cam.params, img.dtype), pix)
    xyz = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=1)
    sp = cm.img_from_cam(src_cam.model_id,
                         jnp.asarray(src_cam.params, img.dtype), xyz)
    sp = sp.reshape(Ho, Wo, 2)
    return _bilinear(img, sp[..., 1], sp[..., 0])


def resample_image_bilinear(img: jax.Array, new_h: int,
                            new_w: int) -> jax.Array:
    """(ref ResampleImageBilinear) — jax.image.resize keeps it on device."""
    shape = (new_h, new_w) + tuple(img.shape[2:])
    return jax.image.resize(img, shape, method="bilinear")
