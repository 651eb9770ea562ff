"""Image ingestion with EXIF-driven intrinsics priors.

Counterpart of /root/reference/src/base/image_reader.{h,cc}: the
reference's ImageReader defaults to SIMPLE_RADIAL, reads the EXIF focal
length (preferring FocalLengthIn35mmFilm, else FocalLength scaled by the
camera-specs sensor width), sets the camera's prior_focal_length flag
when EXIF supplied the focal, and falls back to
default_focal_length_factor * max(width, height) otherwise
(image_reader.h:64-83, ImageReaderOptions). `--ImageReader.single_camera`
shares one camera record across all images; `--ImageReader.camera_params`
pins explicit calibration (prior focal, never refined by default).

Here the reader is a host-side pure-Python step (ingestion is I/O bound;
the device work starts at feature extraction), producing the per-image
`Camera` records the rest of the pipeline consumes.
"""

from __future__ import annotations

from dataclasses import dataclass

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene.camera_database import (DEFAULT_FOCAL_FACTOR,
                                              focal_from_exif)

# EXIF tag ids (TIFF/EXIF standard)
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_FOCAL_LENGTH = 37386
_TAG_FOCAL_35MM = 41989


@dataclass
class ImageReaderOptions:
    """Mirrors reference ImageReaderOptions (image_reader.h:64-83)."""
    camera_model: str = "SIMPLE_RADIAL"
    single_camera: bool = False
    camera_params: str = ""          # comma-separated explicit calibration
    default_focal_length_factor: float = DEFAULT_FOCAL_FACTOR


def default_camera_params(model: str, width: int, height: int,
                          focal: float) -> tuple:
    """Initial parameter vector for any of the 11 camera models:
    focal slot(s), centered principal point, zero distortion (FOV's
    omega gets a small epsilon — omega=0 is a division singularity)."""
    model_id = cm.CAMERA_MODEL_IDS[model]
    n = cm.CAMERA_MODEL_NUM_PARAMS[model_id]
    cx, cy = width / 2.0, height / 2.0
    if model_id in cm._SINGLE_FOCAL or model_id == cm.SIMPLE_PINHOLE:
        base = [focal, cx, cy]
    else:
        base = [focal, focal, cx, cy]
    extra = [0.0] * (n - len(base))
    if model == "FOV" and extra:
        extra[0] = 1e-2
    return tuple(base + extra)


def extract_exif(pil_image) -> dict:
    """Pull make/model/focal tags from a PIL image (empty dict if none)."""
    out = {}
    try:
        exif = pil_image.getexif()
    except Exception:  # noqa: BLE001 — EXIF parsing must never kill ingestion
        return out
    if not exif:
        return out
    out["make"] = str(exif.get(_TAG_MAKE, "") or "")
    out["model"] = str(exif.get(_TAG_MODEL, "") or "")
    # FocalLength/FocalLengthIn35mmFilm live in the Exif sub-IFD
    try:
        sub = exif.get_ifd(34665)
    except Exception:  # noqa: BLE001
        sub = {}
    for tag, key in ((_TAG_FOCAL_LENGTH, "focal_mm"),
                     (_TAG_FOCAL_35MM, "focal_35mm")):
        v = sub.get(tag, exif.get(tag))
        if v is not None:
            try:
                out[key] = float(v)
            except (TypeError, ValueError, ZeroDivisionError):
                pass
    return out


def camera_from_exif(camera_id: int, width: int, height: int,
                     exif: dict | None,
                     options: ImageReaderOptions | None = None) -> cm.Camera:
    """Build a Camera the way the reference's ImageReader does.

    Priority (image_reader.cc):
      1. options.camera_params explicit calibration  -> prior focal
      2. EXIF focal (35mm-equiv, else mm x specs-DB) -> prior focal
      3. default_focal_length_factor * max(w, h)     -> NO prior
    """
    opts = options or ImageReaderOptions()
    model_id = cm.CAMERA_MODEL_IDS[opts.camera_model]
    if opts.camera_params:
        params = tuple(float(x) for x in opts.camera_params.split(","))
        n = cm.CAMERA_MODEL_NUM_PARAMS[model_id]
        if len(params) != n:
            raise ValueError(
                f"camera_params has {len(params)} values; "
                f"{opts.camera_model} needs {n}")
        return cm.Camera(camera_id, model_id, width, height, params,
                         prior_focal=True)
    exif = exif or {}
    focal, has_prior = focal_from_exif(
        exif.get("make", ""), exif.get("model", ""),
        exif.get("focal_mm", 0.0), width, height,
        focal_35mm=exif.get("focal_35mm"))
    if not has_prior:
        focal = opts.default_focal_length_factor * max(width, height)
    params = default_camera_params(opts.camera_model, width, height, focal)
    return cm.Camera(camera_id, model_id, width, height, params,
                     prior_focal=has_prior)


def read_images_with_cameras(image_path: str,
                             options: ImageReaderOptions | None = None):
    """Load a directory of images -> (images, names, cameras).

    images: image_id -> float32 grayscale array in [0, 1]
    names:  image_id -> filename
    cameras: image_id -> Camera (EXIF priors applied; with
             options.single_camera, every image shares camera_id 1 built
             from the first image, matching the reference's
             single-camera mode)
    """
    import os

    import numpy as np

    try:
        from PIL import Image
    except ImportError as e:
        raise SystemExit("image loading requires PIL; for synthetic "
                         "pipelines use `synthetic_scene`") from e
    opts = options or ImageReaderOptions()
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff"}
    files = sorted(f for f in os.listdir(image_path)
                   if os.path.splitext(f.lower())[1] in exts)
    images, names, cams = {}, {}, {}
    shared_cam = None
    for k, f in enumerate(files):
        img_id = k + 1
        with Image.open(os.path.join(image_path, f)) as im:
            exif = extract_exif(im)
            arr = np.asarray(im.convert("L"), np.float32) / 255.0
        images[img_id] = arr
        names[img_id] = f
        h, w = arr.shape
        if opts.single_camera:
            if shared_cam is None:
                shared_cam = camera_from_exif(1, w, h, exif, opts)
            cams[img_id] = shared_cam
        else:
            cams[img_id] = camera_from_exif(img_id, w, h, exif, opts)
    return images, names, cams
