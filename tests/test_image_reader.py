"""ImageReader EXIF-parity tests (ref base/image_reader.{h,cc}):
EXIF focal -> SIMPLE_RADIAL camera with prior focal; heuristic fallback
without EXIF; single-camera and explicit-params modes."""

import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene.image_reader import (ImageReaderOptions,
                                           camera_from_exif,
                                           default_camera_params,
                                           extract_exif,
                                           read_images_with_cameras)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_jpg(path, w=64, h=48, make=None, model=None, focal_mm=None,
               focal_35mm=None):
    img = Image.fromarray(
        (np.random.default_rng(0).random((h, w)) * 255).astype("uint8"))
    exif = Image.Exif()
    if make:
        exif[271] = make
    if model:
        exif[272] = model
    ifd = exif.get_ifd(34665)
    if focal_mm is not None:
        ifd[37386] = focal_mm
    if focal_35mm is not None:
        ifd[41989] = focal_35mm
    img.save(path, exif=exif)


def test_exif_35mm_equivalent_gives_prior_focal(tmp_path):
    _write_jpg(tmp_path / "a.jpg", w=640, h=480, make="SomeMake",
               model="SomeModel", focal_35mm=50)
    images, names, cams = read_images_with_cameras(str(tmp_path))
    cam = cams[1]
    assert cam.model_name == "SIMPLE_RADIAL"  # ref default model
    assert cam.prior_focal
    assert cam.focal() == pytest.approx(50.0 / 35.0 * 640, rel=1e-6)
    assert cam.params[3] == 0.0  # distortion slot present, zero-init


def test_exif_sensor_db_focal(tmp_path):
    # known full-frame body in the specs table: focal_px = mm / 35.8 * w
    _write_jpg(tmp_path / "a.jpg", w=640, h=480, make="Canon",
               model="Canon EOS 5D Mark II", focal_mm=35.0)
    images, names, cams = read_images_with_cameras(str(tmp_path))
    assert cams[1].prior_focal
    assert cams[1].focal() == pytest.approx(35.0 / 35.8 * 640, rel=1e-6)


def test_no_exif_falls_back_to_factor_no_prior(tmp_path):
    _write_jpg(tmp_path / "a.jpg", w=640, h=480)
    images, names, cams = read_images_with_cameras(
        str(tmp_path), ImageReaderOptions(default_focal_length_factor=1.2))
    assert not cams[1].prior_focal
    assert cams[1].focal() == pytest.approx(1.2 * 640)


def test_single_camera_shares_record(tmp_path):
    _write_jpg(tmp_path / "a.jpg", w=64, h=48)
    _write_jpg(tmp_path / "b.jpg", w=64, h=48)
    images, names, cams = read_images_with_cameras(
        str(tmp_path), ImageReaderOptions(single_camera=True))
    assert cams[1] is cams[2]
    assert cams[1].camera_id == 1


def test_explicit_camera_params_pin_calibration(tmp_path):
    _write_jpg(tmp_path / "a.jpg", w=64, h=48)
    opts = ImageReaderOptions(camera_model="PINHOLE",
                              camera_params="100,101,32,24")
    images, names, cams = read_images_with_cameras(str(tmp_path), opts)
    assert cams[1].model_name == "PINHOLE"
    assert cams[1].params == (100.0, 101.0, 32.0, 24.0)
    assert cams[1].prior_focal


def test_default_params_all_models():
    for name, mid in cm.CAMERA_MODEL_IDS.items():
        p = default_camera_params(name, 100, 80, 120.0)
        assert len(p) == cm.CAMERA_MODEL_NUM_PARAMS[mid], name
        assert p[0] == 120.0
        if name == "FOV":
            assert p[4] != 0.0  # omega=0 is singular


def test_extract_exif_handles_missing():
    img = Image.fromarray(np.zeros((8, 8), np.uint8))
    assert extract_exif(img) == {}


def test_camera_from_exif_bad_params_count():
    with pytest.raises(ValueError):
        camera_from_exif(1, 64, 48, {}, ImageReaderOptions(
            camera_model="PINHOLE", camera_params="1,2,3"))


def test_cli_feature_extractor_uses_exif(tmp_path):
    """End-to-end through the CLI flags: EXIF -> SIMPLE_RADIAL prior
    focal camera in the written database."""
    from dagsfm_tpu.pipeline.cli import build_parser
    from dagsfm_tpu.scene.io import ColmapDatabase

    imdir = tmp_path / "imgs"
    imdir.mkdir()
    _write_jpg(imdir / "a.jpg", w=96, h=64, make="SomeMake",
               model="SomeModel", focal_35mm=35)
    db = str(tmp_path / "database.db")
    p = build_parser()
    args = p.parse_args(["feature_extractor", "--image_path", str(imdir),
                         "--database_path", db,
                         "--max_num_features", "64"])
    args.func(args)
    with ColmapDatabase(db) as d:
        cams = d.read_cameras()
    cam = list(cams.values())[0]
    assert cam.model_name == "SIMPLE_RADIAL"
    assert cam.prior_focal
    assert cam.focal() == pytest.approx(96.0, rel=1e-6)  # 35/35*96
