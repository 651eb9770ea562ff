"""Byte-level interop proof against the REFERENCE's own readers.

scene/io.py round-trips were previously only self-consistent (a
symmetric byte-order/convention bug would pass). Here models and
databases written by dagsfm_tpu are read back with the reference's own
Python tooling (/root/reference/scripts/python/read_model.py and
database.py — imported read-only) and compared field by field.
"""
import importlib.util
import os
import sqlite3

import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import io as scene_io
from dagsfm_tpu.scene import synthetic

REF_SCRIPTS = "/root/reference/scripts/python"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SCRIPTS),
    reason="reference checkout not available")


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rec():
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=7, num_points=120, pixel_noise=0.3, seed=9)
    return synthetic.to_reconstruction(synthetic.generate(spec))


def _check_with_ref_reader(rec, model_dir, ext):
    rm = _load_ref("read_model")
    cams, imgs, pts = rm.read_model(model_dir, ext)

    assert set(cams) == set(rec.cameras)
    for cid, cam in rec.cameras.items():
        rc = cams[cid]
        assert rc.model == cam.model_name
        assert (rc.width, rc.height) == (cam.width, cam.height)
        np.testing.assert_allclose(np.asarray(rc.params, float),
                                   np.asarray(cam.params, float),
                                   rtol=0, atol=1e-9)

    reg = {i for i in rec.reg_image_ids}
    assert set(imgs) == reg
    for i in reg:
        ri = imgs[i]
        im = rec.images[i]
        np.testing.assert_allclose(ri.qvec, im.qvec, atol=1e-9)
        np.testing.assert_allclose(ri.tvec, im.tvec, atol=1e-9)
        assert ri.camera_id == im.camera_id
        assert ri.name == im.name
        np.testing.assert_allclose(ri.xys, im.xys, atol=1e-6)
        np.testing.assert_array_equal(ri.point3D_ids, im.point3D_ids)

    assert set(pts) == set(rec.points3D)
    for pid, pt in rec.points3D.items():
        rp = pts[pid]
        np.testing.assert_allclose(rp.xyz, pt.xyz, atol=1e-9)
        np.testing.assert_array_equal(
            rp.image_ids, np.array([t[0] for t in pt.track]))
        np.testing.assert_array_equal(
            rp.point2D_idxs, np.array([t[1] for t in pt.track]))


def test_binary_model_read_by_reference(rec, tmp_path):
    out = str(tmp_path / "model")
    os.makedirs(out)
    scene_io.write_model_bin(rec, out)
    _check_with_ref_reader(rec, out, ".bin")


def test_text_model_read_by_reference(rec, tmp_path):
    out = str(tmp_path / "model_txt")
    os.makedirs(out)
    scene_io.write_model_text(rec, out)
    _check_with_ref_reader(rec, out, ".txt")


def test_database_read_by_reference_conventions(tmp_path):
    """Keypoints/descriptors/matches/two-view geometries written by
    ColmapDatabase decode exactly with the reference's database.py
    (blob_to_array + pair_id packing, scripts/python/database.py)."""
    db_mod = _load_ref("database")
    path = str(tmp_path / "interop.db")
    rng = np.random.default_rng(0)
    kps1 = rng.uniform(0, 640, (37, 2)).astype(np.float64)
    kps2 = rng.uniform(0, 640, (29, 2)).astype(np.float64)
    desc1 = rng.integers(0, 256, (37, 128)).astype(np.uint8)
    matches = np.stack([np.arange(20), np.arange(20) + 3],
                       axis=1).astype(np.uint32)
    F = rng.normal(size=(3, 3))

    cam = cm.make_simple_camera(1, 640, 480, focal=500.0)
    with scene_io.ColmapDatabase(path) as db:
        db.add_camera(cam)
        db.add_image("a.jpg", 1, image_id=1)
        db.add_image("b.jpg", 1, image_id=2)
        db.add_keypoints(1, kps1)
        db.add_keypoints(2, kps2)
        db.add_descriptors(1, desc1)
        db.add_matches(1, 2, matches)
        db.add_two_view_geometry(1, 2, matches, config=3, F=F)

    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT image_id, rows, cols, data FROM keypoints "
            "ORDER BY image_id").fetchall()
        assert [r[0] for r in rows] == [1, 2]
        k1 = db_mod.blob_to_array(rows[0][3], np.float32,
                                  (rows[0][1], rows[0][2]))
        np.testing.assert_allclose(k1[:, :2], kps1, atol=1e-5)

        r = con.execute("SELECT rows, cols, data FROM descriptors "
                        "WHERE image_id=1").fetchone()
        d1 = db_mod.blob_to_array(r[2], np.uint8, (r[0], r[1]))
        np.testing.assert_array_equal(d1, desc1)

        pair_id = db_mod.image_ids_to_pair_id(1, 2)
        r = con.execute("SELECT rows, cols, data FROM matches "
                        "WHERE pair_id=?", (pair_id,)).fetchone()
        m = db_mod.blob_to_array(r[2], np.uint32, (r[0], r[1]))
        np.testing.assert_array_equal(m, matches)
        assert db_mod.pair_id_to_image_ids(pair_id) == (1, 2)

        r = con.execute(
            "SELECT rows, cols, data, config, F FROM two_view_geometries "
            "WHERE pair_id=?", (pair_id,)).fetchone()
        g = db_mod.blob_to_array(r[2], np.uint32, (r[0], r[1]))
        np.testing.assert_array_equal(g, matches)
        assert r[3] == 3
        Fr = db_mod.blob_to_array(r[4], np.float64, (3, 3))
        np.testing.assert_allclose(Fr, F, atol=0)
    finally:
        con.close()


def test_database_written_by_reference_read_by_us(tmp_path):
    """Symmetric direction: a database created with the REFERENCE's
    database.py is readable by our ColmapDatabase."""
    db_mod = _load_ref("database")
    path = str(tmp_path / "ref_written.db")
    db = db_mod.COLMAPDatabase.connect(path)
    db.create_tables()
    rng = np.random.default_rng(1)
    cam_id = db.add_camera(1, 640, 480,  # 1 = PINHOLE
                           np.array([500.0, 510.0, 320, 240]))
    i1 = db.add_image("x.jpg", cam_id)
    i2 = db.add_image("y.jpg", cam_id)
    kps = rng.uniform(0, 640, (15, 2)).astype(np.float64)
    db.add_keypoints(i1, kps)
    db.add_keypoints(i2, kps + 1.0)
    m = np.stack([np.arange(10), np.arange(10)], 1).astype(np.uint32)
    db.add_matches(i1, i2, m)
    db.commit()
    db.close()

    with scene_io.ColmapDatabase(path) as ours:
        cams = ours.read_cameras()
        assert cams[cam_id].model_name == "PINHOLE"
        np.testing.assert_allclose(cams[cam_id].params[:4],
                                   [500.0, 510.0, 320, 240])
        imgs = ours.read_images()
        assert {n for (n, _c) in imgs.values()} == {"x.jpg", "y.jpg"}
        k = ours.read_keypoints(i1)
        np.testing.assert_allclose(k[:, :2], kps, atol=1e-5)
        got = ours.read_matches(i1, i2)
        np.testing.assert_array_equal(got, m)
