"""New CLI subcommand + warp/camera_database tests (ref exe/colmap.cc
subcommand surface: database_creator, matches_importer, point_triangulator,
image_undistorter, model_analyzer, model_merger, model_aligner,
vocab_tree_builder, point_filtering; base/warp.cc, base/camera_database)."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dagsfm_tpu.pipeline.cli import main as cli
from dagsfm_tpu.scene import io as scene_io, synthetic


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    spec = synthetic.SyntheticSceneSpec(num_cameras=8, num_points=120,
                                        pixel_noise=0.2, seed=5)
    rec = synthetic.to_reconstruction(synthetic.generate(spec))
    scene_io.write_model_bin(rec, str(d))
    return str(d), rec


def test_database_creator_and_matches_importer(tmp_path):
    db_path = str(tmp_path / "db.db")
    cli(["database_creator", "--database_path", db_path])
    assert os.path.exists(db_path)
    from dagsfm_tpu.scene.io import ColmapDatabase
    from dagsfm_tpu.scene import cameras as cm
    db = ColmapDatabase(db_path)
    db.add_camera(cm.make_simple_camera(1, 100, 100))
    for n in ("a.jpg", "b.jpg"):
        db.add_image(n, 1)
    db.close()
    mlist = tmp_path / "matches.txt"
    mlist.write_text("a.jpg b.jpg\n0 1\n1 2\n5 9\n")
    cli(["matches_importer", "--database_path", db_path,
         "--match_list_path", str(mlist)])
    db = ColmapDatabase(db_path)
    m = db.read_matches(1, 2)
    db.close()
    assert m.shape == (3, 2)
    assert (m == [[0, 1], [1, 2], [5, 9]]).all()


def test_model_analyzer(model_dir, capsys):
    d, rec = model_dir
    cli(["model_analyzer", "--input_path", d])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_reg_images"] == rec.num_reg_images()
    assert out["num_points3D"] == rec.num_points3D()
    assert out["mean_track_length"] >= 2


def test_point_filtering(model_dir, tmp_path):
    d, rec = model_dir
    out = str(tmp_path / "filtered")
    cli(["point_filtering", "--input_path", d, "--output_path", out,
         "--min_track_len", "3"])
    back = scene_io.read_model_bin(out)
    assert back.num_points3D() <= rec.num_points3D()
    assert all(len(p.track) >= 3 for p in back.points3D.values())


def test_image_undistorter_pmvs(model_dir, tmp_path):
    d, _ = model_dir
    out = str(tmp_path / "pmvs")
    cli(["image_undistorter", "--input_path", d, "--output_path", out,
         "--output_type", "PMVS"])
    assert os.path.exists(os.path.join(out, "vis.dat"))
    out2 = str(tmp_path / "colmap")
    cli(["image_undistorter", "--input_path", d, "--output_path", out2])
    assert os.path.exists(os.path.join(out2, "sparse", "cameras.bin"))


def test_model_aligner(model_dir, tmp_path):
    from dagsfm_tpu.ops import rotations as rops
    d, rec = model_dir
    # reference locations = true camera centers scaled+shifted
    s_gt, t_gt = 2.0, np.array([10.0, -5.0, 3.0])
    lines = []
    for iid in rec.reg_image_ids:
        im = rec.images[iid]
        R = np.asarray(rops.quat_to_rotmat_np(im.qvec))
        c = -R.T @ im.tvec
        ref = s_gt * c + t_gt
        lines.append(f"{im.name} {ref[0]} {ref[1]} {ref[2]}")
    refp = tmp_path / "refs.txt"
    refp.write_text("\n".join(lines))
    out = str(tmp_path / "aligned")
    cli(["model_aligner", "--input_path", d, "--ref_images_path",
         str(refp), "--output_path", out])
    back = scene_io.read_model_bin(out)
    # centers should now be at the reference locations
    for iid in back.reg_image_ids:
        im_a = back.images[iid]
        im_b = rec.images[iid]
        Ra = np.asarray(rops.quat_to_rotmat_np(im_a.qvec))
        Rb = np.asarray(rops.quat_to_rotmat_np(im_b.qvec))
        ca = -Ra.T @ im_a.tvec
        cb = s_gt * (-Rb.T @ im_b.tvec) + t_gt
        np.testing.assert_allclose(ca, cb, atol=1e-6)


def test_model_merger(model_dir, tmp_path):
    d, rec = model_dir
    out = str(tmp_path / "merged")
    cli(["model_merger", "--input_path1", d, "--input_path2", d,
         "--output_path", out])
    back = scene_io.read_model_bin(out)
    assert back.num_reg_images() == rec.num_reg_images()


def test_vocab_tree_builder(tmp_path):
    from dagsfm_tpu.scene.io import ColmapDatabase
    from dagsfm_tpu.scene import cameras as cm
    db_path = str(tmp_path / "db.db")
    rng = np.random.default_rng(0)
    db = ColmapDatabase(db_path)
    db.add_camera(cm.make_simple_camera(1, 100, 100))
    for k, n in enumerate(("a.jpg", "b.jpg")):
        iid = db.add_image(n, 1)
        db.add_descriptors(iid, rng.integers(
            0, 255, (128, 128)).astype(np.uint8))
    db.close()
    vt = str(tmp_path / "vocab.npz")
    cli(["vocab_tree_builder", "--database_path", db_path,
         "--vocab_tree_path", vt, "--branching", "4", "--depth", "2"])
    data = np.load(vt)
    assert data["level0"].shape == (1, 4, 128)
    assert data["level1"].shape == (4, 4, 128)
    assert data["thresholds"].shape[0] == 16


# ------------------------------------------------------------- warp/base

def test_warp_homography_identity_and_shift():
    from dagsfm_tpu.scene import warp
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (32, 40)).astype(np.float32))
    out = warp.warp_image_with_homography(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    H = jnp.asarray(np.array([[1, 0, 2.0], [0, 1, 0], [0, 0, 1]]))
    out = warp.warp_image_with_homography(img, H)
    np.testing.assert_allclose(np.asarray(out)[:, :-3],
                               np.asarray(img)[:, 2:-1], atol=1e-6)


def test_warp_between_cameras_undistorts():
    from dagsfm_tpu.scene import warp, cameras as cm
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (48, 48)).astype(np.float32))
    dist = cm.Camera(0, cm.CAMERA_MODEL_IDS["SIMPLE_RADIAL"], 48, 48,
                     (50.0, 24.0, 24.0, 0.1))
    pin = cm.Camera(1, cm.CAMERA_MODEL_IDS["SIMPLE_PINHOLE"], 48, 48,
                    (50.0, 24.0, 24.0))
    out = warp.warp_image_between_cameras(dist, pin, img)
    assert out.shape == (48, 48)
    # center is fixed point of radial distortion
    np.testing.assert_allclose(float(out[24, 24]), float(img[24, 24]),
                               atol=1e-3)


def test_resample_bilinear():
    from dagsfm_tpu.scene import warp
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    out = warp.resample_image_bilinear(img, 8, 8)
    assert out.shape == (8, 8)
    assert abs(float(out.mean()) - float(img.mean())) < 0.5


def test_camera_database_lookup():
    from dagsfm_tpu.scene import camera_database as cdb
    assert cdb.sensor_width_mm("Canon", "EOS 5D Mark III") == 35.8
    assert cdb.sensor_width_mm("APPLE", "iPhone 12 Pro") == 5.78
    assert cdb.sensor_width_mm("Unknown", "Thing") is None
    f, prior = cdb.focal_from_exif("Canon", "EOS 5D", 50.0, 6000, 4000)
    assert prior and abs(f - 50.0 / 35.8 * 6000) < 1e-6
    f35, prior = cdb.focal_from_exif("x", "y", 0.0, 6000, 4000,
                                     focal_35mm=35.0)
    assert prior and abs(f35 - 6000.0) < 1e-6
    fd, prior = cdb.focal_from_exif("no", "match", 0.0, 4000, 3000)
    assert not prior and abs(fd - 1.2 * 4000) < 1e-6
