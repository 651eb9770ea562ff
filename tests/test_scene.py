"""Synthetic scene generator + model I/O + reconstruction container tests.

Mirrors the reference's base/reconstruction_test.cc style on in-memory
objects, plus the end-to-end synthetic backbone the reference lacks.
"""
import numpy as np
import pytest

from dagsfm_tpu.scene import io as scene_io
from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.scene.reconstruction import Reconstruction


@pytest.fixture(scope="module")
def scene():
    spec = synthetic.SyntheticSceneSpec(num_cameras=12, num_points=200, seed=3)
    return synthetic.generate(spec)


def test_generate_visibility(scene):
    # every camera sees a decent number of points; tracks exist
    per_cam = scene.visible.sum(axis=1)
    assert (per_cam > 20).all()
    track_len = scene.visible.sum(axis=0)
    assert (track_len[track_len > 0] >= 2).all()


def test_projection_consistency(scene):
    # re-project manually and compare with stored pixels (no noise configured)
    i, p = np.argwhere(scene.visible)[0]
    Xc = scene.R[i] @ scene.points[p] + scene.t[i]
    f, cx, cy = scene.camera.params
    pix = Xc[:2] / Xc[2] * f + np.array([cx, cy])
    np.testing.assert_allclose(pix, scene.pixels[i, p], atol=1e-9)


def test_to_reconstruction_reproj(scene):
    rec = synthetic.to_reconstruction(scene)
    assert rec.num_reg_images() == 12
    assert rec.num_points3D() > 100
    arrays, ids = rec.to_arrays()
    from dagsfm_tpu.ops import projection
    import jax.numpy as jnp
    import jax
    arrs = jax.tree.map(jnp.asarray, arrays)
    err = projection.mean_reproj_error(arrs)
    assert float(err) < 1e-6  # exact synthetic scene reprojects perfectly


def test_pose_errors_identity(scene):
    rec = synthetic.to_reconstruction(scene)
    errs = synthetic.pose_errors(rec, scene)
    assert errs["ate"] < 1e-9
    assert errs["rot_err_deg_max"] < 1e-6


def test_model_bin_roundtrip(scene, tmp_path):
    rec = synthetic.to_reconstruction(scene)
    scene_io.write_model_bin(rec, str(tmp_path))
    rec2 = scene_io.read_model_bin(str(tmp_path))
    assert set(rec2.images) == set(rec.images)
    assert set(rec2.points3D) == set(rec.points3D)
    for pid in rec.points3D:
        np.testing.assert_allclose(rec2.points3D[pid].xyz,
                                   rec.points3D[pid].xyz, atol=1e-12)
        assert rec2.points3D[pid].track == rec.points3D[pid].track
    i = next(iter(rec.images))
    np.testing.assert_allclose(rec2.images[i].qvec, rec.images[i].qvec)
    np.testing.assert_array_equal(rec2.images[i].point3D_ids,
                                  rec.images[i].point3D_ids)


def test_model_text_roundtrip(scene, tmp_path):
    rec = synthetic.to_reconstruction(scene)
    scene_io.write_model_text(rec, str(tmp_path))
    rec2 = scene_io.read_model_text(str(tmp_path))
    assert set(rec2.images) == set(rec.images)
    for pid in rec.points3D:
        np.testing.assert_allclose(rec2.points3D[pid].xyz,
                                   rec.points3D[pid].xyz, atol=1e-12)


def test_database_roundtrip(tmp_path, scene):
    path = str(tmp_path / "database.db")
    with scene_io.ColmapDatabase(path) as db:
        db.add_camera(scene.camera)
        id1 = db.add_image("a.jpg", 1)
        id2 = db.add_image("b.jpg", 1)
        kp = np.random.default_rng(0).uniform(0, 100, (50, 2)).astype(np.float32)
        db.add_keypoints(id1, kp)
        desc = np.random.default_rng(1).integers(0, 255, (50, 128)).astype(np.uint8)
        db.add_descriptors(id1, desc)
        matches = np.array([[0, 3], [1, 5], [2, 7]], np.uint32)
        db.add_matches(id1, id2, matches)
        db.add_two_view_geometry(id1, id2, matches[:2], config=2)
    with scene_io.ColmapDatabase(path) as db:
        assert db.read_cameras()[1].params == scene.camera.params
        np.testing.assert_allclose(db.read_keypoints(id1)[:, :2], kp)
        np.testing.assert_array_equal(db.read_descriptors(id1), desc)
        np.testing.assert_array_equal(db.read_matches(id1, id2), matches)
        # reversed query flips columns
        np.testing.assert_array_equal(db.read_matches(id2, id1),
                                      matches[:, ::-1])
        tvgs = list(db.read_all_two_view_geometries())
        assert len(tvgs) == 1 and tvgs[0][0] == id1
        assert db.num_two_view_geometries() == 1


def test_merge_points_and_observations():
    import dagsfm_tpu.scene.cameras as cm
    from dagsfm_tpu.scene.reconstruction import ImageRecord
    rec = Reconstruction()
    rec.add_camera(cm.make_simple_camera(1, 100, 100))
    for i in (1, 2, 3):
        rec.add_image(ImageRecord(
            image_id=i, name=f"i{i}", camera_id=1,
            qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
            xys=np.zeros((5, 2)), point3D_ids=np.full(5, -1, np.int64),
            registered=True))
    p1 = rec.add_point3D([0, 0, 1], [(1, 0), (2, 0)])
    p2 = rec.add_point3D([0, 0, 2], [(3, 0)])
    rec.add_observation(p2, 2, 1)
    assert rec.images[2].point3D_ids[1] == p2
    rec.merge_points3D(p1, p2)
    assert p2 not in rec.points3D
    assert rec.images[3].point3D_ids[0] == p1
    assert len(rec.points3D[p1].track) == 4
    rec.delete_point3D(p1)
    assert rec.images[1].point3D_ids[0] == -1
