"""Coordinate-frame estimation + new CLI parity batch tests.

Mirrors ref estimators/coordinate_frame_test.cc (gravity from image
orientation) and exercises the CLI commands added for parity
(image_filterer / image_deleter / color_extractor / database_merger /
model_orientation_aligner / rig config / stereo rectification)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from dagsfm_tpu.estimation import coordinate_frame as cf
from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import io as scene_io
from dagsfm_tpu.scene import synthetic


def _synth_rec(n=8, seed=0, noise=0.0):
    sc = synthetic.generate(synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=120, pixel_noise=noise, seed=seed))
    return synthetic.to_reconstruction(sc)


class TestConsensusAxis:
    def test_majority_wins(self):
        rng = np.random.default_rng(0)
        good = [np.array([0, 1, 0.0]) + rng.normal(0, 0.005, 3)
                for _ in range(15)]
        good = [a / np.linalg.norm(a) for a in good]
        bad = [np.array([1.0, 0, 0]), np.array([0.0, 0, 1])]
        axis = cf.find_best_consensus_axis(good + bad, 0.05)
        assert axis @ [0, 1, 0] > 0.999

    def test_empty(self):
        assert np.allclose(cf.find_best_consensus_axis([]), 0)

    def test_gravity_identity_cams(self):
        # all cameras share R: down axis = R.row(1) exactly
        # (ref coordinate_frame_test.cc TestEstimateGravityVector...)
        rec = _synth_rec()
        g = cf.estimate_gravity_vector_from_image_orientation(rec)
        rows = [np.asarray(rops.quat_to_rotmat_np(
            rec.images[i].qvec))[1] for i in rec.reg_image_ids]
        dots = [abs(g @ r) for r in rows]
        assert np.median(dots) > 0.95


class TestRotationFromUnitVectors:
    def test_maps_a_to_b(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            a = rng.normal(size=3)
            a /= np.linalg.norm(a)
            b = rng.normal(size=3)
            b /= np.linalg.norm(b)
            R = cf.rotation_from_unit_vectors(a, b)
            np.testing.assert_allclose(R @ a, b, atol=1e-12)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    def test_identical_and_opposite(self):
        np.testing.assert_allclose(
            cf.rotation_from_unit_vectors([0, 0, 1], [0, 0, 1]), np.eye(3))
        R = cf.rotation_from_unit_vectors([0, 0, 1], [0, 0, -1])
        np.testing.assert_allclose(R @ [0, 0, 1], [0, 0, -1], atol=1e-12)


class TestHoughAndVP:
    def test_orientations(self):
        img = np.zeros((128, 128), np.float32)
        img[:, 40:70] = 1.0
        lines, sup, theta = cf.detect_lines(img)
        assert len(lines) > 0
        assert np.all(np.minimum(theta, np.pi - theta) < np.deg2rad(5))

    def test_vanishing_point(self):
        vp_true = np.array([250.0, -120.0, 1.0])
        Ls = []
        for ang in np.linspace(0.2, 2.8, 10):
            d = np.array([np.cos(ang), np.sin(ang)])
            n = np.array([-d[1], d[0]])
            Ls.append([n[0], n[1], -(n @ vp_true[:2])])
        vp, inl = cf.estimate_vanishing_point(
            np.asarray(Ls), np.ones(10), 0.02, 500.0)
        np.testing.assert_allclose(vp[:2] / vp[2], vp_true[:2], atol=1.0)
        assert inl.sum() == 10

    def test_manhattan_frame_axis_aligned(self):
        # identity-rotation cameras viewing axis-aligned edges: down
        # axis of the frame should be ~[0, 1, 0]
        rec = _synth_rec(n=4)
        for iid in rec.reg_image_ids:
            rec.images[iid].qvec = np.array([1.0, 0, 0, 0])
        img = np.zeros((128, 128), np.float32)
        img[:, 30:50] = 1.0
        img[:, 80:90] = 0.6
        img[20:40, :] += 0.4
        images = {iid: img for iid in rec.reg_image_ids}
        frame = cf.estimate_manhattan_world_frame(
            rec, images, cf.ManhattanOptions(max_image_size=256))
        down = frame[:, 1]
        assert abs(down @ [0, 1, 0]) > 0.9


class TestFilterAndColors:
    def test_filter_images(self):
        rec = _synth_rec()
        # poison one camera with an absurd focal length
        cid = rec.images[rec.reg_image_ids[0]].camera_id
        cam = rec.cameras[cid]
        params = list(cam.params)
        params[0] = cam.width * 100.0
        rec.cameras[cid] = cam._replace(params=tuple(params))
        before = rec.num_reg_images()
        dropped = rec.filter_images()
        assert len(dropped) >= 1
        assert rec.num_reg_images() == before - len(dropped)

    def test_extract_colors(self):
        rec = _synth_rec(n=4)
        img = np.full((1000, 1000, 3), 0.5, np.float32)
        images = {iid: img for iid in rec.reg_image_ids}
        n = rec.extract_colors(images)
        assert n > 0
        pid = next(iter(rec.points3D))
        assert np.all(np.abs(
            rec.points3D[pid].color.astype(int) - 127) <= 1)


class TestDatabaseMerge:
    def test_merge(self, tmp_path):
        p1, p2, po = (str(tmp_path / f"{n}.db") for n in "abo")
        rng = np.random.default_rng(0)
        for p, names in ((p1, ["x1.jpg", "x2.jpg"]),
                         (p2, ["x2.jpg", "x3.jpg"])):
            with scene_io.ColmapDatabase(p) as db:
                cam = cm.make_simple_camera(1, 640, 480)
                db.add_camera(cam)
                ids = []
                for nm in names:
                    iid = db.add_image(nm, 1)
                    ids.append(iid)
                    db.add_keypoints(iid, rng.uniform(
                        0, 640, (20, 2)).astype(np.float32))
                    db.add_descriptors(iid, rng.integers(
                        0, 255, (20, 128), dtype=np.uint8))
                db.add_matches(ids[0], ids[1], np.stack(
                    [np.arange(10), np.arange(10)], 1).astype(np.uint32))
                db.add_two_view_geometry(ids[0], ids[1], np.stack(
                    [np.arange(8), np.arange(8)], 1).astype(np.uint32))
        db1 = scene_io.ColmapDatabase(p1)
        db2 = scene_io.ColmapDatabase(p2)
        out = scene_io.ColmapDatabase(po)
        scene_io.ColmapDatabase.merge(db1, db2, out)
        imgs = out.read_images()
        names = {n for n, _ in imgs.values()}
        assert names == {"x1.jpg", "x2.jpg", "x3.jpg"}
        assert out.num_two_view_geometries() == 2
        for d in (db1, db2, out):
            d.close()


class TestStereoRectification:
    def test_epipolar_alignment(self):
        from dagsfm_tpu.scene import undistortion as und
        rng = np.random.default_rng(3)
        cam = cm.make_simple_camera(1, 640, 480, focal=500.0,
                                    model="PINHOLE")
        R12 = np.asarray(rops.angleaxis_to_rotmat(
            jnp.asarray([0.03, -0.02, 0.04])))
        t12 = np.array([1.0, 0.1, -0.05])
        q12 = np.asarray(rops.rotmat_to_quat_np(R12))
        H1, H2, Q = und.rectify_stereo_cameras(cam, cam, q12, t12)
        X = rng.uniform(-1, 1, (40, 3)) + [0, 0, 8.0]
        K = np.asarray(cam.calibration_matrix())
        x1 = (K @ X.T).T
        x1 = x1[:, :2] / x1[:, 2:]
        X2 = (R12 @ X.T).T + t12
        x2 = (K @ X2.T).T
        x2 = x2[:, :2] / x2[:, 2:]
        h1 = (H1 @ np.c_[x1, np.ones(40)].T).T
        h1 = h1[:, :2] / h1[:, 2:]
        h2 = (H2 @ np.c_[x2, np.ones(40)].T).T
        h2 = h2[:, :2] / h2[:, 2:]
        # rectified rows must align (horizontal epipolar lines)
        assert np.abs(h1[:, 1] - h2[:, 1]).max() < 1e-9
        # disparity-to-depth: reproject a rectified point through Q
        disp = h1[:, 0] - h2[:, 0]
        hom = np.c_[h1, disp, np.ones(40)] @ Q
        depth_est = hom[:, 2] / hom[:, 3]
        assert np.all(depth_est > 0)


class TestRigConfig:
    def _rig_rec(self):
        rec = _synth_rec(n=8)
        # rename images into two-camera rig pattern: camL_t.jpg, camR_t.jpg
        ids = sorted(rec.images)
        # two cameras in the rig, snapshots = consecutive image pairs
        cam2 = cm.make_simple_camera(99, 640, 480)
        rec.cameras[99] = cam2
        for k, iid in enumerate(ids):
            im = rec.images[iid]
            if k % 2 == 0:
                im.name = f"camL/shot{k // 2:03d}.jpg"
            else:
                im.name = f"camR/shot{k // 2:03d}.jpg"
                im.camera_id = 99
        return rec, ids

    def test_read_rig_config(self, tmp_path):
        import json
        from dagsfm_tpu.scene import camera_rig as crig
        rec, ids = self._rig_rec()
        cfg = [{
            "ref_camera_id": rec.images[ids[0]].camera_id,
            "cameras": [
                {"camera_id": rec.images[ids[0]].camera_id,
                 "image_prefix": "camL/"},
                {"camera_id": 99, "image_prefix": "camR/"},
            ],
        }]
        p = str(tmp_path / "rig.json")
        with open(p, "w") as f:
            json.dump(cfg, f)
        rigs = crig.read_rig_config(p, rec)
        assert len(rigs) == 1
        assert rigs[0].num_cameras == 2
        assert rigs[0].num_snapshots == 4
        prob, meta = crig.make_rig_ba_problem(rec, rigs)
        assert prob.obs_xy.shape[0] > 0
        assert prob.rig_q.shape[0] == 4


class TestCliBatch:
    def _write_model(self, tmp_path, n=6):
        rec = _synth_rec(n=n)
        p = str(tmp_path / "model")
        os.makedirs(p, exist_ok=True)
        scene_io.write_model_bin(rec, p)
        return rec, p

    def test_image_deleter(self, tmp_path, capsys):
        from dagsfm_tpu.pipeline.cli import main
        rec, p = self._write_model(tmp_path)
        ids_file = str(tmp_path / "ids.txt")
        victim = rec.reg_image_ids[0]
        with open(ids_file, "w") as f:
            f.write(f"{victim}\n")
        out = str(tmp_path / "out")
        main(["image_deleter", "--input_path", p, "--output_path", out,
              "--image_ids_path", ids_file])
        rec2 = scene_io.read_model_bin(out)
        assert victim not in rec2.reg_image_ids

    def test_image_filterer(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        rec, p = self._write_model(tmp_path)
        out = str(tmp_path / "out")
        main(["image_filterer", "--input_path", p, "--output_path", out,
              "--min_num_observations", "0"])
        rec2 = scene_io.read_model_bin(out)
        assert rec2.num_reg_images() == rec.num_reg_images()

    def test_orientation_aligner_image_orientation(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        rec, p = self._write_model(tmp_path)
        out = str(tmp_path / "out")
        main(["model_orientation_aligner", "--input_path", p,
              "--output_path", out, "--method", "IMAGE-ORIENTATION"])
        rec2 = scene_io.read_model_bin(out)
        g = cf.estimate_gravity_vector_from_image_orientation(rec2)
        # after alignment the consensus down-axis is the +y axis
        assert g @ [0, 1, 0] > 0.9

    def test_project_generator(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        out = str(tmp_path / "project.ini")
        main(["project_generator", "--output_path", out,
              "--quality", "medium"])
        assert os.path.exists(out)

    def test_feature_importer(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        imp = tmp_path / "feats"
        imp.mkdir()
        rng = np.random.default_rng(0)
        rows = np.c_[rng.uniform(0, 640, (12, 2)),
                     np.ones((12, 1)), np.zeros((12, 1)),
                     rng.uniform(0, 0.3, (12, 128))]
        hdr = "12 128"
        np.savetxt(str(imp / "a.jpg.txt"), rows, header=hdr, comments="")
        db = str(tmp_path / "f.db")
        main(["feature_importer", "--database_path", db,
              "--import_path", str(imp)])
        with scene_io.ColmapDatabase(db) as d:
            imgs = d.read_images()
            assert len(imgs) == 1
            iid = next(iter(imgs))
            assert d.read_keypoints(iid).shape[0] == 12
            assert d.read_descriptors(iid).shape == (12, 128)


def test_detect_line_segments_endpoints_and_gap():
    """LSD-role segment detector (ref base/line.h DetectLineSegments):
    endpoints recovered, collinear segments split at gaps, orientation
    classification (ClassifyLineSegmentOrientations)."""
    from dagsfm_tpu.estimation.coordinate_frame import (
        HORIZONTAL, VERTICAL, classify_line_segment_orientations,
        detect_line_segments)

    img = np.zeros((200, 300), np.float32)
    img[50:53, 20:140] = 1.0      # horizontal bar 1
    img[50:53, 180:280] = 1.0     # horizontal bar 2 (same line, gap)
    img[90:180, 150:153] = 1.0    # vertical bar
    img += np.random.default_rng(0).normal(0, 0.01, img.shape).astype(
        np.float32)
    segs, lidx = detect_line_segments(img, min_length=30)
    ori = classify_line_segment_orientations(segs)
    h = [s for s, o in zip(segs, ori)
         if o == HORIZONTAL and abs(s[0][1] - 51) < 6]
    v = [s for s, o in zip(segs, ori)
         if o == VERTICAL and abs(s[0][0] - 151) < 6]
    # the gap splits the horizontal line into two segments; the vertical
    # bar yields at least one (each bar edge is a genuine line)
    assert len(h) >= 2, h
    assert len(v) >= 1, v
    lens = sorted(float(np.linalg.norm(s[1] - s[0])) for s in h)[-2:]
    # ~100 px and ~120 px bars (Hough angle quantization can clip a few
    # percent off the projected extent)
    assert 60 < lens[0] < 140 and 90 < lens[1] < 140, lens
    vlen = max(float(np.linalg.norm(s[1] - s[0])) for s in v)
    assert 70 < vlen < 110, vlen
