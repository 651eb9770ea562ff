"""Database-backed matchers (spatial / transitive / retriever CLI) tests.

Mirrors the ref's matcher behavior over an existing database
(feature/matching.h:466,486): features already in the DB, pair lists
generated from priors / transitivity, verified geometries appended."""
import os

import numpy as np

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import io as scene_io
from dagsfm_tpu.scene import synthetic


def _scene_db(tmp_path, n=6, with_priors=True):
    """Database whose 'descriptors' are synthetic but consistent:
    corresponding points across images share a descriptor, so matching
    recovers the ground-truth correspondences."""
    sc = synthetic.generate(synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=80, pixel_noise=0.0, seed=3))
    rec = synthetic.to_reconstruction(sc)
    rng = np.random.default_rng(0)
    # one stable random unit descriptor per 3D point
    pids = sorted(rec.points3D)
    d_of = {}
    for pid in pids:
        v = rng.normal(0, 1, 128)
        d_of[pid] = (v / np.linalg.norm(v)).astype(np.float32)
    path = str(tmp_path / "scene.db")
    db = scene_io.ColmapDatabase(path)
    for cid, cam in rec.cameras.items():
        db.add_camera(cam)
    centers = {}
    for iid in sorted(rec.images):
        im = rec.images[iid]
        from dagsfm_tpu.ops import rotations as rops
        R = np.asarray(rops.quat_to_rotmat_np(im.qvec))
        centers[iid] = -R.T @ im.tvec
        db.add_image(f"img{iid:03d}.jpg", im.camera_id, image_id=iid,
                     prior_tvec=centers[iid] if with_priors else None)
        keep = im.point3D_ids >= 0
        db.add_keypoints(iid, im.xys[keep].astype(np.float32))
        desc = np.stack([d_of[int(p)] for p in im.point3D_ids[keep]])
        desc = np.clip(np.round(np.abs(desc) * 512), 0, 255).astype(
            np.uint8)
        db.add_descriptors(iid, desc)
    db.close()
    return path, rec, centers


class TestSpatialMatcher:
    def test_pairs_and_verify(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        path, rec, centers = _scene_db(tmp_path)
        main(["spatial_matcher", "--database_path", path,
              "--max_num_neighbors", "3", "--max_distance", "1000"])
        with scene_io.ColmapDatabase(path) as db:
            assert db.num_two_view_geometries() > 0

    def test_priors_roundtrip(self, tmp_path):
        path, rec, centers = _scene_db(tmp_path)
        with scene_io.ColmapDatabase(path) as db:
            priors = db.read_image_priors()
        assert set(priors) == set(rec.images)
        for iid, t in priors.items():
            np.testing.assert_allclose(t, centers[iid], atol=1e-9)


class TestTransitiveMatcher:
    def test_closes_triangles(self, tmp_path):
        from dagsfm_tpu.pipeline.cli import main
        from dagsfm_tpu.pipeline.feature_pipeline import (
            run_matcher_on_database)
        path, rec, _ = _scene_db(tmp_path, with_priors=False)
        ids = sorted(rec.images)
        # seed chain matches 1-2, 2-3 via direct matcher
        n = run_matcher_on_database(path, [(ids[0], ids[1]),
                                           (ids[1], ids[2])])
        assert n == 2
        main(["transitive_matcher", "--database_path", path,
              "--num_iterations", "1"])
        with scene_io.ColmapDatabase(path) as db:
            pairs = {(i, j) for (i, j, m, *_)
                     in db.read_all_two_view_geometries()}
        assert (ids[0], ids[2]) in pairs


class TestVocabTreeRetrieverCli:
    def test_retriever(self, tmp_path, capsys):
        from dagsfm_tpu.pipeline.cli import main
        path, rec, _ = _scene_db(tmp_path, with_priors=False)
        vt = str(tmp_path / "tree.npz")
        main(["vocab_tree_builder", "--database_path", path,
              "--vocab_tree_path", vt,
              "--branching", "4", "--depth", "2"])
        main(["vocab_tree_retriever", "--database_path", path,
              "--vocab_tree_path", vt, "--num_images", "3"])
        out = capsys.readouterr().out
        assert "img" in out


class TestRigBundleAdjusterCli:
    def test_rig_ba(self, tmp_path):
        import json
        from dagsfm_tpu.pipeline.cli import main
        sc = synthetic.generate(synthetic.SyntheticSceneSpec(
            num_cameras=8, num_points=60, pixel_noise=0.2, seed=5))
        rec = synthetic.to_reconstruction(sc)
        ids = sorted(rec.images)
        cam2 = cm.make_simple_camera(99, *(
            rec.cameras[rec.images[ids[0]].camera_id].width,
            rec.cameras[rec.images[ids[0]].camera_id].height))
        rec.cameras[99] = cam2
        for k, iid in enumerate(ids):
            im = rec.images[iid]
            if k % 2 == 0:
                im.name = f"camL/shot{k // 2:03d}.jpg"
            else:
                im.name = f"camR/shot{k // 2:03d}.jpg"
        model = str(tmp_path / "model")
        os.makedirs(model)
        scene_io.write_model_bin(rec, model)
        cfg = [{
            "ref_camera_id": rec.images[ids[0]].camera_id,
            "cameras": [
                {"camera_id": rec.images[ids[0]].camera_id,
                 "image_prefix": "camL/"},
            ],
        }]
        cfg_path = str(tmp_path / "rig.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        out = str(tmp_path / "out")
        main(["rig_bundle_adjuster", "--input_path", model,
              "--output_path", out, "--rig_config_path", cfg_path,
              "--max_num_iterations", "10"])
        rec2 = scene_io.read_model_bin(out)
        assert rec2.num_reg_images() == rec.num_reg_images()


class TestShardedMatching:
    def test_matches_equal_unsharded(self):
        import jax
        from dagsfm_tpu.features.matching import (MatchingOptions,
                                                  match_pairs)
        from dagsfm_tpu.parallel.matching_sharded import (
            match_pairs_sharded)
        rng = np.random.default_rng(7)
        K = 64
        descs, masks = {}, {}
        base = rng.normal(0, 1, (40, 128)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        for i in range(6):
            d = base + rng.normal(0, 0.05, base.shape).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            pad = np.zeros((K, 128), np.float32)
            pad[:40] = d
            descs[i] = pad
            m = np.zeros(K, bool)
            m[:40] = True
            masks[i] = m
        pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        opts = MatchingOptions()
        ref = match_pairs(descs, masks, pairs, opts, use_pallas=False)
        shd = match_pairs_sharded(descs, masks, pairs, opts)
        assert jax.device_count() >= 8   # virtual CPU mesh active
        assert set(ref) == set(shd)
        for p in pairs:
            np.testing.assert_array_equal(ref[p], shd[p])
            assert len(ref[p]) > 10
