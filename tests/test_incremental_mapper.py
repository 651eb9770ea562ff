"""End-to-end incremental mapper test: synthetic scene -> reconstruction.

The closed-loop accuracy test the reference lacks (SURVEY.md §4): known
ground truth -> matches -> full incremental SfM -> ATE/rotation checks.
"""
import numpy as np
import pytest

from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.sfm.correspondence_graph import build_tracks
from dagsfm_tpu.sfm.incremental_mapper import IncrementalMapper, MapperOptions


@pytest.fixture(scope="module")
def problem():
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=15, num_points=400, pixel_noise=0.3, seed=5)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc)
    return sc, cams, images, graph


def test_correspondence_graph(problem):
    sc, cams, images, graph = problem
    assert len(graph.image_pairs()) > 10
    i, j = graph.image_pairs()[0]
    m = graph.matches_between(i, j)
    assert len(m) >= 8
    rev = graph.matches_between(j, i)
    np.testing.assert_array_equal(rev, m[:, ::-1])
    assert graph.num_correspondences_for_image(i) > 0


def test_build_tracks(problem):
    sc, cams, images, graph = problem
    tracks = build_tracks(graph, min_length=2, max_length=50)
    assert len(tracks) > 200
    # every track observes one consistent GT point
    # (keypoint k of image i corresponds to k-th visible point)
    kp_to_pt = {}
    for i in range(sc.visible.shape[0]):
        vis = np.nonzero(sc.visible[i])[0]
        for k, p in enumerate(vis):
            kp_to_pt[(i + 1, k)] = p
    for tr in tracks[:50]:
        pts = {kp_to_pt[(i, k)] for (i, k) in tr}
        assert len(pts) == 1


def test_full_reconstruction(problem):
    sc, cams, images, graph = problem
    opts = MapperOptions(init_min_num_inliers=30, num_ransac_hypotheses=256,
                         seed=1)
    mapper = IncrementalMapper(cams, images, graph, opts)
    rec = mapper.reconstruct()
    assert rec.num_reg_images() == 15, rec.num_reg_images()
    assert rec.num_points3D() > 250
    errs = synthetic.pose_errors(rec, sc)
    assert errs["ate"] < 0.02, errs
    assert errs["rot_err_deg_mean"] < 0.1, errs
    mre = rec.compute_mean_reprojection_error()
    assert mre < 1.0, mre


def test_reconstruction_with_match_outliers(problem):
    sc = synthetic.generate(synthetic.SyntheticSceneSpec(
        num_cameras=12, num_points=300, pixel_noise=0.3, seed=9))
    cams, images, graph = synthetic.to_matching_problem(
        sc, match_outlier_fraction=0.1, seed=2)
    opts = MapperOptions(init_min_num_inliers=30, num_ransac_hypotheses=256,
                         seed=3)
    mapper = IncrementalMapper(cams, images, graph, opts)
    rec = mapper.reconstruct()
    assert rec.num_reg_images() >= 11, rec.num_reg_images()
    errs = synthetic.pose_errors(rec, sc)
    assert errs["ate"] < 0.05, errs
    assert errs["rot_err_deg_mean"] < 0.2, errs


def test_snapshots(tmp_path):
    """snapshot_images_freq writes periodic model dumps (ref
    WriteSnapshot, incremental_mapper_controller.cc:730-736)."""
    import os
    from dagsfm_tpu.scene import io as scene_io
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)
    spec = synthetic.SyntheticSceneSpec(num_cameras=8, num_points=200,
                                        pixel_noise=0.3, seed=4)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc, seed=1)
    m = IncrementalMapper(cams, images, graph, MapperOptions(
        init_min_num_inliers=30, num_ransac_hypotheses=128, seed=3,
        snapshot_path=str(tmp_path), snapshot_images_freq=2))
    rec = m.reconstruct()
    snaps = sorted(d for d in os.listdir(tmp_path)
                   if d.startswith("snapshot_"))
    assert len(snaps) >= 2
    rec2 = scene_io.read_model_bin(str(tmp_path / snaps[-1]))
    assert rec2.num_reg_images() >= 4


class TestTriangulatorOps:
    """Merge/Complete/Retriangulate (ref incremental_triangulator.h:43-90)
    + transitive correspondence search (ref correspondence_graph.h:46-158)."""

    def _mapped_scene(self, seed=0):
        from dagsfm_tpu.scene import synthetic
        from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                       MapperOptions)
        spec = synthetic.SyntheticSceneSpec(
            num_cameras=8, num_points=300, pixel_noise=0.3, seed=seed)
        sc = synthetic.generate(spec)
        cameras, images, graph = synthetic.to_matching_problem(sc)
        mapper = IncrementalMapper(cameras, images, graph,
                                   MapperOptions(seed=seed))
        return mapper, sc

    def test_transitive_correspondences(self):
        from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
        g = CorrespondenceGraph()
        for i in (1, 2, 3):
            g.add_image(i, 4)
        # chain: (1,0)-(2,1)-(3,2); plus direct (1,3)-(3,3)
        g.add_matches(1, 2, np.array([[0, 1]], np.uint32))
        g.add_matches(2, 3, np.array([[1, 2]], np.uint32))
        g.add_matches(1, 3, np.array([[3, 3]], np.uint32))
        one = g.correspondences_of(1, 0)
        assert one.tolist() == [[2, 1]]
        two = g.find_transitive_correspondences(1, 0, transitivity=2)
        assert sorted(two.tolist()) == [[2, 1], [3, 2]]
        # depth 1 == correspondences_of
        d1 = g.find_transitive_correspondences(1, 0, transitivity=1)
        assert d1.tolist() == [[2, 1]]

    def test_merge_tracks_fuses_duplicates(self):
        mapper, sc = self._mapped_scene(seed=2)
        mapper.reconstruct()
        rec = mapper.rec
        assert rec.num_reg_images() >= 6
        # manufacture a duplicate: split one long track into two points
        pid = max(rec.points3D, key=lambda p: len(rec.points3D[p].track))
        pt = rec.points3D[pid]
        assert len(pt.track) >= 4
        track = list(pt.track)
        half = len(track) // 2
        xyz = pt.xyz.copy()
        rec.delete_point3D(pid)
        a = rec.add_point3D(xyz + 1e-4, track[:half])
        b = rec.add_point3D(xyz - 1e-4, track[half:])
        n_before = rec.num_points3D()
        merged = mapper.merge_tracks({a, b})
        assert merged >= 1
        assert rec.num_points3D() == n_before - merged
        # the fused point carries the whole track
        fused = [p for p in rec.points3D
                 if set(rec.points3D[p].track) >= set(track)]
        assert fused, "split track was not fused back"

    def test_complete_tracks_extends(self):
        mapper, sc = self._mapped_scene(seed=3)
        mapper.reconstruct()
        rec = mapper.rec
        # drop one observation from a long track; complete must restore it
        pid = max(rec.points3D, key=lambda p: len(rec.points3D[p].track))
        i, kp = rec.points3D[pid].track[-1]
        rec.delete_observation(pid, i, kp)
        assert (i, kp) not in rec.points3D[pid].track
        added = mapper.complete_tracks([pid])
        assert added >= 1
        assert (i, kp) in [(int(a), int(b))
                           for (a, b) in rec.points3D[pid].track]

    def test_retriangulate_recovers_points(self):
        mapper, sc = self._mapped_scene(seed=4)
        mapper.reconstruct()
        rec = mapper.rec
        # delete 90% of the points -> pairs drop under retri_min_ratio
        pids = [p for k, p in enumerate(sorted(rec.points3D)) if k % 10]
        for p in pids:
            rec.delete_point3D(p)
        n_before = rec.num_points3D()
        mapper._retri_trials = {}
        created = mapper.retriangulate()
        assert created > 0
        assert rec.num_points3D() == n_before + created


def test_reconstruct_recovers_unknown_focal():
    """A camera WITHOUT a focal prior (wrong 10% initial guess) is
    recovered by the focal-grid registration + BA intrinsics refinement
    (ref estimators/pose.cc:79 focal grid; BA refine defaults
    incremental_mapper_controller.h:100-110)."""
    import dataclasses

    from dagsfm_tpu.scene import cameras as cm

    spec = synthetic.SyntheticSceneSpec(
        num_cameras=12, num_points=300, pixel_noise=0.2, seed=9)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc)
    f_gt = sc.camera.params[0]
    wrong = cams[1]._replace(
        params=(f_gt * 1.10,) + tuple(cams[1].params[1:]),
        prior_focal=False)
    cams = {1: wrong}
    opts = MapperOptions(init_min_num_inliers=30,
                         num_ransac_hypotheses=256, seed=1)
    mapper = IncrementalMapper(cams, images, graph, opts)
    rec = mapper.reconstruct()
    assert rec.num_reg_images() >= 11, rec.num_reg_images()
    f_rec = rec.cameras[1].params[0]
    assert abs(f_rec - f_gt) / f_gt < 0.02, (f_rec, f_gt)
    errs = synthetic.pose_errors(rec, sc)
    assert errs["ate"] < 0.05, errs


def test_init_pair_retry_escapes_isolated_pair():
    """A poisoned BEST init pair (two images matching only each other)
    bootstraps but can never grow; the mapper must tear it down and
    retry with the next init pair (ref init_num_trials retry loop) and
    still deliver the full reconstruction."""
    import numpy as np
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.scene.reconstruction import ImageRecord
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    spec = synthetic.SyntheticSceneSpec(
        num_cameras=10, num_points=400, pixel_noise=0.4, seed=7)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc)
    # inject two decoy images with MORE mutual matches than any real
    # pair, consistent two-view geometry (translation with varying
    # disparity), and zero connection to the rest of the scene
    rng = np.random.default_rng(0)
    n_fake = 400
    f = cams[1].focal()
    cx, cy = cams[1].params[1], cams[1].params[2]
    xy1 = rng.uniform([cx - 200, cy - 150], [cx + 200, cy + 150],
                      (n_fake, 2))
    disp = rng.uniform(30.0, 90.0, n_fake)
    xy2 = xy1 + np.stack([disp, np.zeros(n_fake)], axis=1)
    a, b = 101, 102
    for iid, xys in ((a, xy1), (b, xy2)):
        images[iid] = ImageRecord(
            image_id=iid, name=f"decoy{iid}", camera_id=1,
            qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
            xys=xys, point3D_ids=np.full(n_fake, -1, np.int64))
        graph.add_image(iid, n_fake)
    graph.add_matches(a, b, np.stack([np.arange(n_fake)] * 2, axis=1))
    # decoy pair has the most matches -> tried first
    real_max = max(len(m) for (i, j), m in graph.pair_matches.items()
                   if (i, j) != (a, b))
    assert n_fake > real_max, (n_fake, real_max)

    mapper = IncrementalMapper(cams, images, graph, MapperOptions(seed=0))
    rec = mapper.reconstruct()
    err = synthetic.pose_errors(rec, sc)
    # the REAL scene got reconstructed despite the decoy init pair
    assert err["num_reg"] == 10, err
    assert err["ate"] < 0.01, err
    assert not rec.images[a].registered and not rec.images[b].registered
