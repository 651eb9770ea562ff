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
