"""Pixels->model closed loop: rendered images -> SIFT -> matching ->
E/F/H verification -> incremental mapping -> pose accuracy vs ground
truth. This is the end-to-end regression the reference lacks entirely
(SURVEY.md §4: no golden-scene tests in-repo)."""
import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import synthetic


@pytest.mark.slow
def test_pixels_to_model_accuracy():
    from dagsfm_tpu.features import sift
    from dagsfm_tpu.pipeline.feature_pipeline import (
        FeaturePipeline, FeaturePipelineOptions)
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    spec = synthetic.SyntheticSceneSpec(
        num_cameras=12, num_points=50, image_width=448, image_height=336,
        focal=480.0, seed=4, ring_radius=9.0, point_cloud_extent=3.5,
        ring_height_jitter=0.3)
    sc = synthetic.generate(spec)
    images = synthetic.render_images(sc)
    cams = {i: cm.make_simple_camera(i, spec.image_width,
                                     spec.image_height, focal=spec.focal)
            for i in images}
    # guided matching (ref sift.h:116-166) recovers the ratio-test-killed
    # matches that make keypoints consistent across 3+ views — the 2D-3D
    # correspondence supply incremental registration depends on (without
    # it this synthetic texture yields only ~17 3-view-consistent matches
    # per image, starving registration at ring image 7 of 12)
    opts = FeaturePipelineOptions(batch_size=4, guided_matching=True)
    opts.sift = sift.SiftOptions(max_num_features=1024,
                                 candidates_per_octave=512, num_octaves=3)
    fp = FeaturePipeline(images, cams, opts)
    fp.extract_features()
    # healthy keypoint yield per image (upsampled base octave)
    assert all(int(fp.masks[i].sum()) > 500 for i in images)
    fp.match_and_verify()
    # ring neighbors must verify with strong inlier support
    assert len(fp.two_view) >= 12
    assert max(v.num_inliers for v in fp.two_view.values()) > 100

    cams2, imgs2, graph = fp.to_mapper_inputs()
    mapper = IncrementalMapper(cams2, imgs2, graph, MapperOptions(seed=0))
    rec = mapper.reconstruct()
    err = synthetic.pose_errors(rec, sc)
    # every camera registered; accuracy well under 1% of scene scale
    assert err["num_reg"] == 12, err
    assert err["ate"] < 0.1, err
    assert err["rot_err_deg_mean"] < 1.0, err


def test_render_images_consistency():
    """Rendered pixels are multi-view consistent: the same 3D surface
    point (ray-sphere intersection) has the same texture value."""
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=4, num_points=10, image_width=96, image_height=96,
        focal=120.0, seed=1)
    sc = synthetic.generate(spec)
    images = synthetic.render_images(sc, seed=3)
    assert len(images) == 4
    for img in images.values():
        assert img.shape == (96, 96)
        assert img.min() >= 0.0 and img.max() <= 1.0
        # sphere occupies part of the frame: both texture and background
        assert img.std() > 0.05
