"""Scale accuracy evidence: a 100-image rendered scene through the FULL
distributed pipeline — SIFT -> sequential matching with vocab loop
closure -> two-view verification -> view graph + rotation averaging ->
clustering -> per-cluster incremental SfM -> Sim(3) merge ->
retriangulation -> final BA (ref comparables:
distributed_mapper_controller.cpp:215-225,919-925).

This is the first pixels-driven exercise of the clustering/merge path at
the scale it exists to serve (round-2 gap: all pixel evidence was 12
cameras). ~10-15 min on a small CPU box -> marked slow.
"""
import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import synthetic


@pytest.mark.slow
def test_100_image_pixels_to_model():
    from dagsfm_tpu.clustering.image_clustering import ClusteringOptions
    from dagsfm_tpu.features import sift
    from dagsfm_tpu.pipeline.distributed_mapper import (
        DistributedMapperController, DistributedMapperOptions)
    from dagsfm_tpu.pipeline.feature_pipeline import (
        FeaturePipeline, FeaturePipelineOptions)
    from dagsfm_tpu.sfm.incremental_mapper import MapperOptions

    n = 100
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=60, image_width=256, image_height=192,
        focal=280.0, seed=12, ring_radius=10.0, point_cloud_extent=4.0,
        ring_height_jitter=0.2)
    sc = synthetic.generate(spec)
    images = synthetic.render_images(sc)
    cams = {i: cm.make_simple_camera(i, spec.image_width,
                                     spec.image_height, focal=spec.focal)
            for i in images}

    # sequence order = ring order: 3.6 deg steps; the overlap window
    # covers up to ~22 deg baselines and vocab loop closure stitches the
    # ring seam (sequence-distant, spatially adjacent)
    # essential-only verification: all cameras carry focal priors here
    # and the CPU test box pays ~1s/pair for the full E+F+H stack
    opts = FeaturePipelineOptions(
        pair_mode="sequential", sequential_overlap=4,
        loop_detection_period=10, loop_detection_num_images=6,
        num_ransac_hypotheses=128, two_view_essential_only=True,
        batch_size=4)
    opts.sift = sift.SiftOptions(max_num_features=512,
                                 candidates_per_octave=512, num_octaves=3)
    fp = FeaturePipeline(images, cams, opts)
    fp.extract_features()
    fp.match_and_verify()
    assert len(fp.two_view) > 300, len(fp.two_view)
    # the ring seam got loop edges
    seam = [(i, j) for (i, j) in fp.two_view
            if j - i > 80]
    assert seam, "loop closure missed the ring seam"

    cams2, imgs2, graph = fp.to_mapper_inputs()
    dm_opts = DistributedMapperOptions(
        clustering=ClusteringOptions(num_images_ub=30, image_overlap=10,
                                     completeness_ratio=0.5),
        mapper=MapperOptions(seed=0, init_min_tri_angle_deg=2.0))
    # pose edges come from the matching stage's winning models (ref
    # LoadTwoviewGeometries :585) — re-estimating 400+ pairs here would
    # double the verification cost for nothing
    ctrl = DistributedMapperController(
        cams2, imgs2, graph, dm_opts,
        two_view_geometries=fp.two_view_edges())
    merged = ctrl.run()
    err = synthetic.pose_errors(merged, sc)
    sep_rmse = ctrl.separator_rmse(merged)
    print("scale e2e:", err, "separator_rmse_px:", sep_rmse,
          "timings:", {k: round(v, 1) for k, v in ctrl.timings.items()})
    # >=90% registration, ATE under 1% of the ring radius
    assert err["num_reg"] >= 90, err
    assert err["ate"] < 0.1, err
    assert sep_rmse < 2.0, sep_rmse
