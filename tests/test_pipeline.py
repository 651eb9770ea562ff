"""End-to-end distributed pipeline test: the full DAGSfM flow on a
clustered synthetic scene (matches -> view graph -> RA -> clustering ->
per-cluster SfM -> merge -> final BA)."""
import numpy as np
import pytest

from dagsfm_tpu.clustering.image_clustering import ClusteringOptions
from dagsfm_tpu.pipeline.distributed_mapper import (
    DistributedMapperController, DistributedMapperOptions)
from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.sfm.incremental_mapper import MapperOptions


@pytest.fixture(scope="module")
def scene_and_problem():
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=24, num_points=600, pixel_noise=0.3, seed=17)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(
        sc, match_outlier_fraction=0.05, seed=2)
    return sc, cams, images, graph


def _options():
    return DistributedMapperOptions(
        clustering=ClusteringOptions(num_images_ub=10, image_overlap=6,
                                     completeness_ratio=0.5),
        mapper=MapperOptions(init_min_num_inliers=30,
                             num_ransac_hypotheses=256, seed=11),
        final_ba_iterations=25,
        seed=5,
    )


def test_full_distributed_pipeline(scene_and_problem):
    sc, cams, images, graph = scene_and_problem
    ctrl = DistributedMapperController(cams, images, graph, _options())
    merged = ctrl.run()

    # view graph built and filtered
    assert ctrl.view_graph.num_edges() > 20
    # clustering produced multiple clusters with overlap
    assert len(ctrl.clusters) >= 2
    # every cluster was reconstructed and merged
    assert len(ctrl.local_recons) >= 2
    assert merged.num_reg_images() >= 22, merged.num_reg_images()
    assert len(ctrl.separators) >= 2

    errs = synthetic.pose_errors(merged, sc)
    assert errs["ate"] < 0.05, errs
    assert errs["rot_err_deg_mean"] < 0.3, errs
    rmse = ctrl.separator_rmse(merged)
    assert rmse < 2.0, rmse
    assert "total" in ctrl.timings
    assert ctrl.report().startswith("Timings:")


@pytest.mark.slow
def test_pipeline_distributed_final_ba(scene_and_problem):
    sc, cams, images, graph = scene_and_problem
    opts = _options()
    opts.distributed_final_ba = True
    opts.num_devices = 8
    ctrl = DistributedMapperController(cams, images, graph, opts)
    merged = ctrl.run()
    assert merged.num_reg_images() >= 22
    errs = synthetic.pose_errors(merged, sc)
    assert errs["ate"] < 0.05, errs
