"""Auxiliary subsystem tests: undistortion, observability, options,
pipeline checkpoint/resume."""
import os

import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import synthetic, undistortion
from dagsfm_tpu.utils import observability as obs
from dagsfm_tpu.utils import options as optmod


class TestUndistortion:
    def test_pinhole_passthrough_keypoints(self):
        spec = synthetic.SyntheticSceneSpec(num_cameras=4, num_points=50)
        rec = synthetic.to_reconstruction(synthetic.generate(spec))
        out = undistortion.undistort_reconstruction(rec)
        # SIMPLE_PINHOLE input: keypoints unchanged
        i = next(iter(rec.images))
        np.testing.assert_allclose(out.images[i].xys, rec.images[i].xys)
        assert out.cameras[1].model_id == cm.PINHOLE

    def test_radial_keypoints_mapped(self):
        cam = cm.Camera(1, cm.SIMPLE_RADIAL, 200, 200,
                        (100.0, 100.0, 100.0, -0.2))
        ncam = undistortion.undistorted_camera(cam)
        assert ncam.model_id == cm.PINHOLE
        # distorted center maps to center
        import jax.numpy as jnp
        params = cm.pad_params(jnp.asarray(cam.params), cam.model_id)
        uv = cm.cam_from_img(cam.model_id, params,
                             jnp.asarray([[100.0, 100.0]]))
        np.testing.assert_allclose(np.asarray(uv), [[0.0, 0.0]], atol=1e-9)

    def test_undistort_image_identity_for_pinhole(self):
        rng = np.random.default_rng(0)
        img = rng.random((64, 64)).astype(np.float32)
        cam = cm.make_simple_camera(1, 64, 64, focal=80.0)
        out = undistortion.undistort_image(img, cam)
        # pinhole -> identity warp (up to interpolation at edges)
        np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2],
                                   atol=1e-4)

    def test_undistort_image_radial(self):
        rng = np.random.default_rng(1)
        img = np.zeros((100, 100), np.float32)
        img[40:60, 40:60] = 1.0
        cam = cm.Camera(1, cm.SIMPLE_RADIAL, 100, 100,
                        (80.0, 50.0, 50.0, -0.3))
        out = undistortion.undistort_image(img, cam)
        assert out.shape == (100, 100)
        assert np.isfinite(out).all()
        assert out.max() > 0.5  # content preserved


class TestObservability:
    def test_stage_timer(self):
        t = obs.StageTimer()
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        with t.stage("a"):
            pass
        assert set(t.records) == {"a", "b"}
        assert t.report().startswith("Elapsed")
        import json
        assert set(json.loads(t.as_json())) == {"a", "b"}

    def test_progress_monitor(self):
        m = obs.ProgressMonitor()
        m.start(0, 10)
        m.start(1, 20)
        m.update(0, 5)
        assert not m.all_completed()
        m.complete(0)
        m.complete(1)
        assert m.all_completed()
        r = m.render()
        assert "5/10" in r and "done" in r


class TestOptions:
    def test_project_roundtrip(self, tmp_path):
        opts = optmod.ProjectOptions()
        opts.image_path = "/data/images"
        opts.clustering.num_images_ub = 42
        opts.mapper.abs_pose_max_error_px = 6.5
        path = str(tmp_path / "project.ini")
        optmod.save_project(opts, path)
        loaded = optmod.load_project(path)
        assert loaded.image_path == "/data/images"
        assert loaded.clustering.num_images_ub == 42
        assert abs(loaded.mapper.abs_pose_max_error_px - 6.5) < 1e-12

    def test_quality_presets(self):
        opts = optmod.ProjectOptions()
        optmod.apply_quality_preset(opts, "low")
        assert opts.mapper.num_ransac_hypotheses == 128
        optmod.apply_quality_preset(opts, "extreme")
        assert opts.mapper.num_ransac_hypotheses == 1024


class TestCheckpointResume:
    def test_export_load_partitions(self, tmp_path):
        from dagsfm_tpu.pipeline.distributed_mapper import (
            DistributedMapperController, DistributedMapperOptions)
        spec = synthetic.SyntheticSceneSpec(num_cameras=8, num_points=150)
        sc = synthetic.generate(spec)
        recs = [synthetic.to_reconstruction(sc)]
        ctrl = DistributedMapperController({}, {}, None,
                                           DistributedMapperOptions())
        ctrl.local_recons = recs
        path = str(tmp_path)
        ctrl.export_partitions(path)
        assert ctrl.partitions_exist(path)
        ctrl2 = DistributedMapperController({}, {}, None,
                                            DistributedMapperOptions())
        loaded = ctrl2.load_partitions(path)
        assert len(loaded) == 1
        assert loaded[0].num_points3D() == recs[0].num_points3D()


def test_image_graph_svg(tmp_path):
    """Adjacency-matrix SVG output (ref ImageGraph::OutputSVG,
    image_graph.cpp:70-118)."""
    from dagsfm_tpu.graph.svg import write_adjacency_svg

    edges = {(1, 2): 100.0, (2, 3): 50.0, (1, 3): 10.0}
    path = str(tmp_path / "graph.svg")
    write_adjacency_svg([1, 2, 3], edges, path)
    svg = open(path).read()
    assert svg.startswith("<svg")
    assert svg.count("<rect") >= 2 * len(edges) + 3  # cells + legend
    assert "</svg>" in svg


def test_view_graph_svg(tmp_path):
    import numpy as np
    from dagsfm_tpu.graph.svg import write_view_graph_svg
    from dagsfm_tpu.graph.view_graph import TwoViewEdge, ViewGraph

    vg = ViewGraph()
    R = np.eye(3)
    vg.add_edge(TwoViewEdge(1, 2, R, np.zeros(3), 80, 1.0))
    vg.add_edge(TwoViewEdge(2, 3, R, np.zeros(3), 40, 1.0))
    path = str(tmp_path / "vg.svg")
    write_view_graph_svg(vg, path)
    assert "<svg" in open(path).read()
