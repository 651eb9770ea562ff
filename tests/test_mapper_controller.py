"""Multi-model controller + init relaxation (ref
incremental_mapper_controller.cc:473-523) + ReconstructionManager."""
import numpy as np
import pytest

from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.scene.reconstruction_manager import ReconstructionManager
from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
from dagsfm_tpu.sfm.incremental_mapper import MapperOptions
from dagsfm_tpu.sfm.mapper_controller import (ControllerOptions,
                                              MapperController)


def _scene(seed=0, num_cameras=8, num_points=250):
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=num_cameras, num_points=num_points, pixel_noise=0.3,
        seed=seed)
    sc = synthetic.generate(spec)
    return sc, synthetic.to_matching_problem(sc)


class TestMapperController:
    def test_single_component_single_model(self):
        sc, (cams, images, graph) = _scene(seed=1)
        ctrl = MapperController(cams, images, graph)
        mgr = ctrl.run()
        assert len(mgr) == 1
        err = synthetic.pose_errors(mgr.get(0), sc)
        assert err["num_reg"] == 8 and err["ate"] < 0.05

    def test_disconnected_components_two_models(self):
        # two independent scenes whose image ids do not overlap and whose
        # match graphs are disjoint -> two models
        sc1, (cams1, images1, graph1) = _scene(seed=2, num_cameras=6)
        sc2, (cams2, images2, graph2) = _scene(seed=3, num_cameras=6)
        images = dict(images1)
        graph = CorrespondenceGraph()
        for i, im in images1.items():
            graph.add_image(i, len(im.xys))
        off = 100
        for i, im in images2.items():
            import dataclasses
            im2 = dataclasses.replace(im, image_id=i + off)
            images[i + off] = im2
            graph.add_image(i + off, len(im.xys))
        for (i, j), m in graph1.pair_matches.items():
            graph.add_matches(i, j, m)
        for (i, j), m in graph2.pair_matches.items():
            graph.add_matches(i + off, j + off, m)
        ctrl = MapperController(cams1, images, graph,
                                ControllerOptions(min_model_size=3))
        mgr = ctrl.run()
        assert len(mgr) == 2, len(mgr)
        sizes = sorted(r.num_reg_images() for r in mgr)
        assert sizes == [6, 6], sizes

    def test_poisoned_init_pair_retries_relaxed(self):
        # strict thresholds nothing can pass -> relaxation must save it
        sc, (cams, images, graph) = _scene(seed=4)
        opts = ControllerOptions(
            mapper=MapperOptions(init_min_num_inliers=100000,
                                 init_min_tri_angle_deg=89.0),
            init_num_trials=16)
        ctrl = MapperController(cams, images, graph, opts)
        mgr = ctrl.run()
        assert len(mgr) >= 1
        assert mgr.get(0).num_reg_images() >= 6

    def test_manager_write_read_layout(self, tmp_path):
        sc, (cams, images, graph) = _scene(seed=5, num_cameras=6)
        ctrl = MapperController(cams, images, graph)
        mgr = ctrl.run()
        out = str(tmp_path / "sparse")
        mgr.write(out)
        import os
        assert os.path.isdir(os.path.join(out, "0"))
        back = ReconstructionManager.read(out)
        assert len(back) == len(mgr)
        assert back.get(0).num_reg_images() == mgr.get(0).num_reg_images()
        assert back.largest().num_points3D() == mgr.largest().num_points3D()
