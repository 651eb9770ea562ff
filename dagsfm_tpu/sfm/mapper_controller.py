"""Multi-model incremental mapper controller.

TPU-native counterpart of the reference's
IncrementalMapperController::Run/Reconstruct trials-and-relaxation loop
(/root/reference/src/controllers/incremental_mapper_controller.cc:473-523
and :713-724):

  * initialization TRIALS: if no image pair passes the strict
    init thresholds, retry with progressively relaxed
    init_min_num_inliers / init_min_tri_angle (ref relaxes both by 2x
    per trial) — a poisoned best pair cannot kill the whole cluster;
  * MULTIPLE models: images registered by one model are excluded from
    subsequent models, so disconnected components each get their own
    reconstruction (ref kMaxNumModels loop);
  * model DISCARDING: models smaller than min_model_size are dropped
    (ref discards and blacklists their init pairs).

Returns a ReconstructionManager (models ordered by construction; the
`mapper` CLI writes them under 0/, 1/, ...).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from dagsfm_tpu.scene.reconstruction_manager import ReconstructionManager
from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
from dagsfm_tpu.sfm.incremental_mapper import IncrementalMapper, MapperOptions


@dataclasses.dataclass
class ControllerOptions:
    """Mirrors ref incremental_mapper_controller.h:100-125 knobs."""
    mapper: MapperOptions = dataclasses.field(default_factory=MapperOptions)
    # multi-model control (ref: multiple_models / max_num_models /
    # min_model_size / max_model_overlap)
    multiple_models: bool = True
    max_num_models: int = 50
    min_model_size: int = 3
    # init relaxation (ref init_num_trials=2 with 2x relaxation each)
    init_num_trials: int = 3


class MapperController:
    def __init__(self, cameras: dict, images: dict,
                 graph: CorrespondenceGraph,
                 options: ControllerOptions | None = None):
        self.cameras = cameras
        self.images = images
        self.graph = graph
        self.opts = options or ControllerOptions()

    def _filtered_inputs(self, used: set):
        """Images/graph with already-reconstructed images removed."""
        if not used:
            return self.images, self.graph
        images = {i: im for i, im in self.images.items() if i not in used}
        graph = CorrespondenceGraph()
        for i, im in images.items():
            graph.add_image(i, self.graph.num_keypoints.get(
                i, len(im.xys)))
        for (i, j), m in self.graph.pair_matches.items():
            if i in images and j in images and len(m):
                graph.add_matches(i, j, m)
        return images, graph

    def _relaxed_options(self, trial: int) -> MapperOptions:
        """Trial 0 = strict; each further trial halves the init gates
        (ref incremental_mapper_controller.cc:473-523 relaxation)."""
        o = dataclasses.replace(self.opts.mapper)
        o.init_min_num_inliers = max(
            6, o.init_min_num_inliers // (2 ** trial))
        o.init_min_tri_angle_deg = max(
            0.5, o.init_min_tri_angle_deg / (2 ** trial))
        return o

    def run(self, callback=None) -> ReconstructionManager:
        mgr = ReconstructionManager()
        used: set = set()
        for _model in range(self.opts.max_num_models
                            if self.opts.multiple_models else 1):
            images, graph = self._filtered_inputs(used)
            if len(images) < 2 or not graph.pair_matches:
                break
            rec = None
            for trial in range(self.opts.init_num_trials):
                opts = self._relaxed_options(trial)
                opts.seed = self.opts.mapper.seed + trial
                mapper = IncrementalMapper(self.cameras, images, graph,
                                           opts)
                cand = mapper.reconstruct(callback=callback)
                if cand.num_reg_images() >= max(2, self.opts.min_model_size):
                    rec = cand
                    break
            if rec is None:
                break  # even relaxed init failed on the remaining images
            used.update(rec.reg_image_ids)
            mgr.add(rec)
            if not self.opts.multiple_models:
                break
        return mgr
