"""DistributedMapperController: the full graph-partitioned SfM pipeline.

TPU-native counterpart of /root/reference/src/controllers/
distributed_mapper_controller.{h,cpp} (Run :98-227):

    verified matches -> view graph (batched two-view RANSAC)
    -> triplet rotation-cycle filter (5 deg) + largest CC      (:153)
    -> global rotation averaging + orientation filter           (:945-1005)
    -> cut-and-expand clustering                                (:633)
    -> per-cluster incremental mapping                          (:659-740)
    -> MST Sim(3) merge (SfMAligner)                            (:742-821)
    -> separator retriangulation                                (:823-834)
    -> final global BA with track selection                     (:836-933)

The reference fans clusters out over rpclib workers; here sequential mode
runs clusters in-process (the per-cluster compute is already batched
device work) and the final BA can run sharded over the device mesh
(parallel/ba_sharded.py) — the map-reduce roles are filled by SPMD
sharding rather than RPC (SURVEY.md §2.2 P1/P2).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from dagsfm_tpu.clustering.image_clustering import (ClusteringOptions,
                                                    ImageClustering)
from dagsfm_tpu.estimation import rotation_averaging as ra
from dagsfm_tpu.graph.view_graph import TwoViewEdge, ViewGraph
from dagsfm_tpu.ops import epipolar as epi
from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene.reconstruction import Reconstruction
from dagsfm_tpu.sfm import bundle_adjustment as ba
from dagsfm_tpu.sfm.aligner import AlignerOptions, SfMAligner
from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                               MapperOptions, _bucket,
                                               _pad_to, _ransac_essential)
from dagsfm_tpu.sfm.track_selection import (TrackSelectionOptions,
                                            select_tracks)


@dataclasses.dataclass
class DistributedMapperOptions:
    clustering: ClusteringOptions = dataclasses.field(
        default_factory=ClusteringOptions)
    mapper: MapperOptions = dataclasses.field(default_factory=MapperOptions)
    ra_options: ra.RAOptions = dataclasses.field(default_factory=ra.RAOptions)
    track_selection: TrackSelectionOptions = dataclasses.field(
        default_factory=TrackSelectionOptions)
    aligner: AlignerOptions = dataclasses.field(default_factory=AlignerOptions)
    min_num_matches: int = 16              # ref --min_num_matches
    rotation_filter_max_deg: float = 5.0   # ref :153 and :996
    select_tracks_for_bundle_adjustment: bool = True  # ref h:96
    final_ba: bool = True                  # ref --final_ba
    retriangulate: bool = False            # ref --retriangulate
    final_ba_iterations: int = 50          # ref :522-542 (50 iters)
    distributed_final_ba: bool = False     # shard final BA over the mesh
    num_devices: int | None = None
    seed: int = 0


class DistributedMapperController:
    """Runs the whole pipeline on (cameras, images, verified match graph)."""

    def __init__(self, cameras: dict, images: dict,
                 graph: CorrespondenceGraph,
                 options: DistributedMapperOptions | None = None,
                 two_view_geometries: dict | None = None):
        self.cameras = cameras
        self.images = images
        self.graph = graph
        # optional precomputed relative poses from the matching stage:
        # {(i, j): (R, t, num_inliers, config)} — mirrors the reference's
        # LoadTwoviewGeometries short-circuit (:585)
        self.two_view_geometries = two_view_geometries
        self.opts = options or DistributedMapperOptions()
        self.view_graph = ViewGraph()
        self.global_rotations: dict = {}
        self.clusters = []
        self.local_recons: list = []
        self.separators: list = []
        self.timings: dict = {}
        self._key = jax.random.PRNGKey(self.opts.seed)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -------------------------------------------------- 1. view graph
    def build_view_graph(self) -> ViewGraph:
        """Two-view RANSAC per pair -> relative pose edges.

        Mirrors LoadTwoviewGeometries (:585) when geometry already exists;
        here we estimate it from the verified matches with the batched
        essential RANSAC (the reference estimated it during matching).
        """
        t0 = time.time()
        if self.two_view_geometries is not None:
            # matching stage already classified E/F/H and recovered poses
            # (ref LoadTwoviewGeometries :585 — pose edges come from the
            # winning model, not re-estimated)
            from dagsfm_tpu.ops import two_view_classify as tvc
            for (i, j), rec in self.two_view_geometries.items():
                R, t, ninl, config = rec
                if R is None or ninl < self.opts.min_num_matches:
                    continue
                if config in (tvc.DEGENERATE, tvc.WATERMARK):
                    continue
                self.view_graph.add_edge(TwoViewEdge(i, j, np.asarray(R),
                                                     np.asarray(t), ninl))
            self.timings["view_graph"] = time.time() - t0
            return self.view_graph

        # estimate from the match graph with full E/F/H model selection
        # (ref two_view_geometry.cc:113): calibrated pairs (focal priors)
        # go through E, unknown-focal pairs through F (+ prior-K pose
        # upgrade), planar/panoramic through H pose recovery; watermark
        # pairs are rejected.
        from dagsfm_tpu.ops import two_view_classify as tvc
        cam_of = {i: self.cameras[im.camera_id]
                  for i, im in self.images.items()}
        pair_data = []
        for (i, j) in self.graph.image_pairs():
            m = self.graph.matches_between(i, j)
            if len(m) < self.opts.min_num_matches:
                continue
            ci, cj = cam_of[i], cam_of[j]
            pair_data.append((
                (i, j), self.images[i].xys[m[:, 0]],
                self.images[j].xys[m[:, 1]],
                ci.calibration_matrix(), cj.calibration_matrix(),
                (ci.width, ci.height), (cj.width, cj.height),
                getattr(ci, "prior_focal", True)
                and getattr(cj, "prior_focal", True)))
        tv_opts = tvc.TwoViewOptions(
            min_num_inliers=self.opts.min_num_matches,
            max_error_px=self.opts.mapper.abs_pose_max_error_px / 3.0,
            num_hypotheses=self.opts.mapper.num_ransac_hypotheses)
        results = tvc.classify_pairs(pair_data, tv_opts,
                                     seed=self.opts.seed)
        for (i, j), res in results.items():
            if res.R is None or res.num_inliers < self.opts.min_num_matches:
                continue
            if res.config in (tvc.DEGENERATE, tvc.WATERMARK):
                continue
            self.view_graph.add_edge(
                TwoViewEdge(i, j, res.R, res.t, res.num_inliers))
        self.timings["view_graph"] = time.time() - t0
        return self.view_graph

    # -------------------------------------- 2. filters + rotation averaging
    def filter_and_average_rotations(self):
        t0 = time.time()
        self.view_graph.filter_cycles_by_rotation(
            self.opts.rotation_filter_max_deg)
        cc = self.view_graph.largest_connected_component()
        self.view_graph = self.view_graph.subgraph(cc)

        ids = sorted(self.view_graph.nodes)
        index = {v: k for k, v in enumerate(ids)}
        edges = np.array([(index[i], index[j])
                          for (i, j) in self.view_graph.edges], np.int32)
        rels = np.stack([e.rotation
                         for e in self.view_graph.edges.values()])
        R_glob = ra.estimate_rotations(len(ids), edges, rels,
                                       self.opts.ra_options)
        keep = ra.filter_pairs_from_orientation(
            edges, rels, R_glob, self.opts.rotation_filter_max_deg)
        kept_edges = {k: e for (k, e), ok in
                      zip(self.view_graph.edges.items(), keep) if ok}
        self.view_graph.edges = kept_edges
        cc = self.view_graph.largest_connected_component()
        self.view_graph = self.view_graph.subgraph(cc)
        self.global_rotations = {v: R_glob[index[v]] for v in cc}
        self.timings["rotation_averaging"] = time.time() - t0

    # ------------------------------------------------ 3. clustering
    def cluster_scenes(self):
        t0 = time.time()
        nodes = sorted(self.view_graph.nodes)
        edges = {k: e.num_inliers for k, e in self.view_graph.edges.items()}
        ic = ImageClustering(nodes, edges, self.opts.clustering)
        ic.cut()
        self.clusters = ic.expand()
        self.clustering_summary = ic.summary
        self.timings["clustering"] = time.time() - t0
        return self.clusters

    # ------------------------------------- 4. per-cluster reconstruction
    def _reconstruct_one_cluster(self, cluster):
        sub_graph = CorrespondenceGraph()
        idset = set(cluster.image_ids)
        for i in cluster.image_ids:
            sub_graph.add_image(i, self.graph.num_keypoints[i])
        for (i, j), m in self.graph.pair_matches.items():
            if i in idset and j in idset:
                sub_graph.add_matches(i, j, m)
        sub_images = {i: self.images[i] for i in cluster.image_ids}
        mapper = IncrementalMapper(self.cameras, sub_images, sub_graph,
                                   self.opts.mapper)
        rec = mapper.reconstruct()
        for im in rec.images.values():
            im.cluster_id = cluster.cluster_id
        return rec

    def reconstruct_partitions(self, num_threads: int = 1):
        """Per-cluster incremental SfM, biggest cluster first (size-sorted
        job queue parity, ref :675-679). num_threads > 1 overlaps host
        bookkeeping with device dispatch across clusters (OpenMP
        `parallel for` parity, ref :704)."""
        t0 = time.time()
        order = sorted(range(len(self.clusters)),
                       key=lambda c: -len(self.clusters[c].image_ids))
        jobs = [self.clusters[c] for c in order]
        if num_threads > 1:
            from dagsfm_tpu.parallel.distributed import \
                run_clusters_threaded
            recs = run_clusters_threaded(
                jobs, self._reconstruct_one_cluster,
                max_workers=num_threads)
        else:
            recs = [self._reconstruct_one_cluster(c) for c in jobs]
        self.local_recons = [r for r in recs if r.num_reg_images() >= 2]
        self.timings["reconstruction"] = time.time() - t0
        return self.local_recons

    # ------------------------------------------------ 5. merge
    def merge_clusters(self) -> Reconstruction:
        t0 = time.time()
        aligner = SfMAligner(self.local_recons, self.opts.aligner)
        merged = aligner.align()
        self.separators = aligner.separator_image_ids(merged)
        self.timings["merge"] = time.time() - t0
        return merged

    # ---------------------------------------- 6. retriangulate + final BA
    def retriangulate(self, merged: Reconstruction):
        """Re-triangulate separator images on the merged model (ref :823)."""
        t0 = time.time()
        mapper = IncrementalMapper.wrap(self.cameras, merged, self.graph,
                                        self.opts.mapper)
        for i in self.separators:
            mapper.triangulate_image(i)
        # cluster merging leaves the same physical track as distinct 3D
        # points on each side of a separator — fuse and extend them
        # (ref triangulator Merge/Complete on the merged model)
        sep_pts = set()
        for i in self.separators:
            sep_pts.update(int(p) for p in merged.images[i].point3D_ids
                           if p >= 0)
        mapper.complete_tracks(sorted(sep_pts))
        mapper.merge_tracks(sep_pts)
        mapper.filter_points()
        self.timings["retriangulation"] = time.time() - t0

    def adjust_global_bundle(self, merged: Reconstruction):
        """Final BA with track selection (ref :836-933)."""
        t0 = time.time()
        sel = None
        if self.opts.select_tracks_for_bundle_adjustment:
            sel = select_tracks(merged, self.opts.track_selection)
        const_points = None
        arrays, ids = merged.to_arrays()
        cam_ids, img_ids, pt_ids = ids
        if sel is not None:
            const_points = np.array([p not in sel for p in pt_ids])
        const_image = np.zeros(len(img_ids), bool)
        const_image[:2] = True

        opts = ba.BAOptions(max_iterations=self.opts.final_ba_iterations,
                            loss="cauchy", loss_scale=1.0)
        if self.opts.distributed_final_ba:
            from dagsfm_tpu.parallel import ba_sharded
            from dagsfm_tpu.parallel.mesh import make_mesh
            ndev = self.opts.num_devices or len(jax.devices())
            mesh = make_mesh(ndev)
            prob, shard_pts = ba_sharded.shard_problem(
                arrays, ndev, const_image=const_image)
            prob = ba_sharded.place(prob, mesh)
            out, stats = ba_sharded.solve_sharded(prob, mesh, opts)
            pts = ba_sharded.gather_points(out, shard_pts,
                                           arrays.points_xyz.shape[0])
            arrays = arrays._replace(
                image_qvec=np.asarray(out.image_qvec),
                image_tvec=np.asarray(out.image_tvec),
                points_xyz=pts)
            merged.update_from_arrays(arrays, ids)
        else:
            prob = ba.make_problem(arrays, const_image=const_image,
                                   const_points=const_points)
            prob, stats = ba.solve(prob, opts)
            arrays = arrays._replace(
                image_qvec=np.asarray(prob.image_qvec),
                image_tvec=np.asarray(prob.image_tvec),
                points_xyz=np.asarray(prob.points))
            merged.update_from_arrays(arrays, ids)
        self.ba_stats = stats
        self.timings["final_ba"] = time.time() - t0

    def separator_rmse(self, merged: Reconstruction) -> float:
        """Reprojection RMSE over separator images (ref :919-925).

        Projects through the FULL camera model (img_from_cam handles
        distortion for all 11 model ids) — K-only pinhole math here
        would misreport the comparable for any distorted camera.
        """
        import jax.numpy as jnp

        from dagsfm_tpu.scene import cameras as cm
        sepset = set(self.separators)
        by_cam: dict[int, list] = {}   # camera_id -> [(Xc, xy)]
        for pid, pt in merged.points3D.items():
            for (i, kp) in pt.track:
                if i not in sepset:
                    continue
                im = merged.images[i]
                Rcw = rops.quat_to_rotmat_np(im.qvec)
                Xc = Rcw @ pt.xyz + im.tvec
                if Xc[2] <= 1e-6:
                    continue
                by_cam.setdefault(im.camera_id, []).append(
                    (Xc, im.xys[kp]))
        errs = []
        for cid, rows in by_cam.items():
            cam = self.cameras[cid]
            Xc = np.stack([r[0] for r in rows])
            xy = np.stack([r[1] for r in rows])
            par = cm.pad_params(jnp.asarray(cam.params, jnp.float64),
                                cam.model_id)
            uv = np.asarray(cm.img_from_cam(cam.model_id, par,
                                            jnp.asarray(Xc)))
            errs.append(np.sum((uv - xy) ** 2, axis=-1))
        if not errs:
            return 0.0
        return float(np.sqrt(np.mean(np.concatenate(errs))))

    # -------------------------------------------- checkpoint / resume
    def export_partitions(self, path: str):
        """Write per-cluster models under partition<i>/ (ref
        ExportUntransformedLocalRecons :935-943)."""
        import os
        from dagsfm_tpu.scene import io as scene_io
        for k, rec in enumerate(self.local_recons):
            scene_io.write_model_bin(rec,
                                     os.path.join(path, f"partition{k}"))

    def export_cluster_jobs(self, path: str):
        """Write clusters.json job specs for external workers (the shared-
        storage replacement of the reference's RunSfM RPC payload: workers
        claim jobs by lease and write partition<k>/ — see
        parallel/distributed.py run_worker and the local_sfm_worker CLI)."""
        import json
        import os
        os.makedirs(path, exist_ok=True)
        jobs = [{"cluster_id": c.cluster_id,
                 "image_ids": [int(i) for i in c.image_ids]}
                for c in self.clusters]
        with open(os.path.join(path, "clusters.json"), "w") as f:
            json.dump(jobs, f)

    @staticmethod
    def partitions_exist(path: str) -> bool:
        """Ref IsPartialReconsExist (:544-569)."""
        import os
        return os.path.exists(os.path.join(path, "partition0",
                                           "cameras.bin"))

    def load_partitions(self, path: str):
        import os
        from dagsfm_tpu.scene import io as scene_io
        self.local_recons = []
        k = 0
        while os.path.exists(os.path.join(path, f"partition{k}",
                                          "cameras.bin")):
            self.local_recons.append(
                scene_io.read_model_bin(os.path.join(path,
                                                     f"partition{k}")))
            k += 1
        return self.local_recons

    # ------------------------------------------------------------- run
    def run(self, checkpoint_path: str | None = None) -> Reconstruction:
        """Full pipeline. With checkpoint_path: per-cluster models are
        exported there, and an existing set of partitions short-circuits
        straight to the merge (resumable runs, ref :544-569)."""
        total0 = time.time()
        if checkpoint_path and self.partitions_exist(checkpoint_path):
            self.load_partitions(checkpoint_path)
        else:
            self.build_view_graph()
            self.filter_and_average_rotations()
            self.cluster_scenes()
            self.reconstruct_partitions()
            if checkpoint_path:
                self.export_partitions(checkpoint_path)
        if not self.local_recons:
            return Reconstruction()
        merged = self.merge_clusters()
        if self.opts.retriangulate:
            self.retriangulate(merged)
        if self.opts.final_ba:
            self.adjust_global_bundle(merged)
        self.timings["total"] = time.time() - total0
        return merged

    def report(self) -> str:
        """Per-stage wall-clock report (ref :215-225)."""
        lines = ["Timings:"]
        for k, v in self.timings.items():
            lines.append(f"  {k:>20s}: {v:8.3f}s")
        return "\n".join(lines)
