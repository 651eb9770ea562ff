"""Multi-host distribution: process topology + parallel cluster mapping.

TPU-native counterpart of the reference's map-reduce layer
(/root/reference/src/map_reduce/: Master/Worker rpclib polling,
DistributedTaskManager's DistributeTasks/ReduceTasks threads,
distributed_task_manager.inl:70-149). The roles map to:

  control plane  -> jax.distributed coordination service (one-line init)
  job assignment -> static size-sorted balanced partition of clusters to
                    hosts (replacing idle-polling dynamic pull; the
                    reference itself sorts big clusters first,
                    distributed_mapper_controller.cpp:675-679)
  data plane     -> per-host device compute + COLMAP-format partition
                    checkpoints on shared storage (replacing msgpack'd
                    DatabaseCache/Reconstruction RPC payloads)
  intra-host     -> a thread pool overlapping host bookkeeping with
                    device dispatch across clusters (OpenMP-parallel-for
                    parity, :704)

Improvement over the reference (SURVEY.md §5 failure detection): job
leases — a host that fails to write its partition checkpoint leaves a
lease file behind, and `orphaned_jobs` lets survivors re-claim the work.
The reference stalls forever on a dead worker.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import time

import numpy as np


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple:
    """Initialize jax.distributed when running multi-host; no-op single.

    Returns (process_index, process_count).
    """
    import jax
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def assign_clusters_to_hosts(cluster_sizes: list, num_hosts: int) -> list:
    """Static size-balanced assignment. Returns host id per cluster."""
    from dagsfm_tpu.parallel.mesh import partition_balanced
    return partition_balanced(np.asarray(cluster_sizes, float),
                              num_hosts).tolist()


class ClusterJobRunner:
    """Per-host execution of assigned cluster jobs with lease files.

    work_dir layout:
      leases/cluster<k>.lease   — json {host, t_start} while running
      partition<k>/cameras.bin  — completed output (checkpoint)
    """

    def __init__(self, work_dir: str, host_id: int,
                 lease_timeout_s: float = 3600.0):
        self.work_dir = work_dir
        self.host_id = host_id
        self.lease_timeout_s = lease_timeout_s
        os.makedirs(os.path.join(work_dir, "leases"), exist_ok=True)

    def _lease_path(self, k: int) -> str:
        return os.path.join(self.work_dir, "leases", f"cluster{k}.lease")

    def _out_path(self, k: int) -> str:
        return os.path.join(self.work_dir, f"partition{k}")

    def is_done(self, k: int) -> bool:
        return os.path.exists(os.path.join(self._out_path(k),
                                           "cameras.bin"))

    def claim(self, k: int) -> bool:
        """Take the lease for cluster k (returns False if live elsewhere)."""
        if self.is_done(k):
            return False
        path = self._lease_path(k)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    lease = json.load(f)
                if time.time() - lease["t_start"] < self.lease_timeout_s:
                    return False  # live lease held elsewhere
            except (json.JSONDecodeError, KeyError):
                pass  # corrupt lease -> reclaim
        with open(path, "w") as f:
            json.dump({"host": self.host_id, "t_start": time.time()}, f)
        return True

    def complete(self, k: int, rec) -> None:
        from dagsfm_tpu.scene import io as scene_io
        scene_io.write_model_bin(rec, self._out_path(k))
        try:
            os.remove(self._lease_path(k))
        except FileNotFoundError:
            pass

    def orphaned_jobs(self, all_jobs: list) -> list:
        """Jobs with expired leases and no output — candidates to re-claim
        (the retry/reassignment the reference lacks, SURVEY.md §5)."""
        out = []
        for k in all_jobs:
            if self.is_done(k):
                continue
            path = self._lease_path(k)
            if not os.path.exists(path):
                out.append(k)
                continue
            try:
                with open(path) as f:
                    lease = json.load(f)
                if time.time() - lease["t_start"] >= self.lease_timeout_s:
                    out.append(k)
            except (json.JSONDecodeError, KeyError):
                out.append(k)
        return out


def run_clusters_threaded(jobs: list, fn, max_workers: int = 4,
                          monitor=None) -> list:
    """Thread-pool map over cluster jobs (OpenMP-parallel-for parity).

    Device dispatch releases the GIL, so host bookkeeping of one cluster
    overlaps device compute of another. `fn(job)` -> result. Results in
    job order; exceptions propagate.
    """
    results = [None] * len(jobs)
    with cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = {}
        for idx, job in enumerate(jobs):
            if monitor is not None:
                monitor.start(idx, getattr(job, "num_images", 0) or 0)
            futs[ex.submit(fn, job)] = idx
        for fut in cf.as_completed(futs):
            idx = futs[fut]
            results[idx] = fut.result()
            if monitor is not None:
                monitor.complete(idx)
    return results


def run_worker(cameras: dict, images: dict, graph, clusters: list,
               work_dir: str, host_id: int = 0, mapper_options=None,
               lease_timeout_s: float = 3600.0) -> list:
    """Worker loop: claim cluster jobs by lease, reconstruct, checkpoint.

    Counterpart of the reference's `colmap local_sfm_worker`
    (exe/colmap.cc:923-1007: RPC server binding RunSfM on a shipped
    DatabaseCache). Here the "payload" is the shared database + a
    clusters.json job list (DistributedMapperController.export_cluster_jobs)
    and the channel is the lease directory — including reassignment of
    orphaned jobs, which the reference lacks.

    clusters: list of dicts {"cluster_id": int, "image_ids": [int]}.
    Returns the list of cluster ids completed by THIS worker.
    """
    from dagsfm_tpu.sfm.correspondence_graph import CorrespondenceGraph
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    runner = ClusterJobRunner(work_dir, host_id,
                              lease_timeout_s=lease_timeout_s)
    order = sorted(range(len(clusters)),
                   key=lambda k: -len(clusters[k]["image_ids"]))
    done = []
    for k in order:
        if not runner.claim(k):
            continue
        spec = clusters[k]
        idset = set(spec["image_ids"])
        sub = CorrespondenceGraph()
        for i in spec["image_ids"]:
            sub.add_image(i, graph.num_keypoints[i])
        for (i, j), m in graph.pair_matches.items():
            if i in idset and j in idset:
                sub.add_matches(i, j, m)
        sub_images = {i: images[i] for i in spec["image_ids"]}
        mapper = IncrementalMapper(cameras, sub_images, sub,
                                   mapper_options or MapperOptions())
        rec = mapper.reconstruct()
        for im in rec.images.values():
            im.cluster_id = spec["cluster_id"]
        if rec.num_reg_images() >= 2:
            runner.complete(k, rec)
            done.append(k)
        else:
            # release the lease so another worker may retry differently
            try:
                os.remove(runner._lease_path(k))
            except FileNotFoundError:
                pass
    return done
