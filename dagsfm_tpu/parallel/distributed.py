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
                 lease_timeout_s: float = 3600.0, max_attempts: int = 3):
        self.work_dir = work_dir
        self.host_id = host_id
        self.lease_timeout_s = lease_timeout_s
        self.max_attempts = max_attempts
        os.makedirs(os.path.join(work_dir, "leases"), exist_ok=True)

    def _lease_path(self, k: int) -> str:
        return os.path.join(self.work_dir, "leases", f"cluster{k}.lease")

    def _fail_path(self, k: int) -> str:
        return os.path.join(self.work_dir, "leases", f"cluster{k}.fail")

    def _out_path(self, k: int) -> str:
        return os.path.join(self.work_dir, f"partition{k}")

    def is_done(self, k: int) -> bool:
        return os.path.exists(os.path.join(self._out_path(k),
                                           "cameras.bin"))

    def _count_failures(self, k: int) -> int:
        fail_dir = self._fail_path(k) + ".d"
        try:
            return len(os.listdir(fail_dir))
        except FileNotFoundError:
            return 0

    def is_failed(self, k: int) -> bool:
        """True once the job is tombstoned (>= max_attempts failures) —
        a deterministically failing cluster stops being retried instead
        of livelocking the fleet."""
        return self._count_failures(k) >= self.max_attempts

    def record_failure(self, k: int) -> int:
        """Record one failed attempt and release the lease. Returns the
        total attempt count (tombstoned at max_attempts).

        The counter is append-only: each failure drops one uniquely-named
        O_CREAT|O_EXCL marker into <job>.fail.d/ and the count is the
        number of markers, so concurrent failures on different hosts
        never lose an increment (a shared-file read-modify-write would
        undercount under contention and over-retry deterministic
        failures)."""
        fail_dir = self._fail_path(k) + ".d"
        os.makedirs(fail_dir, exist_ok=True)
        marker = os.path.join(
            fail_dir, f"{self.host_id}-{os.getpid()}-{time.time_ns()}")
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump({"host": self.host_id, "t": time.time()}, f)
        try:
            os.remove(self._lease_path(k))
        except FileNotFoundError:
            pass
        return self._count_failures(k)

    def claim(self, k: int) -> bool:
        """Take the lease for cluster k (returns False if live elsewhere).

        Fresh claims are ATOMIC: O_CREAT|O_EXCL creation means exactly
        one of any number of simultaneous claimers wins (the round-2
        check-then-write race is gone). Takeover of an EXPIRED lease is
        last-writer-wins BEST-EFFORT: candidates replace the file then
        re-read after a grace window, which filters most — but not all —
        double elections (a replace landing after another's verify still
        slips through). Holders therefore re-check `verify_lease` right
        before publishing output; output publication itself is an atomic
        rename, so even a double-run converges to one winner's result.
        """
        if self.is_done(k) or self.is_failed(k):
            return False
        path = self._lease_path(k)
        nonce = f"{self.host_id}-{os.getpid()}-{time.time_ns()}"
        self._my_nonce = getattr(self, "_my_nonce", {})
        self._my_nonce[k] = nonce
        payload = json.dumps({"host": self.host_id,
                              "t_start": time.time(), "nonce": nonce})

        def atomic_create() -> bool:
            """Publish the lease atomically WITH its content: hard-link
            a fully-written temp file into place. A plain O_EXCL create
            followed by a write leaves an empty-file window in which a
            racing claimer reads the lease as 'corrupt' and takes it
            over — two winners (caught by the barrier-synced contention
            test). link() either lands the complete payload or fails."""
            tmp = path + f".claim.{nonce}"
            with open(tmp, "w") as f:
                f.write(payload)
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
            finally:
                os.remove(tmp)

        if atomic_create():
            return True
        try:
            with open(path) as f:
                lease = json.load(f)
            if time.time() - lease["t_start"] < self.lease_timeout_s:
                return False  # live lease held elsewhere
        except FileNotFoundError:
            # holder finished/released between our check and read: retry
            # the atomic create once
            return atomic_create()
        except (json.JSONDecodeError, KeyError):
            pass  # corrupt lease -> takeover below
        tmp = path + f".takeover.{nonce}"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
        time.sleep(0.05)  # let racing replacers land before verifying
        try:
            with open(path) as f:
                return json.load(f).get("nonce") == nonce
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    def verify_lease(self, k: int) -> bool:
        """Re-check that OUR nonce still holds the lease — called right
        before publishing output to close (most of) the expired-lease
        double-election window (see `claim`)."""
        nonce = getattr(self, "_my_nonce", {}).get(k)
        if nonce is None:
            return False
        try:
            with open(self._lease_path(k)) as f:
                return json.load(f).get("nonce") == nonce
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return False

    def complete(self, k: int, rec) -> None:
        """Publish the partition checkpoint ATOMICALLY: write to a temp
        directory, then rename into place. A crash mid-write can never
        leave a partial output that `is_done` mistakes for complete, and
        if two double-elected holders both finish, exactly one rename
        wins and the loser's output is discarded."""
        from dagsfm_tpu.scene import io as scene_io
        out = self._out_path(k)
        tmp = out + f".tmp.{os.getpid()}.{time.time_ns()}"
        scene_io.write_model_bin(rec, tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil
            if os.path.exists(out):
                # another holder published first — keep theirs
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # genuine rename failure (permissions, ENOTDIR, shared-FS
                # quirk): the partition's work would be silently lost and
                # the job would look claimable-but-never-done. Record the
                # failure and re-raise so the caller/operator sees it.
                shutil.rmtree(tmp, ignore_errors=True)
                self.record_failure(k)
                raise
        try:
            os.remove(self._lease_path(k))
        except FileNotFoundError:
            pass

    def orphaned_jobs(self, all_jobs: list) -> list:
        """Jobs with expired leases and no output — candidates to re-claim
        (the retry/reassignment the reference lacks, SURVEY.md §5).
        Tombstoned jobs are excluded."""
        out = []
        for k in all_jobs:
            if self.is_done(k) or self.is_failed(k):
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
    from dagsfm_tpu.utils.compile_cache import enable_persistent_cache

    # every cluster worker is (typically) a fresh process: share compiled
    # bucketed kernels across workers via the persistent cache
    enable_persistent_cache()
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
            if runner.verify_lease(k) or not runner.is_done(k):
                runner.complete(k, rec)
                done.append(k)
        else:
            # bounded retry: count the failure; after max_attempts the
            # job is tombstoned so the fleet stops re-running a
            # deterministic failure (round-2 livelock fix)
            runner.record_failure(k)
    return done


# ---------------------------------------------------------------------------
# Distributed feature extraction + matching over the lease runtime
# (parity with the reference's matching jobs:
# distributed_mapper_controller.cpp:388-475 DistributedFeatureExtraction-
# AndMatching, worker RunMatching binding exe/colmap.cc:961-983, and the
# DatabaseInfo Merge/UpdateImageIndex reduce payload database_info.h:74,265.
# The RPC payloads become shared-storage artifacts: job specs in
# matching_jobs.json, per-job results as COLMAP-schema SQLite databases,
# and the reduce step is a name-keyed database merge.)
# ---------------------------------------------------------------------------


class MatchingJobRunner(ClusterJobRunner):
    """Lease-coordinated matching jobs: output = matches<k>.db."""

    def _lease_path(self, k: int) -> str:
        return os.path.join(self.work_dir, "leases", f"match{k}.lease")

    def _fail_path(self, k: int) -> str:
        return os.path.join(self.work_dir, "leases", f"match{k}.fail")

    def _out_path(self, k: int) -> str:
        return os.path.join(self.work_dir, f"matches{k}.db")

    def is_done(self, k: int) -> bool:
        return os.path.exists(self._out_path(k))

    def tmp_out_path(self, k: int) -> str:
        """Scratch path workers write to; `complete_db` renames it into
        place so matches<k>.db (the is_done sentinel) only ever appears
        fully written. A crash mid-write leaves only the temp file, and
        the job stays claimable instead of being silently treated as
        complete and merged with missing matches."""
        return self._out_path(k) + f".tmp.{os.getpid()}"

    def complete_db(self, k: int) -> None:
        os.replace(self.tmp_out_path(k), self._out_path(k))
        try:
            os.remove(self._lease_path(k))
        except FileNotFoundError:
            pass


def make_matching_jobs(candidate_pairs: list, num_jobs: int) -> list:
    """Cut the candidate-pair graph into matching job specs.

    Mirrors the reference's Cut + ExpandAllEdges on the similarity graph
    (:403-407): every candidate pair lands in EXACTLY one job (the
    expansion adds the missing endpoint image to one incident cluster),
    so the union of job results covers all pairs with no duplicates.

    candidate_pairs: [(i, j[, score])...]. Returns
    [{"job_id", "image_ids", "pairs"}], pairs as [i, j] lists
    (json-ready).
    """
    from dagsfm_tpu.clustering.image_clustering import (ClusteringOptions,
                                                        ImageClustering)

    edges = {}
    for p in candidate_pairs:
        i, j = int(p[0]), int(p[1])
        score = float(p[2]) if len(p) > 2 and p[2] else 1.0
        key = (i, j) if i < j else (j, i)
        edges[key] = max(edges.get(key, 0.0), score)
    ids = sorted({i for k in edges for i in k})
    if num_jobs <= 1 or len(ids) <= 2:
        return [{"job_id": 0, "image_ids": ids,
                 "pairs": [[i, j] for (i, j) in sorted(edges)]}]
    ub = max(2, -(-len(ids) // num_jobs))
    ic = ImageClustering(ids, edges,
                         ClusteringOptions(num_images_ub=ub))
    ic.cut()
    clusters = ic.expand_all_edges()
    jobs = []
    for k, c in enumerate(clusters):
        if not c.edges:
            continue
        jobs.append({"job_id": k, "image_ids": sorted(c.image_ids),
                     "pairs": [[i, j] for (i, j) in sorted(c.edges)]})
    return jobs


def run_matching_worker(images: dict, cameras: dict, jobs: list,
                        work_dir: str, host_id: int = 0,
                        pipeline_options=None,
                        lease_timeout_s: float = 3600.0) -> list:
    """Worker loop for matching jobs: claim by lease, extract + match +
    verify the job's pair list, write a per-job COLMAP SQLite database.

    Counterpart of the reference worker's RunMatching binding
    (exe/colmap.cc:961-983 -> ExtractFeatureAndMatch,
    incremental_mapper_controller.cc:410-422): extraction happens ON the
    worker, results land in a worker-local database.

    images: image_id -> (H, W) float array (each worker loads only its
    jobs' images in practice; passing the full dict is fine).
    Returns completed job ids.
    """
    from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                      FeaturePipelineOptions)

    runner = MatchingJobRunner(work_dir, host_id,
                               lease_timeout_s=lease_timeout_s)
    order = sorted(range(len(jobs)),
                   key=lambda k: -len(jobs[k]["pairs"]))
    done = []
    for k in order:
        jid = jobs[k]["job_id"]
        if not runner.claim(jid):
            continue
        spec = jobs[k]
        sub_images = {i: images[i] for i in spec["image_ids"]}
        sub_cams = {i: cameras[i] for i in spec["image_ids"]}
        tmp_db = runner.tmp_out_path(jid)
        fp = FeaturePipeline(sub_images, sub_cams,
                             pipeline_options or FeaturePipelineOptions(),
                             database_path=tmp_db)
        try:
            fp.extract_features()
            fp.match_and_verify(
                pairs=[tuple(p) for p in spec["pairs"]])
            fp.write_database()
        except Exception as exc:  # noqa: BLE001 — worker must outlive one bad job
            # bounded retry, same as run_worker: count the failure and
            # move on to the next claimable job instead of idling the
            # worker for the rest of the queue
            try:
                os.remove(tmp_db)
            except FileNotFoundError:
                pass
            runner.record_failure(jid)
            print(f"[matching-worker {host_id}] job {jid} failed: {exc!r}")
            continue
        if runner.verify_lease(jid) or not os.path.exists(
                runner._out_path(jid)):
            runner.complete_db(jid)
            done.append(jid)
        else:  # lost an expired-lease re-election after takeover
            try:
                os.remove(tmp_db)
            except FileNotFoundError:
                pass
    return done


def merge_matching_databases(work_dir: str, job_ids: list,
                             out_path: str) -> int:
    """Master-side reduce: fold every matches<k>.db into one database.

    The name-keyed image-id renumbering inside ColmapDatabase.merge is
    the counterpart of DatabaseInfo::UpdateImageIndex + Merge
    (database_info.h:74,265 -> ExportToDatabase at
    distributed_mapper_controller.cpp:473-475): an image appearing in
    several job databases (expansion overlap) keeps ONE id in the merged
    database. Returns the number of two-view geometries merged.
    """
    from dagsfm_tpu.scene.io import ColmapDatabase

    paths = [os.path.join(work_dir, f"matches{k}.db") for k in job_ids]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return 0
    if os.path.exists(out_path):
        os.remove(out_path)
    if len(paths) == 1:
        import shutil
        shutil.copy(paths[0], out_path)
        with ColmapDatabase(out_path) as db:
            return db.num_two_view_geometries()
    acc = paths[0]
    tmp_prev = None
    for step, nxt in enumerate(paths[1:]):
        tmp = out_path + f".step{step}"
        db1 = ColmapDatabase(acc)
        db2 = ColmapDatabase(nxt)
        out = ColmapDatabase(tmp)
        ColmapDatabase.merge(db1, db2, out)
        db1.close(); db2.close(); out.close()
        if tmp_prev is not None:
            os.remove(tmp_prev)
        acc, tmp_prev = tmp, tmp
    os.replace(acc, out_path)
    with ColmapDatabase(out_path) as db:
        return db.num_two_view_geometries()
