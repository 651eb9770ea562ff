"""Distribution runtime tests: host assignment, job leases, threaded map."""
import json
import os
import time

import numpy as np
import pytest

from dagsfm_tpu.parallel import distributed as dist
from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.utils.observability import ProgressMonitor


def test_assign_clusters_balanced():
    sizes = [100, 90, 30, 20, 10, 10]
    assign = dist.assign_clusters_to_hosts(sizes, 2)
    loads = [0, 0]
    for s, h in zip(sizes, assign):
        loads[h] += s
    assert abs(loads[0] - loads[1]) <= 30


def test_single_host_identity():
    pid, n = dist.init_multihost()
    assert pid == 0 and n == 1


class TestLeases:
    def test_claim_and_complete(self, tmp_path):
        from dagsfm_tpu.scene import synthetic
        r = dist.ClusterJobRunner(str(tmp_path), host_id=0)
        assert r.claim(0)
        assert not dist.ClusterJobRunner(str(tmp_path), 1).claim(0)
        rec = synthetic.to_reconstruction(
            synthetic.generate(synthetic.SyntheticSceneSpec(
                num_cameras=4, num_points=40)))
        r.complete(0, rec)
        assert r.is_done(0)
        assert not r.claim(0)  # done jobs are not re-claimed
        assert r.orphaned_jobs([0, 1]) == [1]

    def test_expired_lease_reclaimed(self, tmp_path):
        r = dist.ClusterJobRunner(str(tmp_path), 0, lease_timeout_s=0.01)
        assert r.claim(3)
        time.sleep(0.05)
        # second host can reclaim the expired lease
        r2 = dist.ClusterJobRunner(str(tmp_path), 1, lease_timeout_s=0.01)
        assert 3 in r2.orphaned_jobs([3])
        assert r2.claim(3)
        with open(os.path.join(str(tmp_path), "leases",
                               "cluster3.lease")) as f:
            assert json.load(f)["host"] == 1


def test_threaded_cluster_map():
    monitor = ProgressMonitor()
    jobs = list(range(6))

    def fn(k):
        time.sleep(0.01)
        return k * k

    out = dist.run_clusters_threaded(jobs, fn, max_workers=3,
                                     monitor=monitor)
    assert out == [k * k for k in jobs]
    assert monitor.all_completed()


def test_threaded_map_propagates_errors():
    def fn(k):
        if k == 2:
            raise ValueError("boom")
        return k

    with pytest.raises(ValueError):
        dist.run_clusters_threaded([0, 1, 2], fn)


def test_run_worker_end_to_end(tmp_path):
    """Two workers drain the cluster job list via leases; partitions merge
    back into a full model (worker parity: ref exe/colmap.cc:923-1007)."""
    import json
    from dagsfm_tpu.clustering.image_clustering import ClusteringOptions
    from dagsfm_tpu.parallel.distributed import run_worker
    from dagsfm_tpu.pipeline.distributed_mapper import (
        DistributedMapperController, DistributedMapperOptions)
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm.incremental_mapper import MapperOptions

    spec = synthetic.SyntheticSceneSpec(num_cameras=14, num_points=400,
                                        pixel_noise=0.3, seed=21)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc, seed=3)
    opts = DistributedMapperOptions(
        clustering=ClusteringOptions(num_images_ub=8, image_overlap=4,
                                     completeness_ratio=0.5),
        mapper=MapperOptions(init_min_num_inliers=30,
                             num_ransac_hypotheses=256, seed=11))
    ctrl = DistributedMapperController(cams, images, graph, opts)
    ctrl.build_view_graph()
    ctrl.filter_and_average_rotations()
    ctrl.cluster_scenes()
    wd = str(tmp_path / "work")
    ctrl.export_cluster_jobs(wd)
    clusters = json.load(open(f"{wd}/clusters.json"))
    assert len(clusters) >= 2

    done0 = run_worker(cams, images, graph, clusters, wd, host_id=0,
                       mapper_options=opts.mapper)
    done1 = run_worker(cams, images, graph, clusters, wd, host_id=1,
                       mapper_options=opts.mapper)
    assert set(done0) | set(done1) == set(range(len(clusters)))
    assert not set(done0) & set(done1)      # leases prevent double work

    # master resumes from the worker partitions and merges
    ctrl2 = DistributedMapperController(cams, images, graph, opts)
    merged = ctrl2.run(checkpoint_path=wd)
    assert merged.num_reg_images() >= 12
    errs = synthetic.pose_errors(merged, sc)
    assert errs["ate"] < 0.1, errs


class TestTwoProcessWorkers:
    """Genuine cross-PROCESS distribution (ref map_reduce worker_test is
    a manual localhost harness; here it is an asserted CI test): two
    subprocess workers contend on the shared lease dir, and an orphaned
    lease from a dead worker is taken over."""

    def _make_workspace(self, tmp_path, num_cameras=12, seed=7):
        import numpy as np
        from dagsfm_tpu.scene import io as scene_io
        spec = synthetic.SyntheticSceneSpec(
            num_cameras=num_cameras, num_points=200, pixel_noise=0.3,
            seed=seed)
        sc = synthetic.generate(spec)
        cams, images, graph = synthetic.to_matching_problem(sc)
        db = str(tmp_path / "database.db")
        with scene_io.ColmapDatabase(db) as d:
            d.add_camera(cams[1])
            for i, im in sorted(images.items()):
                d.add_image(im.name, 1, image_id=i)
                d.add_keypoints(i, im.xys)
            for (i, j), m in graph.pair_matches.items():
                d.add_matches(i, j, m)
                d.add_two_view_geometry(i, j, m, config=2)
        wd = str(tmp_path / "work")
        import os
        os.makedirs(wd, exist_ok=True)
        half = num_cameras // 2
        clusters = [
            {"cluster_id": 0, "image_ids": list(range(1, half + 1))},
            {"cluster_id": 1,
             "image_ids": list(range(half + 1, num_cameras + 1))},
        ]
        with open(f"{wd}/clusters.json", "w") as f:
            json.dump(clusters, f)
        return db, wd, clusters

    def _worker_cmd(self, db, wd, host_id, lease_timeout=3600.0):
        import sys
        code = (
            "import jax;"
            "jax.config.update('jax_platforms','cpu');"
            "jax.config.update('jax_enable_x64', True);"
            "from dagsfm_tpu.pipeline.cli import main;"
            f"main(['local_sfm_worker','--database_path','{db}',"
            f"'--work_dir','{wd}','--host_id','{host_id}',"
            f"'--lease_timeout','{lease_timeout}'])"
        )
        return [sys.executable, "-c", code]

    @pytest.mark.slow
    def test_two_processes_split_the_work(self, tmp_path):
        import os
        import subprocess
        db, wd, clusters = self._make_workspace(tmp_path)
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        procs = [subprocess.Popen(self._worker_cmd(db, wd, h), env=env,
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True)
                 for h in (0, 1)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
        # both partitions completed exactly once across the two processes
        for k in range(2):
            assert os.path.exists(
                os.path.join(wd, f"partition{k}", "cameras.bin")), outs
        import re
        done_sets = []
        for out in outs:
            m = re.search(r"completed clusters \[(.*?)\]", out)
            assert m, out[-2000:]
            ids = [int(x) for x in m.group(1).split(",") if x.strip()]
            done_sets.append(set(ids))
        assert done_sets[0] | done_sets[1] == {0, 1}
        assert not (done_sets[0] & done_sets[1]), done_sets

    @pytest.mark.slow
    def test_orphan_lease_takeover_cross_process(self, tmp_path):
        import os
        import subprocess
        import time as _time
        db, wd, clusters = self._make_workspace(tmp_path, seed=8)
        # a dead worker left a stale lease on cluster 0
        os.makedirs(os.path.join(wd, "leases"), exist_ok=True)
        with open(os.path.join(wd, "leases", "cluster0.lease"), "w") as f:
            json.dump({"host": 99, "t_start": _time.time() - 10_000}, f)
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        p = subprocess.run(self._worker_cmd(db, wd, 1, lease_timeout=60.0),
                           env=env, capture_output=True, text=True,
                           timeout=560)
        assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
        # the stale lease was reclaimed and the job completed
        assert os.path.exists(
            os.path.join(wd, "partition0", "cameras.bin"))
        assert os.path.exists(
            os.path.join(wd, "partition1", "cameras.bin"))


def _lease_claim_worker(work_dir, host_id, barrier, q):
    # child imports only the (numpy-only) distributed module — never jax
    from dagsfm_tpu.parallel.distributed import ClusterJobRunner
    runner = ClusterJobRunner(work_dir, host_id)
    barrier.wait()  # all processes claim at the same instant
    q.put((host_id, runner.claim(0)))


class TestAtomicLeaseContention:
    """Simultaneous claims of the same cluster must produce EXACTLY one
    winner (O_CREAT|O_EXCL; the round-2 check-then-write race is gone)."""

    def test_barrier_synced_claims_one_winner(self, tmp_path):
        import multiprocessing as mp

        # spawn (not fork): the parent holds live jax threads by this
        # point in the suite and forking a threaded process can deadlock
        ctx = mp.get_context("spawn")
        n_procs = 6
        barrier = ctx.Barrier(n_procs)
        q = ctx.Queue()
        procs = [ctx.Process(target=_lease_claim_worker,
                             args=(str(tmp_path), h, barrier, q))
                 for h in range(n_procs)]
        for p in procs:
            p.start()
        results = [q.get(timeout=120) for _ in range(n_procs)]
        for p in procs:
            p.join(timeout=60)
        winners = [h for h, ok in results if ok]
        assert len(winners) == 1, f"lease race: winners={winners}"

    def test_failure_tombstone_bounds_retries(self, tmp_path):
        from dagsfm_tpu.parallel.distributed import ClusterJobRunner
        r = ClusterJobRunner(str(tmp_path), 0, max_attempts=3)
        for attempt in range(3):
            assert not r.is_failed(0)
            assert r.claim(0)
            r.record_failure(0)
        # tombstoned: no more claims, excluded from orphan scans
        assert r.is_failed(0)
        assert not r.claim(0)
        assert r.orphaned_jobs([0, 1]) == [1]


class TestJaxDistributedSmoke:
    """Two-process jax.distributed over localhost: init_multihost + a
    cross-process psum (the DCN control/collective path the reference
    crosses with rpclib, map_reduce/master.h:56). Skips with a recipe if
    the sandbox forbids localhost TCP."""

    def test_two_process_psum(self, tmp_path):
        import socket
        import subprocess
        import sys

        # find a free port for the coordination service
        s = socket.socket()
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("sandbox forbids localhost TCP; run manually: "
                        "two processes calling init_multihost("
                        "'127.0.0.1:<port>', 2, <pid>) then psum")
        port = s.getsockname()[1]
        s.close()

        def code(pid):
            return (
                "import jax;"
                "jax.config.update('jax_platforms','cpu');"
                "from dagsfm_tpu.parallel.distributed import init_multihost;"
                f"idx, cnt = init_multihost('127.0.0.1:{port}', 2, {pid});"
                "assert cnt == 2, cnt;"
                "import jax.numpy as jnp;"
                "from jax.sharding import Mesh, PartitionSpec as P;"
                "from jax import shard_map;"
                "import numpy as np;"
                "mesh = Mesh(np.array(jax.devices()), ('d',));"
                "f = shard_map(lambda x: jax.lax.psum(x, 'd'), mesh=mesh,"
                " in_specs=P('d'), out_specs=P(), check_vma=False);"
                "import functools;"
                "from jax.experimental import multihost_utils as mh;"
                "x = mh.host_local_array_to_global_array("
                f"np.full((1,), float(idx + 1)), mesh, P('d'));"
                "out = jax.jit(f)(x);"
                "val = float(jax.device_get("
                "mh.global_array_to_host_local_array(out, mesh, P())));"
                "assert val == 3.0, val;"
                f"print('proc {pid} psum ok', val)"
            )

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs = [subprocess.Popen(
            [sys.executable, "-c", code(h)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo") for h in (0, 1)]
        outs = []
        try:
            outs = [p.communicate(timeout=300)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.skip("jax.distributed localhost rendezvous timed out "
                        "in this sandbox; manual recipe: run the same "
                        "two commands on separate shells")
        for p, o in zip(procs, outs):
            if p.returncode != 0 and ("UNAVAILABLE" in o
                                      or "Connection" in o):
                pytest.skip(f"sandbox blocked the coordination service: "
                            f"{o[-500:]}")
            assert p.returncode == 0, o[-2000:]
        assert any("psum ok" in o for o in outs), outs


class TestCrashSafePublication:
    """Round-4 ADVICE fixes: temp-path publication, append-only failure
    counters, and lease re-verification before publishing."""

    def test_partial_matching_db_not_done(self, tmp_path):
        from dagsfm_tpu.parallel.distributed import MatchingJobRunner
        r = MatchingJobRunner(str(tmp_path), 0)
        # a crash mid-write leaves only the temp file -> job stays
        # claimable instead of being silently merged as complete
        with open(r.tmp_out_path(3), "w") as f:
            f.write("partial sqlite bytes")
        assert not r.is_done(3)
        assert r.claim(3)
        r.complete_db(3)
        assert r.is_done(3)

    def test_failure_counter_append_only_concurrent(self, tmp_path):
        """Two runners (different hosts) recording failures concurrently
        never lose an increment — each failure is one O_EXCL marker."""
        from dagsfm_tpu.parallel.distributed import ClusterJobRunner
        a = ClusterJobRunner(str(tmp_path), 0, max_attempts=4)
        b = ClusterJobRunner(str(tmp_path), 1, max_attempts=4)
        assert a.record_failure(7) == 1
        assert b.record_failure(7) == 2
        assert a.record_failure(7) == 3
        assert not a.is_failed(7)
        assert b.record_failure(7) == 4
        assert a.is_failed(7) and b.is_failed(7)

    def test_verify_lease_detects_takeover(self, tmp_path):
        from dagsfm_tpu.parallel.distributed import ClusterJobRunner
        a = ClusterJobRunner(str(tmp_path), 0, lease_timeout_s=0.0)
        b = ClusterJobRunner(str(tmp_path), 1, lease_timeout_s=0.0)
        assert a.claim(0)
        assert a.verify_lease(0)
        # lease immediately expired (timeout 0) -> b takes it over
        assert b.claim(0)
        assert b.verify_lease(0)
        assert not a.verify_lease(0)   # a must notice it lost the lease

    def test_cluster_complete_is_atomic_rename(self, tmp_path):
        """complete() publishes via rename: no partial partition dir can
        ever satisfy is_done, and a second publisher loses cleanly."""
        import numpy as np
        from dagsfm_tpu.parallel.distributed import ClusterJobRunner
        from dagsfm_tpu.scene.reconstruction import Reconstruction
        from dagsfm_tpu.scene import cameras as cm
        from dagsfm_tpu.scene.reconstruction import ImageRecord

        rec = Reconstruction()
        rec.cameras[1] = cm.make_simple_camera(1, 64, 48, focal=50.0)
        for i in (1, 2):
            rec.images[i] = ImageRecord(
                image_id=i, name=f"im{i}", camera_id=1,
                qvec=np.array([1.0, 0, 0, 0]), tvec=np.zeros(3),
                xys=np.zeros((0, 2)),
                point3D_ids=np.zeros(0, np.int64))
            rec.register_image(i)
        a = ClusterJobRunner(str(tmp_path), 0)
        b = ClusterJobRunner(str(tmp_path), 1)
        assert not a.is_done(5)
        a.claim(5)
        a.complete(5, rec)
        assert a.is_done(5)
        b.complete(5, rec)     # double winner: keeps the first, no crash
        assert b.is_done(5)
        import os
        leftovers = [d for d in os.listdir(tmp_path) if ".tmp." in d]
        assert not leftovers, leftovers
