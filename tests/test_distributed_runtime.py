"""Distribution runtime tests: host assignment, job leases, threaded map."""
import json
import os
import time

import numpy as np
import pytest

from dagsfm_tpu.parallel import distributed as dist
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
