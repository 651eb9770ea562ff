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
