"""Distributed feature extraction + matching over the lease runtime
(ref DistributedFeatureExtractionAndMatching,
distributed_mapper_controller.cpp:388-475 + worker RunMatching binding
exe/colmap.cc:961-983): the candidate-pair graph is cut into matching
jobs, workers extract+match+verify into per-job databases, and the
master merges them with name-keyed image-id renumbering
(DatabaseInfo::UpdateImageIndex/Merge parity, database_info.h:74,265).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from dagsfm_tpu.parallel.distributed import (make_matching_jobs,
                                             merge_matching_databases,
                                             run_matching_worker)
from dagsfm_tpu.scene import cameras as cm
from dagsfm_tpu.scene import synthetic


def _ring_pairs(ids, width=2):
    n = len(ids)
    out = []
    for a in range(n):
        for d in range(1, width + 1):
            b = (a + d) % n
            i, j = ids[a], ids[b]
            out.append((min(i, j), max(i, j)))
    return sorted(set(out))


def test_make_matching_jobs_covers_all_pairs_once():
    pairs = _ring_pairs(list(range(1, 25)), width=3)
    jobs = make_matching_jobs([(i, j, 1.0) for (i, j) in pairs], 4)
    assert len(jobs) >= 2
    seen = []
    for jb in jobs:
        idset = set(jb["image_ids"])
        for (i, j) in jb["pairs"]:
            assert i in idset and j in idset
            seen.append((i, j))
    # exactly-once coverage (ref ExpandAllEdges semantics)
    assert sorted(seen) == pairs


@pytest.fixture(scope="module")
def rendered_scene():
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=12, num_points=40, image_width=320, image_height=240,
        focal=340.0, seed=5, ring_radius=9.0, point_cloud_extent=3.5)
    sc = synthetic.generate(spec)
    images = synthetic.render_images(sc)
    return spec, sc, images


@pytest.mark.slow
def test_two_process_matching_merges_to_one_model(rendered_scene,
                                                  tmp_path):
    """Two worker PROCESSES split the matching jobs of a rendered scene;
    the merged database reconstructs with the same pair coverage a
    single host would produce."""
    spec, sc, images = rendered_scene
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for i, img in images.items():
        np.save(img_dir / f"image{i}.npy", img)

    ids = sorted(images)
    pairs = _ring_pairs(ids, width=2)
    jobs = make_matching_jobs([(i, j, 1.0) for (i, j) in pairs], 2)
    assert len(jobs) >= 2
    wd = tmp_path / "work"
    wd.mkdir()
    with open(wd / "matching_jobs.json", "w") as f:
        json.dump(jobs, f)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    def worker_cmd(host_id):
        code = (
            "import jax;"
            "jax.config.update('jax_platforms','cpu');"
            "jax.config.update('jax_enable_x64', True);"
            "from dagsfm_tpu.pipeline.cli import main;"
            f"main(['local_matching_worker','--image_path','{img_dir}',"
            f"'--work_dir','{wd}','--host_id','{host_id}',"
            f"'--focal','{spec.focal}','--max_num_features','768',"
            "'--guided_matching'])"
        )
        return [sys.executable, "-c", code]

    procs = [subprocess.Popen(worker_cmd(h), env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True,
                              cwd="/root/repo")
             for h in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    # both workers did real work (lease split, no double work)
    completed = []
    for o in outs:
        line = [ln for ln in o.splitlines() if "completed jobs" in ln][-1]
        completed.append(eval(line.split("completed jobs")[1]))
    all_done = sorted(j for c in completed for j in c)
    assert all_done == sorted(j["job_id"] for j in jobs), outs
    assert all(len(c) >= 1 for c in completed), completed

    # master-side reduce: merge into one database
    merged_db = str(tmp_path / "merged.db")
    n_tvg = merge_matching_databases(str(wd),
                                     [j["job_id"] for j in jobs],
                                     merged_db)
    # at 30 deg ring steps both the adjacent and skip-2 pairs verify
    assert n_tvg >= len(pairs) * 0.8, (n_tvg, len(pairs))

    # the merged database reconstructs against ground truth
    from dagsfm_tpu.pipeline.feature_pipeline import FeaturePipeline
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)
    fp = FeaturePipeline({}, {})
    cams, imgs, graph = fp.load_from_database(merged_db)
    # exactly one image record per scene image despite expansion overlap
    assert len(imgs) == len(ids)
    mapper = IncrementalMapper(cams, imgs, graph, MapperOptions(seed=0))
    rec = mapper.reconstruct()
    err = synthetic.pose_errors(rec, sc)
    assert err["num_reg"] >= len(ids) - 1, err
    assert err["ate"] < 0.2, err


def test_in_process_matching_worker_single_job(rendered_scene, tmp_path):
    """Single-job in-process smoke of run_matching_worker +
    merge_matching_databases (fast path; the subprocess test above is
    the full parity check)."""
    from dagsfm_tpu.features import sift
    from dagsfm_tpu.pipeline.feature_pipeline import (FeaturePipeline,
                                                      FeaturePipelineOptions)
    spec, sc, images = rendered_scene
    ids = sorted(images)[:4]
    sub = {i: images[i] for i in ids}
    cams = {i: cm.make_simple_camera(i, spec.image_width,
                                     spec.image_height, focal=spec.focal)
            for i in ids}
    pairs = [(ids[0], ids[1]), (ids[1], ids[2]), (ids[2], ids[3])]
    jobs = make_matching_jobs([(i, j, 1.0) for (i, j) in pairs], 1)
    opts = FeaturePipelineOptions(batch_size=4)
    opts.sift = sift.SiftOptions(max_num_features=512,
                                 candidates_per_octave=256, num_octaves=3)
    done = run_matching_worker(sub, cams, jobs, str(tmp_path),
                               pipeline_options=opts)
    assert done == [0]
    merged = str(tmp_path / "m.db")
    n = merge_matching_databases(str(tmp_path), [0], merged)
    assert n >= 2
    fp = FeaturePipeline({}, {})
    cams2, imgs2, graph2 = fp.load_from_database(merged)
    assert len(imgs2) == 4
    assert graph2.num_correspondences_for_image(ids[1]) > 0
