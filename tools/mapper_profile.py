"""Profile incremental mapping on a REAL pixel-derived cluster.

The synthetic-graph mapper bench runs at ~3 img/s warm, but the
1000-image e2e's per-cluster mapping observed ~0.15-0.5 img/s — this
harness reproduces one cluster-sized pixel workload (rendered ring
sector -> SIFT -> matching -> verification -> mapper) under cProfile
and prints the top host-side costs plus per-stage wall time, so the gap
has an attributed cause instead of a guess.

Run on TPU: python tools/mapper_profile.py [--n 105]
"""
import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=105)
    args = ap.parse_args()

    from dagsfm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from dagsfm_tpu.features import sift
    from dagsfm_tpu.pipeline.feature_pipeline import (
        FeaturePipeline, FeaturePipelineOptions)
    from dagsfm_tpu.scene import cameras as cm
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    n = args.n
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=max(60, n // 8), image_width=256,
        image_height=192, focal=280.0, seed=12, ring_radius=10.0,
        point_cloud_extent=4.0, ring_height_jitter=0.2)
    sc = synthetic.generate(spec)
    images = synthetic.render_images(sc)
    cams = {i: cm.make_simple_camera(i, spec.image_width,
                                     spec.image_height, focal=spec.focal)
            for i in images}
    fp_opts = FeaturePipelineOptions(
        pair_mode="sequential", sequential_overlap=4,
        loop_detection_period=10, loop_detection_num_images=6,
        num_ransac_hypotheses=128, batch_size=8)
    fp_opts.sift = sift.SiftOptions(max_num_features=512,
                                    candidates_per_octave=512,
                                    num_octaves=3)
    fp = FeaturePipeline(images, cams, fp_opts)
    fp.extract_features()
    fp.match_and_verify()
    print("pipeline timings:", {k: round(v, 1)
                                for k, v in fp.timings.items()},
          flush=True)
    cams2, imgs2, graph = fp.to_mapper_inputs()

    mapper = IncrementalMapper(
        cams2, imgs2, graph,
        MapperOptions(seed=0, init_min_tri_angle_deg=2.0))
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    rec = mapper.reconstruct()
    pr.disable()
    dt = time.time() - t0
    print(f"mapper: {rec.num_reg_images()}/{n} registered in {dt:.1f}s "
          f"({rec.num_reg_images()/dt:.2f} img/s)", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(20)
    print(s.getvalue())
    s = io.StringIO()
    pstats.Stats(pr, stream=s).print_callers("array.py:631")
    print("CALLERS OF DEVICE FETCH (_value):")
    print(s.getvalue())


if __name__ == "__main__":
    main()
