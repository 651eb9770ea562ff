"""Full benchmark suite: BA (dense + iterative-at-scale), SIFT
throughput, matcher throughput — the BASELINE.md axes beyond bench.py's
single headline line.

Each metric prints one JSON line and everything is also written to
BENCH_SUITE.json. Run on real TPU hardware (no platform overrides) or on
CPU for smoke (`--smoke` shrinks sizes).

vs_baseline denominators (the reference publishes no numbers —
BASELINE.md): Ceres DENSE_SCHUR ~20 LM iters/s on the 100-cam problem;
Ceres ITERATIVE_SCHUR ~2 LM iters/s at 1000 cams / 600k obs on a
modern multicore CPU; SiftGPU ~10 images/s at ~1k features (GTX-class,
the reference's hardware era); SiftGPU matcher ~100 pairs/s at 1k
features.
"""

import argparse
import json
import time

import numpy as np


def _timeit(fn, reps=3):
    """fn must return a SCALAR that depends on all benched work; it is
    fetched to host each rep (block_until_ready alone does not reliably
    synchronize through the remote-TPU tunnel)."""
    import jax
    float(jax.device_get(fn()))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(jax.device_get(fn()))
    return (time.perf_counter() - t0) / reps


def bench_ba_dense(dtype, results):
    import jax
    import jax.numpy as jnp
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    spec = synthetic.SyntheticSceneSpec(
        num_cameras=100, num_points=5000, pixel_noise=0.5, seed=0)
    sc = synthetic.generate(spec)
    rec = synthetic.to_reconstruction(sc)
    arrays, _ = rec.to_arrays(dtype=np.float64)
    rng = np.random.default_rng(1)
    arrays = arrays._replace(points_xyz=arrays.points_xyz + rng.normal(
        0, 0.02, arrays.points_xyz.shape))
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const, dtype=dtype)
    iters = 10
    opts = ba.BAOptions(max_iterations=iters, loss="cauchy",
                        loss_scale=1.0, pinhole_only=ba.all_pinhole(arrays))
    solve = jax.jit(lambda p: ba.solve(p, opts))
    dt = _timeit(lambda: solve(prob)[0].points.sum())
    results.append({
        "metric": "ba_lm_iters_per_s_100cam_37kobs",
        "value": round(iters / dt, 3), "unit": "iters/s",
        "vs_baseline": round(iters / dt / 20.0, 3)})


def bench_ba_iterative(dtype, results, smoke=False):
    import jax
    import jax.numpy as jnp
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    ncam, npts, mtl = (200, 5000, 8) if smoke else (1000, 50000, 12)
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=ncam, num_points=npts, pixel_noise=0.5, seed=0,
        max_track_length=mtl)
    sc = synthetic.generate(spec)
    arrays = synthetic.to_scene_arrays(sc, dtype=np.float32)
    rng = np.random.default_rng(1)
    arrays = arrays._replace(points_xyz=arrays.points_xyz + rng.normal(
        0, 0.02, arrays.points_xyz.shape).astype(np.float32))
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const, dtype=dtype)
    nobs = int(np.asarray(prob.obs_mask).sum())
    iters = 5
    opts = ba.BAOptions(max_iterations=iters, solver="iterative",
                        pinhole_only=True)
    solve = jax.jit(lambda p: ba.solve(p, opts))
    dt = _timeit(lambda: solve(prob)[0].points.sum())
    results.append({
        "metric": f"ba_iterative_lm_iters_per_s_{ncam}cam_{nobs//1000}kobs",
        "value": round(iters / dt, 3), "unit": "iters/s",
        "vs_baseline": round(iters / dt / 2.0, 3)})


def bench_sift(results, smoke=False):
    import jax
    import jax.numpy as jnp
    import scipy.ndimage as ndi
    from dagsfm_tpu.features import sift

    B, H, W = (2, 240, 320) if smoke else (8, 480, 640)
    rng = np.random.default_rng(0)
    imgs = np.stack([ndi.gaussian_filter(
        rng.random((H, W)).astype(np.float32), 1.2) for _ in range(B)])
    opts = sift.SiftOptions(max_num_features=2048,
                            candidates_per_octave=1024)
    batch = jnp.asarray(imgs)
    dt = _timeit(lambda: (lambda f: f.xy.sum() + f.descriptor.sum())(sift.extract(batch, opts)))
    results.append({
        "metric": f"sift_images_per_s_{W}x{H}_fo-1",
        "value": round(B / dt, 3), "unit": "images/s",
        "vs_baseline": round(B / dt / 10.0, 3)})


def bench_matcher(results, smoke=False):
    import jax
    import jax.numpy as jnp
    from dagsfm_tpu.features import matching as fm

    K = 1024
    B = 16 if smoke else 256
    rng = np.random.default_rng(0)
    d = rng.normal(size=(B, 2, K, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    m = np.ones((B, K), bool)
    opts = fm.MatchingOptions()
    run = jax.jit(lambda d1, d2, m1, m2: fm.match_pair_batch(
        d1, d2, m1, m2, opts))
    d1 = jnp.asarray(d[:, 0])
    d2 = jnp.asarray(d[:, 1])
    mj = jnp.asarray(m)
    dt = _timeit(lambda: run(d1, d2, mj, mj)[0].sum())
    results.append({
        "metric": f"match_pairs_per_s_{K}x{K}desc",
        "value": round(B / dt, 3), "unit": "pairs/s",
        "vs_baseline": round(B / dt / 100.0, 3)})


def bench_mapper(results, smoke=False):
    """Incremental mapping throughput from verified matches (host loop +
    device kernels; the reference's per-cluster COLMAP mapper regime)."""
    import time as _time
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    n = 24 if smoke else 100
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=40 * n, pixel_noise=0.3, seed=2,
        max_track_length=12)
    sc = synthetic.generate(spec)
    cams, images, graph = synthetic.to_matching_problem(sc)
    mapper = IncrementalMapper(cams, images, graph, MapperOptions(seed=0))
    t0 = _time.time()
    rec = mapper.reconstruct()
    dt = _time.time() - t0
    reg = rec.num_reg_images()
    # vs_baseline: COLMAP mapper ~0.5 img/s on comparable synthetic
    # density (multicore CPU, Ceres BA dominating)
    results.append({
        "metric": f"mapper_images_per_s_{n}img",
        "value": round(reg / dt, 3), "unit": "images/s",
        "vs_baseline": round(reg / dt / 0.5, 3)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="small sizes for CPU sanity runs")
    ap.add_argument("--only", default="",
                    help="comma list: ba,ba_iter,sift,match")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    only = set(args.only.split(",")) if args.only else None
    results = []

    def _flush():
        # written after EVERY metric so a mid-run device crash (the
        # remote-TPU tunnel can restart) keeps the completed entries
        with open("BENCH_SUITE.json", "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device": str(jax.devices()[0]),
                       "results": results}, f, indent=1)
        if results:
            print(json.dumps(results[-1]), flush=True)

    if only is None or "sift" in only:
        bench_sift(results, args.smoke)
        _flush()
    if only is None or "match" in only:
        bench_matcher(results, args.smoke)
        _flush()
    if only is None or "ba" in only:
        bench_ba_dense(dtype, results)
        _flush()
    if only is None or "ba_iter" in only:
        bench_ba_iterative(dtype, results, args.smoke)
        _flush()
    if only is None or "map" in only:
        bench_mapper(results, args.smoke)
        _flush()


if __name__ == "__main__":
    main()
