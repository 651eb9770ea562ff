"""Full benchmark suite: BA (dense + iterative-at-scale), SIFT, matcher
(XLA + fused Pallas), incremental mapper (cold + warm, both modes),
two-view verification, vocab-tree retrieval.

Each metric prints one JSON line and everything is also written to
BENCH_SUITE.json. Run on real TPU hardware (no platform overrides) or on
CPU for smoke (`--smoke` shrinks sizes).

vs_baseline denominators (the reference publishes no numbers —
BASELINE.md): Ceres DENSE_SCHUR ~20 LM iters/s on the 100-cam problem;
Ceres ITERATIVE_SCHUR ~2 LM iters/s at 1000 cams / ~1M obs on a modern
multicore CPU; SiftGPU ~10 images/s at ~1k features (GTX-class, the
reference's hardware era); SiftGPU matcher ~100 pairs/s at 1k features;
COLMAP mapper ~0.5 img/s; COLMAP geometric verification ~100 pairs/s
(multithreaded CPU RANSAC); COLMAP vocab-tree query ~20 q/s.

Utilization accounting: axes with a well-defined analytic FLOP count
also report achieved_gflops and mfu_pct against the v5e MXU bf16 peak
(197 TFLOP/s, estimate) so "N x an estimated baseline" can be read
against absolute headroom.
"""

import argparse
import json
import os
import time

import numpy as np

V5E_PEAK_BF16_GFLOPS = 197_000.0   # estimate; labels absolute headroom


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


def _mfu(gflops_done, dt):
    g = gflops_done / dt
    return round(g, 1), round(100.0 * g / V5E_PEAK_BF16_GFLOPS, 3)


def bench_ba_dense(dtype, results):
    import jax
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
    opts = ba.BAOptions(max_iterations=iters, loss="cauchy", ftol=0.0,
                        loss_scale=1.0, pinhole_only=ba.all_pinhole(arrays))
    solve = jax.jit(lambda p: ba.solve(p, opts))
    dt = _timeit(lambda: solve(prob)[0].points.sum())
    results.append({
        "metric": "ba_lm_iters_per_s_100cam_37kobs",
        "value": round(iters / dt, 3), "unit": "iters/s",
        "vs_baseline": round(iters / dt / 20.0, 3)})


def bench_ba_iterative(dtype, results, smoke=False):
    import jax
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    # 1M observations at 1000 cameras — the reference's ITERATIVE_SCHUR
    # regime at full size. (The former 300k ceiling was an XLA:TPU
    # kernel fault in the Sdiag assembly, fixed by _obs_reduce_wide;
    # this axis no longer needs to run last as crash protection.)
    ncam, npts, mtl = (200, 5000, 8) if smoke else (1000, 50000, 20)
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
    prob = ba.make_problem(arrays, const_image=const, dtype=dtype,
                           max_track_len=mtl)
    nobs = int(np.asarray(prob.obs_mask).sum())
    iters = 5
    opts = ba.BAOptions(max_iterations=iters, solver="iterative",
                        pinhole_only=True, ftol=0.0)
    solve = jax.jit(lambda p: ba.solve(p, opts))
    dt = _timeit(lambda: solve(prob)[0].points.sum())
    # analytic flops per LM iter (dominant terms): residual+jacobian
    # ~500/obs; per-CG-iter matvec ~(2*18*2 + 18)/obs x ~30 CG iters
    gflops_iter = nobs * (500 + 30 * 90) / 1e9
    g, mfu = _mfu(gflops_iter * iters, dt)
    results.append({
        "metric": f"ba_iterative_lm_iters_per_s_{ncam}cam_{nobs//1000}kobs",
        "value": round(iters / dt, 3), "unit": "iters/s",
        "achieved_gflops": g, "mfu_pct": mfu, "flops_analytic": True,
        "vs_baseline": round(iters / dt / 2.0, 3)})


def bench_sift(results, smoke=False):
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
    dt = _timeit(lambda: (lambda f: f.xy.sum() + f.descriptor.sum())(
        sift.extract(batch, opts)))
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
    d = np.abs(rng.normal(size=(B, 2, K, 128))).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    m = np.ones((B, K), bool)
    opts = fm.MatchingOptions()
    run = jax.jit(lambda d1, d2, m1, m2: fm.match_pair_batch(
        d1, d2, m1, m2, opts))
    d1 = jnp.asarray(d[:, 0])
    d2 = jnp.asarray(d[:, 1])
    mj = jnp.asarray(m)
    gflops_call = B * 2 * K * K * 128 / 1e9
    dt = _timeit(lambda: run(d1, d2, mj, mj)[0].sum())
    g, mfu = _mfu(gflops_call, dt)
    results.append({
        "metric": f"match_pairs_per_s_{K}x{K}desc",
        "value": round(B / dt, 3), "unit": "pairs/s",
        "achieved_gflops": g, "mfu_pct": mfu, "flops_analytic": True,
        "vs_baseline": round(B / dt / 100.0, 3)})


def bench_matcher_pallas(results, smoke=False):
    """Batched fused Pallas matcher (TPU only; VMEM-resident scores,
    forward top-2 + reverse cross-check in one pass)."""
    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "cpu":
        return
    from dagsfm_tpu.ops.pallas_matcher import pallas_match_pair_batch

    K = 1024
    B = 16 if smoke else 256
    rng = np.random.default_rng(0)
    d = np.abs(rng.normal(size=(B, 2, K, 128))).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d1 = jnp.asarray(d[:, 0])
    d2 = jnp.asarray(d[:, 1])
    mj = jnp.asarray(np.ones((B, K), bool))
    gflops_call = B * 2 * K * K * 128 / 1e9
    dt = _timeit(lambda: pallas_match_pair_batch(d1, d2, mj, mj)[1].sum())
    g, mfu = _mfu(gflops_call, dt)
    # device-side rate: amortize the fixed tunnel round-trip by chaining
    # 8 calls before one scalar fetch
    chain = 8

    def chained():
        acc = 0.0
        for _ in range(chain):
            acc = acc + pallas_match_pair_batch(d1, d2, mj, mj)[1].sum()
        return acc
    dt_chain = _timeit(chained) / chain
    results.append({
        "metric": f"pallas_match_pairs_per_s_{K}x{K}desc",
        "value": round(B / dt, 3), "unit": "pairs/s",
        "value_chained": round(B / dt_chain, 3),
        "achieved_gflops": g, "mfu_pct": mfu, "flops_analytic": True,
        "vs_baseline": round(B / dt / 100.0, 3)})


def bench_matcher_production(results, smoke=False):
    """Matching through the PRODUCTION entry point (match_pairs, the API
    FeaturePipeline calls) — includes descriptor staging, batching, and
    match-array fetch, not just the device kernel. Exercises the
    device-resident bank: each image uploads once, pair batches gather
    on-device."""
    import time as _time
    from dagsfm_tpu.features import matching as fm

    K = 1024
    n_imgs = 16 if smoke else 64
    rng = np.random.default_rng(0)
    descs, masks = {}, {}
    for i in range(n_imgs):
        d = np.abs(rng.normal(size=(K, 128))).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        descs[i] = d
        masks[i] = np.ones(K, bool)
    pairs = [(i, j) for i in range(n_imgs) for j in range(i + 1, n_imgs)]
    # the pipeline builds the DescriptorBank at EXTRACTION time from the
    # device-side SIFT output (feature_pipeline.extract_features), so the
    # production matching stage starts from a resident bank:
    import jax.numpy as jnp
    bank = fm.make_bank_from_device(
        list(range(n_imgs)),
        jnp.asarray(np.stack([descs[i] for i in range(n_imgs)])),
        jnp.asarray(np.stack([masks[i] for i in range(n_imgs)])))
    fm.match_pairs(descs, masks, pairs, bank=bank)     # warm compiles
    t0 = _time.perf_counter()
    out = fm.match_pairs(descs, masks, pairs, bank=bank)
    dt = _time.perf_counter() - t0
    assert len(out) == len(pairs)
    # and the cold path variant that must upload host dicts first
    t0 = _time.perf_counter()
    fm.match_pairs(descs, masks, pairs)
    dt_upload = _time.perf_counter() - t0
    results.append({
        "metric": f"match_pairs_production_pairs_per_s_{K}desc",
        "value": round(len(pairs) / dt, 3), "unit": "pairs/s",
        "value_with_host_upload": round(len(pairs) / dt_upload, 3),
        "n_pairs": len(pairs), "n_images": n_imgs,
        "includes_jit_compile": False,
        "vs_baseline": round(len(pairs) / dt / 100.0, 3)})


def bench_two_view(results, smoke=False):
    """Batched two-view geometric verification (SURVEY hot loop #3):
    full E/F/H model selection and the essential_only fast path.

    256 pairs with MIXED correspondence counts (200/256/384/500 -> two
    padded shape buckets, 256 and 512) — the realistic regime where the
    bucketing + batching machinery itself is part of what is measured."""
    from dagsfm_tpu.ops import two_view_classify as tvc
    from dagsfm_tpu.scene import synthetic

    n_pairs = 8 if smoke else 256
    npts_cycle = (200, 256, 384, 500)
    rng = np.random.default_rng(3)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    pair_data = []
    for k in range(n_pairs):
        npts = npts_cycle[k % len(npts_cycle)]
        # synthetic two-view scene: random relative pose + 3D points
        X = rng.uniform([-2, -2, 4], [2, 2, 8], (npts, 3))
        aa = rng.normal(0, 0.1, 3)
        th = np.linalg.norm(aa)
        ax = aa / max(th, 1e-9)
        ct, st = np.cos(th), np.sin(th)
        R = (ct * np.eye(3) + st * np.cross(np.eye(3), ax)
             + (1 - ct) * np.outer(ax, ax))
        t = rng.normal(0, 0.3, 3)
        x1 = X @ K.T
        x1 = x1[:, :2] / x1[:, 2:]
        x2 = (X @ R.T + t) @ K.T
        x2 = x2[:, :2] / x2[:, 2:]
        x1 += rng.normal(0, 0.5, x1.shape)
        x2 += rng.normal(0, 0.5, x2.shape)
        pair_data.append(((k, k + 1000), x1, x2, K, K,
                          (640, 480), (640, 480), True))

    for tag, opts in (("full", tvc.TwoViewOptions()),
                      ("essential_only",
                       tvc.TwoViewOptions(essential_only=True))):
        t0 = time.perf_counter()
        out = tvc.classify_pairs(pair_data, opts, seed=0)
        dt = time.perf_counter() - t0
        n_ok = sum(1 for r in out.values() if r.num_inliers > 0)
        t0 = time.perf_counter()
        out = tvc.classify_pairs(pair_data, opts, seed=1)
        dt_warm = time.perf_counter() - t0
        results.append({
            "metric": f"two_view_verify_pairs_per_s_{tag}",
            "value": round(n_pairs / dt_warm, 3), "unit": "pairs/s",
            "pairs_total": n_pairs, "pairs_classified": n_ok,
            "includes_jit_compile": False,
            "vs_baseline": round(n_pairs / dt_warm / 100.0, 3)})


def bench_retrieval(results, smoke=False):
    """Vocab-tree retrieval queries/s (SURVEY hot loop #5)."""
    from dagsfm_tpu.features import visual_index as vi

    n_imgs = 20 if smoke else 100
    n_desc = 512
    rng = np.random.default_rng(0)
    train = np.abs(rng.normal(size=(5000, 128))).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    tree = vi.build_vocab_tree(
        train, vi.VocabTreeOptions(branching=8, depth=3), seed=0)
    index = vi.VisualIndex(tree)
    for i in range(n_imgs):
        d = np.abs(rng.normal(size=(n_desc, 128))).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        index.add(i, d)
    # warm one query (jit quantize etc. already paid in add)
    index.query(0, num_images=20)
    t0 = time.perf_counter()
    for i in range(n_imgs):
        index.query(i, num_images=20)
    dt = (time.perf_counter() - t0) / n_imgs
    results.append({
        "metric": f"vocab_retrieval_queries_per_s_{n_imgs}img",
        "value": round(1.0 / dt, 3), "unit": "queries/s",
        "vs_baseline": round(1.0 / dt / 20.0, 3)})


def bench_mapper(results, smoke=False, modes=("batch", "strict")):
    """Incremental mapping throughput from verified matches (host loop +
    device kernels; the reference's per-cluster COLMAP mapper regime).

    batch mode runs TWICE: the first pass pays every jit compile (cold),
    the second reports the warm-cache rate. strict (the reference's
    rank-one-register-one loop) then reuses the warm cache. All three
    rates are recorded (round-3 ask: warm numbers for both modes)."""
    import time as _time
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm.incremental_mapper import (IncrementalMapper,
                                                   MapperOptions)

    n = 24 if smoke else 100
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=n, num_points=40 * n, pixel_noise=0.3, seed=2,
        max_track_length=12)
    sc = synthetic.generate(spec)
    runs = [("batch", "", True), ("batch", "_warm", False),
            ("strict", "", False)]
    for mode, suffix, cold in runs:
        cams, images, graph = synthetic.to_matching_problem(sc)
        mapper = IncrementalMapper(
            cams, images, graph,
            MapperOptions(seed=0, registration_mode=mode))
        t0 = _time.time()
        rec = mapper.reconstruct()
        dt = _time.time() - t0
        reg = rec.num_reg_images()
        results.append({
            "metric": f"mapper_images_per_s_{n}img_{mode}{suffix}",
            "value": round(reg / dt, 3), "unit": "images/s",
            "registered": reg,
            "includes_jit_compile": cold,
            "vs_baseline": round(reg / dt / 0.5, 3)})


BASELINE_NOTE = (
    "vs_baseline denominators are ESTIMATES, not measurements: the "
    "reference repo publishes no benchmark numbers (BASELINE.md). "
    "Assumed: Ceres DENSE_SCHUR ~20 LM it/s @100cam; ITERATIVE_SCHUR "
    "~2 it/s @1000cam/1M obs; SiftGPU ~10 img/s; SiftGPU matcher ~100 "
    "pairs/s; COLMAP mapper ~0.5 img/s; COLMAP geometric verification "
    "~100 pairs/s; COLMAP vocab-tree query ~20 q/s. mfu_pct is vs the "
    "v5e bf16 MXU peak estimate (197 TFLOP/s) with analytic FLOP "
    "counts.")


def run_suite(smoke=False, only=None, out_path="BENCH_SUITE.json",
              echo=True):
    """Run all benchmark axes; returns the results list.

    Robustness (round-3 ask): each axis retries ONCE on failure; if it
    still fails, the previous committed value for its metrics is kept
    with "stale": true instead of the axis silently vanishing. Each
    metric is flushed to out_path as it completes.
    """
    import jax
    import jax.numpy as jnp
    from dagsfm_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    previous = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                for r in json.load(f).get("results", []):
                    previous[r.get("metric")] = r
        except (json.JSONDecodeError, OSError):
            pass

    results = []
    errors = []

    def _flush():
        for r in results:
            r.setdefault("baseline_estimate", True)
        with open(out_path, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device": str(jax.devices()[0]),
                       "baseline_note": BASELINE_NOTE,
                       "results": results, "errors": errors}, f, indent=1)
        if echo and results:
            import sys
            print(json.dumps(results[-1]), file=sys.stderr, flush=True)

    axes = [
        ("sift", lambda: bench_sift(results, smoke), ["sift_"]),
        ("match", lambda: bench_matcher(results, smoke),
         ["match_pairs_per_s_"]),
        ("match_pallas", lambda: bench_matcher_pallas(results, smoke),
         ["pallas_match_"]),
        ("match_prod", lambda: bench_matcher_production(results, smoke),
         ["match_pairs_production_"]),
        ("two_view", lambda: bench_two_view(results, smoke),
         ["two_view_"]),
        ("retrieval", lambda: bench_retrieval(results, smoke),
         ["vocab_retrieval_"]),
        ("ba", lambda: bench_ba_dense(dtype, results), ["ba_lm_"]),
        ("ba_iter", lambda: bench_ba_iterative(dtype, results, smoke),
         ["ba_iterative_"]),
        ("map", lambda: bench_mapper(results, smoke), ["mapper_"]),
    ]
    for name, fn, prefixes in axes:
        if only is not None and name not in only:
            # axis not re-run: carry the previous committed entries
            # forward unchanged so a partial --only run never erases
            # other axes from BENCH_SUITE.json
            for metric, r in previous.items():
                if any(metric.startswith(p) for p in prefixes):
                    results.append(dict(r))
            _flush()
            continue
        before = len(results)
        for attempt in (0, 1):
            try:
                fn()
                break
            except Exception as e:  # noqa: BLE001 — record, keep benching
                del results[before:]  # drop partial axis output
                errors.append({"axis": name, "attempt": attempt,
                               "error": repr(e)})
                if attempt == 1:
                    # keep the last committed value rather than losing
                    # the axis to a tunnel flake
                    for metric, r in previous.items():
                        if any(metric.startswith(p) for p in prefixes):
                            stale = dict(r)
                            stale["stale"] = True
                            results.append(stale)
        _flush()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="small sizes for CPU sanity runs")
    ap.add_argument("--only", default="",
                    help="comma list: ba,ba_iter,sift,match,match_pallas,"
                         "two_view,retrieval,map")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    results = run_suite(smoke=args.smoke, only=only)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
