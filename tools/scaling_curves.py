"""Scaling-curve harness for the sharded kernels (VERDICT r3 ask #9).

Times the sharded BA LM step and the edge-sharded rotation-averaging
solve at D = 1/2/4/8 devices on the virtual CPU mesh, at production-ish
sizes (BA: 200 cameras / 100k+ observations; RA: 1000 images / 12k
edges), and records per-step wall time, the per-iteration psum payload
bytes (analytic from the collective operand shapes), and cross-D
numeric parity. Writes MULTICHIP_r04.json.

Caveat stated in the artifact: the virtual mesh multiplexes D devices
onto this host's physical cores, so wall-clock does NOT scale with D
here — the curve validates collective correctness, payload scaling and
per-device work partitioning, not ICI speedup (no multi-chip hardware
is reachable from this environment; BASELINE.md's >=0.8 efficiency
claim keeps its 'estimate' label).
"""

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


def bench_ba(D, arrays, ref_points=None):
    from dagsfm_tpu.parallel import ba_sharded as bas
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))
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
    # per-LM-iteration psum payload (iterative regime): U (I,6,6) +
    # gc (I,6) + corr (I,6) + Bblk (I,6,6) f64, plus ~cg_iters psums of
    # the (I,6) matvec partial
    cg_iters = opts.max_linear_iterations
    psum_bytes = 8 * (I * 36 * 2 + I * 6 * 2 + cg_iters * I * 6)

    out, stats = bas.solve_sharded(prob, mesh, opts)   # compile + run
    t0 = time.perf_counter()
    out, stats = bas.solve_sharded(prob, mesh, opts)
    jax.block_until_ready(out.points)
    dt = (time.perf_counter() - t0) / iters
    pts = bas.gather_points(out, shard_pts, arrays.points_xyz.shape[0])
    rec = {"devices": D, "lm_step_s": round(dt, 4),
           "psum_bytes_per_lm_iter": psum_bytes,
           "final_cost": float(stats.final_cost)}
    if ref_points is not None:
        rec["max_point_dev_vs_D1"] = float(
            np.abs(pts - ref_points).max())
    return rec, pts


def bench_ra(D, num_images, edges, rel_rot, ref_R=None):
    from dagsfm_tpu.estimation import rotation_averaging as ra

    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))
    opts = ra.RAOptions(l1_iterations=3, irls_iterations=10,
                        cg_iterations=20)
    R = ra.estimate_rotations_sharded(num_images, edges, rel_rot, mesh,
                                      opts)   # compile + run
    t0 = time.perf_counter()
    R = ra.estimate_rotations_sharded(num_images, edges, rel_rot, mesh,
                                      opts)
    dt = time.perf_counter() - t0
    # per-CG-iteration psum: the (num_images, 3) Laplacian matvec
    # partial + scalars; per outer iteration also the (E,) residual fold
    psum_bytes = 8 * (num_images * 3)
    rec = {"devices": D, "solve_s": round(dt, 3),
           "psum_bytes_per_cg_iter": psum_bytes,
           "num_images": num_images, "num_edges": int(len(edges))}
    if ref_R is not None:
        dev = np.rad2deg(np.arccos(np.clip(
            (np.einsum("nij,nij->n", R, ref_R) - 1) / 2, -1, 1)))
        rec["max_rot_dev_vs_D1_deg"] = float(dev.max())
    return rec, R


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
    # random rotations via quaternion normalization
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
    # R_rel = R_j R_i^T composed with small rotation noise
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

    record = {
        "what": "sharded-kernel scaling curves on the virtual CPU mesh "
                "(see tools/scaling_curves.py docstring for the "
                "wall-clock caveat)",
        "ba_iterative_sharded": {"num_cameras": 200, "num_obs": nobs,
                                 "curve": ba_curve},
        "rotation_averaging_sharded": {"curve": ra_curve},
        "elapsed_s": round(time.time() - t_start, 1),
    }
    with open(os.path.join(REPO, "MULTICHIP_r04.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
