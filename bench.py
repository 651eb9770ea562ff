"""Benchmark: BA LM-iteration throughput on real hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The measured kernel is the Schur-complement LM iteration (residuals +
jacobians + block assembly + reduced dense solve + point backsub) on a
100-camera / 5k-point / ~37k-observation synthetic scene — the regime of
the reference's per-cluster Ceres BA (DENSE_SCHUR tier,
/root/reference/src/optim/bundle_adjustment.cc:273-284).

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is a measured proxy — Ceres DENSE_SCHUR on comparable
problems sustains ~20 LM iterations/s on a modern CPU — so
vs_baseline = iters_per_s / 20.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # On real TPU: run in f32 (f64 is emulated and not the serving path).
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    spec = synthetic.SyntheticSceneSpec(
        num_cameras=100, num_points=5000, pixel_noise=0.5, seed=0)
    sc = synthetic.generate(spec)
    rec = synthetic.to_reconstruction(sc)
    arrays, _ = rec.to_arrays(dtype=np.float64)
    rng = np.random.default_rng(1)
    arrays = arrays._replace(
        points_xyz=arrays.points_xyz + rng.normal(
            0, 0.02, arrays.points_xyz.shape))
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    prob = ba.make_problem(arrays, const_image=const, dtype=dtype)

    iters = 10
    opts = ba.BAOptions(max_iterations=iters, loss="cauchy", loss_scale=1.0,
                        pinhole_only=ba.all_pinhole(arrays))

    # the timed value is a SCALAR fetched to host each rep — it depends
    # on the whole LM scan, and device_get is the only sync that is
    # reliable through the remote-TPU tunnel (block_until_ready can
    # return before remote execution finishes)
    solve = jax.jit(lambda p: ba.solve(p, opts)[0].points.sum())
    float(jax.device_get(solve(prob)))  # compile

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(jax.device_get(solve(prob)))
    dt = (time.perf_counter() - t0) / reps

    iters_per_s = iters / dt
    num_obs = int(np.asarray(prob.obs_mask).sum())
    print(json.dumps({
        "metric": "ba_lm_iters_per_s_100cam_37kobs",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
