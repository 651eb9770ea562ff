"""BA tests: noisy synthetic scenes must converge to ground truth.

Mirrors reference optim/bundle_adjustment_test.cc but with the closed-loop
synthetic backbone (known GT -> perturb -> solve -> compare).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import rotations as rops
from dagsfm_tpu.scene import synthetic
from dagsfm_tpu.sfm import bundle_adjustment as ba


def perturbed_problem(seed=0, num_cameras=10, num_points=150,
                      pose_noise=0.01, point_noise=0.05, pixel_noise=0.0,
                      **kw):
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=num_cameras, num_points=num_points,
        pixel_noise=pixel_noise, seed=seed)
    sc = synthetic.generate(spec)
    rec = synthetic.to_reconstruction(sc)
    arrays, ids = rec.to_arrays()

    rng = np.random.default_rng(seed + 1)
    qvec = np.array(arrays.image_qvec)
    tvec = np.array(arrays.image_tvec)
    pts = np.array(arrays.points_xyz)
    # perturb all but the first two cameras (gauge anchors)
    for i in range(2, len(qvec)):
        daa = rng.normal(0, pose_noise, 3)
        dq = np.asarray(rops.angleaxis_to_quat(jnp.asarray(daa)))
        qvec[i] = np.asarray(rops.quat_multiply(jnp.asarray(dq),
                                                jnp.asarray(qvec[i])))
        tvec[i] += rng.normal(0, pose_noise * 5, 3)
    pts += rng.normal(0, point_noise, pts.shape)

    arrays = arrays._replace(image_qvec=qvec, image_tvec=tvec,
                             points_xyz=pts)
    const_image = np.zeros(len(qvec), bool)
    const_image[:2] = True  # fix gauge
    prob = ba.make_problem(arrays, const_image=const_image, **kw)
    return prob, sc, arrays


class TestBundleAdjustment:
    def test_converges_exact_observations(self):
        prob, sc, _ = perturbed_problem(seed=0)
        before = float(ba.mean_reproj_error_px(prob))
        assert before > 1.0  # perturbation visible
        opts = ba.BAOptions(max_iterations=25, loss="trivial")
        prob2, stats = jax.jit(
            lambda p: ba.solve(p, opts))(prob)
        after = float(ba.mean_reproj_error_px(prob2))
        assert after < 1e-4, (before, after)
        assert float(stats.final_cost) < float(stats.initial_cost) * 1e-6

    def test_converges_with_pixel_noise(self):
        prob, sc, _ = perturbed_problem(seed=1, pixel_noise=0.5)
        opts = ba.BAOptions(max_iterations=25, loss="trivial")
        prob2, stats = ba.solve(prob, opts)
        after = float(ba.mean_reproj_error_px(prob2))
        # converged to noise floor (~0.5px)
        assert after < 0.7, after

    def test_robust_loss_downweights_outliers(self):
        prob, sc, arrays = perturbed_problem(seed=2, pixel_noise=0.2)
        # corrupt 10% of observations
        rng = np.random.default_rng(0)
        xy = np.array(prob.obs_xy)
        n = xy.shape[0]
        out = rng.random(n) < 0.10
        xy[out] += rng.uniform(20, 80, (out.sum(), 2))
        prob = prob._replace(obs_xy=jnp.asarray(xy))
        opts = ba.BAOptions(max_iterations=30, loss="cauchy", loss_scale=1.0)
        prob2, _ = ba.solve(prob, opts)
        # inlier reprojection error must reach the noise floor
        from dagsfm_tpu.ops import projection
        q = prob2.image_qvec[prob2.obs_image]
        t = prob2.image_tvec[prob2.obs_image]
        X = prob2.points[prob2.obs_point]
        Xc = np.asarray(jax.vmap(rops.quat_rotate)(q, X) + t)
        f, cx, cy = sc.camera.params
        proj = Xc[:, :2] / Xc[:, 2:] * f + np.array([cx, cy])
        err = np.linalg.norm(proj - xy, axis=1)
        inl_err = err[~out & np.asarray(prob2.obs_mask)]
        assert np.mean(inl_err) < 0.5, np.mean(inl_err)

    def test_gauge_fixed_cameras_unchanged(self):
        prob, _, _ = perturbed_problem(seed=3)
        q0 = np.array(prob.image_qvec[:2])
        t0 = np.array(prob.image_tvec[:2])
        prob2, _ = ba.solve(prob, ba.BAOptions(max_iterations=10))
        np.testing.assert_allclose(prob2.image_qvec[:2], q0, atol=1e-12)
        np.testing.assert_allclose(prob2.image_tvec[:2], t0, atol=1e-12)

    def test_pose_accuracy_vs_ground_truth(self):
        prob, sc, _ = perturbed_problem(seed=4, pose_noise=0.02,
                                        point_noise=0.1)
        prob2, _ = ba.solve(prob, ba.BAOptions(max_iterations=30,
                                               loss="trivial"))
        R_est = np.asarray(rops.quat_to_rotmat(prob2.image_qvec))
        ang = np.asarray(rops.rotation_angle_deg(jnp.asarray(sc.R),
                                                 jnp.asarray(R_est)))
        assert ang.max() < 0.01, ang.max()


class TestIterativeSchur:
    """ITERATIVE_SCHUR regime (ref bundle_adjustment.cc:273-284: large
    scenes use SCHUR_JACOBI-preconditioned CG, S never materialized)."""

    def test_matches_dense_solver(self):
        prob, sc, _ = perturbed_problem(seed=3, num_cameras=14,
                                        num_points=200, pixel_noise=0.4)
        opts_d = ba.BAOptions(max_iterations=10, solver="dense")
        opts_i = ba.BAOptions(max_iterations=10, solver="iterative",
                              linear_rtol=1e-10)
        outd, sd = jax.jit(lambda p: ba.solve(p, opts_d))(prob)
        outi, si = jax.jit(lambda p: ba.solve(p, opts_i))(prob)
        # tight CG tolerance -> same LM trajectory as the dense solve
        np.testing.assert_allclose(float(si.final_cost),
                                   float(sd.final_cost), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(outi.points),
                                   np.asarray(outd.points), atol=1e-5)

    def test_converges_loose_tolerance(self):
        # production tolerance (inexact Newton) still converges
        prob, sc, _ = perturbed_problem(seed=4, num_cameras=12,
                                        num_points=150)
        opts = ba.BAOptions(max_iterations=25, solver="iterative",
                            loss="trivial", linear_rtol=1e-3)
        out, stats = jax.jit(lambda p: ba.solve(p, opts))(prob)
        assert float(ba.mean_reproj_error_px(out)) < 1e-3

    def test_auto_picks_iterative_above_threshold(self):
        prob, sc, _ = perturbed_problem(seed=5, num_cameras=10,
                                        num_points=100)
        # force tiny threshold so 'auto' routes to the iterative path
        opts = ba.BAOptions(max_iterations=15, solver="auto",
                            dense_threshold=4, loss="trivial")
        out, stats = jax.jit(lambda p: ba.solve(p, opts))(prob)
        assert float(ba.mean_reproj_error_px(out)) < 1e-3

    @pytest.mark.slow
    def test_large_scene_smoke(self):
        # 300 cameras / bounded tracks: the regime the dense solver
        # cannot reach; checks the solver reduces cost substantially
        spec = synthetic.SyntheticSceneSpec(
            num_cameras=300, num_points=4000, pixel_noise=0.3, seed=7,
            max_track_length=10)
        sc = synthetic.generate(spec)
        arrays = synthetic.to_scene_arrays(sc, dtype=np.float64)
        rng = np.random.default_rng(8)
        arrays = arrays._replace(
            points_xyz=arrays.points_xyz
            + rng.normal(0, 0.02, arrays.points_xyz.shape))
        const = np.zeros(arrays.image_qvec.shape[0], bool)
        const[:2] = True
        prob = ba.make_problem(arrays, const_image=const)
        opts = ba.BAOptions(max_iterations=8, solver="iterative",
                            pinhole_only=True)
        out, stats = jax.jit(lambda p: ba.solve(p, opts))(prob)
        # converges to ~pixel-noise level
        assert float(ba.mean_reproj_error_px(out)) < 0.5
        assert float(stats.final_cost) < 0.2 * float(stats.initial_cost)


class TestIntrinsicsRefinement:
    """BA recovers perturbed camera intrinsics (ref refines focal +
    extra params by default: optim/bundle_adjustment.cc:338,
    incremental_mapper_controller.h:100-110)."""

    def _perturbed_intrinsics_problem(self, seed=5, num_cameras=10,
                                      num_points=150):
        from dagsfm_tpu.scene import cameras as cm
        spec = synthetic.SyntheticSceneSpec(
            num_cameras=num_cameras, num_points=num_points, seed=seed,
            camera_model="SIMPLE_RADIAL")
        sc = synthetic.generate(spec)
        rec = synthetic.to_reconstruction(sc)
        arrays, _ = rec.to_arrays()
        cp = np.array(arrays.cam_params)
        f_gt = cp[0, 0]
        cp[0, 0] *= 1.10      # +10% focal error
        cp[0, 3] = 0.05       # k1 error (ground truth k=0)
        arrays = arrays._replace(cam_params=cp)
        const = np.zeros(arrays.image_qvec.shape[0], bool)
        const[:2] = True
        refine = cm.intrinsics_refine_mask(
            arrays.cam_model_id, refine_focal=True,
            refine_principal=False, refine_extra=True)
        prob = ba.make_problem(arrays, const_image=const,
                               cam_refine=refine)
        return prob, f_gt

    def test_recovers_focal_and_k1_dense(self):
        prob, f_gt = self._perturbed_intrinsics_problem()
        before = float(ba.mean_reproj_error_px(prob))
        assert before > 2.0  # intrinsics error clearly visible
        opts = ba.BAOptions(max_iterations=30, loss="trivial",
                            refine_focal=True, refine_extra=True)
        out, _ = jax.jit(lambda p: ba.solve(p, opts))(prob)
        f_rec = float(out.cam_params[0, 0])
        k_rec = float(out.cam_params[0, 3])
        assert abs(f_rec - f_gt) / f_gt < 0.01, (f_rec, f_gt)
        assert abs(k_rec) < 0.005, k_rec
        assert float(ba.mean_reproj_error_px(out)) < 0.05

    def test_recovers_focal_and_k1_iterative(self):
        prob, f_gt = self._perturbed_intrinsics_problem(seed=6)
        opts = ba.BAOptions(max_iterations=30, loss="trivial",
                            refine_focal=True, refine_extra=True,
                            solver="iterative")
        out, _ = jax.jit(lambda p: ba.solve(p, opts))(prob)
        f_rec = float(out.cam_params[0, 0])
        k_rec = float(out.cam_params[0, 3])
        assert abs(f_rec - f_gt) / f_gt < 0.01, (f_rec, f_gt)
        assert abs(k_rec) < 0.01, k_rec
        assert float(ba.mean_reproj_error_px(out)) < 0.1

    def test_refine_mask_respected(self):
        """Slots outside the refine mask must not move."""
        from dagsfm_tpu.scene import cameras as cm
        prob, f_gt = self._perturbed_intrinsics_problem(seed=7)
        # focal-only refinement: k1 stays at its (wrong) prior
        refine = cm.intrinsics_refine_mask(
            np.asarray(prob.cam_model_id), refine_focal=True,
            refine_principal=False, refine_extra=False)
        prob = prob._replace(cam_refine=jnp.asarray(refine, jnp.float64))
        opts = ba.BAOptions(max_iterations=10, loss="trivial",
                            refine_focal=True)
        out, _ = ba.solve(prob, opts)
        assert float(out.cam_params[0, 3]) == 0.05
        assert float(out.cam_params[0, 1]) == float(prob.cam_params[0, 1])


def test_make_problem_image_major_invariants():
    """The image-major layout contract the iterative solver relies on:
    flat obs order IS the flattened (I, M) camera-slot layout, obs_image
    is the row-repeat pattern, trk_img mirrors obs_image[trk_obs], and
    track decimation spreads kept observations ~uniformly over images
    (the pre-fix failure mode starved all but ~T images)."""
    from dagsfm_tpu.scene import synthetic
    from dagsfm_tpu.sfm import bundle_adjustment as ba

    spec = synthetic.SyntheticSceneSpec(num_cameras=40, num_points=800,
                                        pixel_noise=0.3, seed=1)
    rec = synthetic.to_reconstruction(synthetic.generate(spec))
    arrays, _ = rec.to_arrays()
    prob = ba.make_problem(arrays, max_track_len=8)
    I, M = prob.cam_obs.shape
    N = prob.obs_xy.shape[0]
    assert N == I * M
    np.testing.assert_array_equal(np.asarray(prob.cam_obs).ravel(),
                                  np.arange(N))
    np.testing.assert_array_equal(
        np.asarray(prob.obs_image),
        np.repeat(np.arange(I, dtype=np.int32), M))
    np.testing.assert_array_equal(np.asarray(prob.cam_mask).ravel(),
                                  np.asarray(prob.obs_mask))
    ti = np.asarray(prob.trk_img)
    to = np.asarray(prob.trk_obs)
    tm = np.asarray(prob.trk_mask)
    np.testing.assert_array_equal(ti[tm],
                                  np.asarray(prob.obs_image)[to[tm]])
    # decimated observations spread across images: every image keeps a
    # healthy share (long tracks here: 800 pts x ~40 views -> T=8)
    oi = np.asarray(prob.obs_image)[np.asarray(prob.obs_mask)]
    counts = np.bincount(oi, minlength=I)
    assert counts.min() > 0.3 * counts.mean(), counts
