"""Sharded BA on the virtual 8-device CPU mesh: must match single-device BA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.parallel import ba_sharded
from dagsfm_tpu.parallel.mesh import make_mesh
from dagsfm_tpu.sfm import bundle_adjustment as ba
from tests.test_bundle_adjustment import perturbed_problem


def _perturbed_arrays(seed=0):
    from dagsfm_tpu.ops import rotations as rops
    from dagsfm_tpu.scene import synthetic
    spec = synthetic.SyntheticSceneSpec(num_cameras=12, num_points=250,
                                        pixel_noise=0.0, seed=seed)
    sc = synthetic.generate(spec)
    rec = synthetic.to_reconstruction(sc)
    arrays, ids = rec.to_arrays()
    rng = np.random.default_rng(seed + 1)
    qvec = np.array(arrays.image_qvec)
    tvec = np.array(arrays.image_tvec)
    pts = np.array(arrays.points_xyz)
    for i in range(2, len(qvec)):
        daa = rng.normal(0, 0.01, 3)
        dq = np.asarray(rops.angleaxis_to_quat(jnp.asarray(daa)))
        qvec[i] = np.asarray(rops.quat_multiply(jnp.asarray(dq),
                                                jnp.asarray(qvec[i])))
        tvec[i] += rng.normal(0, 0.05, 3)
    pts += rng.normal(0, 0.05, pts.shape)
    return arrays._replace(image_qvec=qvec, image_tvec=tvec,
                           points_xyz=pts), sc


def test_sharded_ba_converges():
    arrays, sc = _perturbed_arrays(0)
    mesh = make_mesh(8)
    prob, shard_pts = ba_sharded.shard_problem(arrays, 8)
    prob = ba_sharded.place(prob, mesh)
    opts = ba.BAOptions(max_iterations=20, loss="cauchy", loss_scale=1.0)
    out, stats = ba_sharded.solve_sharded(prob, mesh, opts)
    assert float(stats.final_cost) < float(stats.initial_cost) * 1e-5, (
        float(stats.initial_cost), float(stats.final_cost))
    # pose accuracy vs GT
    from dagsfm_tpu.ops import rotations as rops
    R_est = np.asarray(rops.quat_to_rotmat(out.image_qvec))
    ang = np.asarray(rops.rotation_angle_deg(jnp.asarray(sc.R),
                                             jnp.asarray(R_est)))
    assert ang.max() < 0.01, ang.max()


def test_sharded_matches_dense():
    arrays, sc = _perturbed_arrays(3)
    # dense reference
    const = np.zeros(arrays.image_qvec.shape[0], bool)
    const[:2] = True
    dense_prob = ba.make_problem(arrays, const_image=const)
    opts = ba.BAOptions(max_iterations=15, loss="cauchy", loss_scale=1.0)
    dense_out, dense_stats = ba.solve(dense_prob, opts)

    mesh = make_mesh(8)
    sh_prob, shard_pts = ba_sharded.shard_problem(arrays, 8,
                                                  const_image=const)
    sh_prob = ba_sharded.place(sh_prob, mesh)
    sh_out, sh_stats = ba_sharded.solve_sharded(sh_prob, mesh, opts)

    # both should converge to the same (gauge-fixed) solution
    np.testing.assert_allclose(np.asarray(sh_out.image_qvec),
                               np.asarray(dense_out.image_qvec), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_out.image_tvec),
                               np.asarray(dense_out.image_tvec), atol=1e-5)
    # points: scatter back and compare
    pts = ba_sharded.gather_points(sh_out, shard_pts,
                                   arrays.points_xyz.shape[0])
    np.testing.assert_allclose(pts, np.asarray(dense_out.points), atol=1e-5)


def test_shard_problem_structure():
    arrays, _ = _perturbed_arrays(1)
    prob, shard_pts = ba_sharded.shard_problem(arrays, 4)
    assert prob.points.shape[0] == 4
    total = sum(len(s) for s in shard_pts)
    assert total == arrays.points_xyz.shape[0]
    # every observation's local point index maps back to the right point
    for d in range(4):
        om = np.asarray(prob.obs_mask[d])
        op = np.asarray(prob.obs_point[d])[om]
        assert (op < len(shard_pts[d])).all()
        np.testing.assert_allclose(
            np.asarray(prob.points[d])[op],
            np.asarray(arrays.points_xyz)[shard_pts[d][op]])


def test_sharded_iterative_matches_dense_sharded():
    """ITERATIVE_SCHUR sharded regime == dense sharded regime (tight CG
    tolerance -> identical LM trajectory)."""
    arrays, sc = _perturbed_arrays(3)
    mesh = make_mesh(8)
    prob, shard_pts = ba_sharded.shard_problem(arrays, 8)
    prob = ba_sharded.place(prob, mesh)
    opts_d = ba.BAOptions(max_iterations=10, solver="dense")
    opts_i = ba.BAOptions(max_iterations=10, solver="iterative",
                          linear_rtol=1e-11)
    outd, sd = ba_sharded.solve_sharded(prob, mesh, opts_d)
    outi, si = ba_sharded.solve_sharded(prob, mesh, opts_i)
    np.testing.assert_allclose(float(si.final_cost), float(sd.final_cost),
                               rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(outi.image_tvec),
                               np.asarray(outd.image_tvec), atol=1e-6)


def test_sharded_iterative_large_scene():
    """300-camera scene through the sharded iterative path on the
    8-device mesh — the regime dense (I,I,6,6) assembly cannot reach."""
    from dagsfm_tpu.scene import synthetic
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=300, num_points=3000, pixel_noise=0.3, seed=9,
        max_track_length=8)
    sc = synthetic.generate(spec)
    arrays = synthetic.to_scene_arrays(sc, dtype=np.float64)
    rng = np.random.default_rng(10)
    arrays = arrays._replace(
        points_xyz=arrays.points_xyz
        + rng.normal(0, 0.02, arrays.points_xyz.shape))
    mesh = make_mesh(8)
    prob, shard_pts = ba_sharded.shard_problem(arrays, 8)
    prob = ba_sharded.place(prob, mesh)
    opts = ba.BAOptions(max_iterations=8, solver="iterative",
                        pinhole_only=True)
    out, stats = ba_sharded.solve_sharded(prob, mesh, opts)
    assert float(stats.final_cost) < 0.2 * float(stats.initial_cost), (
        float(stats.initial_cost), float(stats.final_cost))


def test_solver_cache_reuse():
    """Repeated solve_sharded calls with the same mesh/opts reuse the
    compiled program (no re-trace)."""
    arrays, _ = _perturbed_arrays(4)
    mesh = make_mesh(8)
    opts = ba.BAOptions(max_iterations=3, solver="dense")
    r1 = ba_sharded._cached_solver(mesh, opts, "dense", False)
    r2 = ba_sharded._cached_solver(mesh, opts, "dense", False)
    assert r1 is r2


def test_sharded_intrinsics_refinement():
    """Sharded joint PCG recovers a perturbed focal + k1 (parity with
    the single-chip joint solver; ref refines intrinsics by default)."""
    from dagsfm_tpu.scene import cameras as cm
    from dagsfm_tpu.scene import synthetic
    mesh8 = make_mesh(8)
    spec = synthetic.SyntheticSceneSpec(
        num_cameras=12, num_points=200, seed=11,
        camera_model="SIMPLE_RADIAL")
    sc = synthetic.generate(spec)
    arrays = synthetic.to_scene_arrays(sc, dtype=np.float64)
    cp = np.array(arrays.cam_params)
    f_gt = cp[0, 0]
    cp[0, 0] *= 1.08
    cp[0, 3] = 0.03
    arrays = arrays._replace(cam_params=cp)
    refine = cm.intrinsics_refine_mask(
        arrays.cam_model_id, refine_focal=True, refine_principal=False,
        refine_extra=True)
    prob, shard_pts = ba_sharded.shard_problem(arrays, 8, cam_refine=refine)
    prob = ba_sharded.place(prob, mesh8)
    opts = ba.BAOptions(max_iterations=25, refine_focal=True,
                        refine_extra=True, loss_scale=2.0)
    out, stats = ba_sharded.solve_sharded(prob, mesh8, opts)
    f_rec = float(out.cam_params[0, 0])
    k_rec = float(out.cam_params[0, 3])
    assert abs(f_rec - f_gt) / f_gt < 0.01, (f_rec, f_gt)
    assert abs(k_rec) < 0.01, k_rec
    assert float(stats.final_cost) < 0.05 * float(stats.initial_cost)
