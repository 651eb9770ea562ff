"""Camera-rig stack tests: CameraRig bookkeeping, generalized absolute /
relative pose (gPnP, 17-pt GEC), rig bundle adjustment.

Mirrors ref estimators/generalized_absolute_pose_test.cc and
generalized_relative_pose_test.cc style (synthetic rigs, exact checks)."""
import numpy as np
import jax
import jax.numpy as jnp

from dagsfm_tpu.ops import generalized_pose as gp
from dagsfm_tpu.ops import rotations as rops


def _rot(rng, scale=0.5):
    return np.asarray(rops.angleaxis_to_rotmat(
        jnp.asarray(rng.normal(0, scale, 3))))


def _make_rig_scene(rng, n=30, noise=0.0):
    """Random rig pose + 2-camera rig observing random points."""
    R_gt = _rot(rng)
    t_gt = rng.normal(0, 1, 3)
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    # two pinhole cameras offset in the rig frame
    cam_off = np.array([[-0.5, 0, 0], [0.5, 0, 0]])
    origins, dirs = [], []
    for k in range(n):
        o = cam_off[k % 2]
        p_rig = R_gt @ X[k] + t_gt
        d = p_rig - o
        d = d / np.linalg.norm(d)
        if noise:
            d = d + rng.normal(0, noise, 3)
            d = d / np.linalg.norm(d)
        origins.append(o)
        dirs.append(d)
    return (jnp.asarray(X), jnp.asarray(np.stack(origins)),
            jnp.asarray(np.stack(dirs)), R_gt, t_gt)


class TestGPnP:
    def test_exact(self):
        rng = np.random.default_rng(0)
        X, o, d, R_gt, t_gt = _make_rig_scene(rng)
        M, valid = gp.gpnp(X, o, d)
        assert bool(valid[0])
        np.testing.assert_allclose(M[0][:, :3], R_gt, atol=1e-6)
        np.testing.assert_allclose(M[0][:, 3], t_gt, atol=1e-6)

    def test_residual_zero_at_truth(self):
        rng = np.random.default_rng(1)
        X, o, d, R_gt, t_gt = _make_rig_scene(rng)
        M = jnp.asarray(np.hstack([R_gt, t_gt[:, None]]))
        r = gp.gpnp_ray_residual(M, X, o, d)
        assert float(jnp.max(r)) < 1e-12

    def test_ransac_with_outliers(self):
        from dagsfm_tpu.ops import ransac as rn
        rng = np.random.default_rng(2)
        X, o, d, R_gt, t_gt = _make_rig_scene(rng, n=60)
        d = np.array(d)
        bad = rng.choice(60, 15, replace=False)
        d[bad] = rng.normal(size=(15, 3))
        d[bad] /= np.linalg.norm(d[bad], axis=1, keepdims=True)
        res = rn.ransac(
            jax.random.PRNGKey(0), gp.gpnp, gp.gpnp_ray_residual,
            (X, o, jnp.asarray(d)), jnp.ones(60, bool),
            sample_size=8, threshold=1e-6, num_hypotheses=64)
        assert bool(res.valid)
        M = np.asarray(res.model)
        np.testing.assert_allclose(M[:, :3], R_gt, atol=1e-4)
        np.testing.assert_allclose(M[:, 3], t_gt, atol=1e-4)


class TestGeneralizedRelativePose:
    def test_17pt_exact(self):
        rng = np.random.default_rng(3)
        R_gt = _rot(rng, 0.3)
        t_gt = rng.normal(0, 0.5, 3)
        n = 24
        X1 = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 5.0])
        cam_off = np.array([[-0.4, 0, 0], [0.4, 0.1, 0], [0, -0.3, 0.1]])
        c1 = cam_off[np.arange(n) % 3]
        c2 = cam_off[(np.arange(n) + 1) % 3]
        d1 = X1 - c1
        X2 = X1 @ R_gt.T + t_gt              # x2 = R x1 + t
        d2 = X2 - c2
        M, valid = gp.generalized_relative_pose_17pt(
            jnp.asarray(d1), jnp.asarray(c1), jnp.asarray(d2),
            jnp.asarray(c2))
        assert bool(valid[0])
        M = np.asarray(M[0])
        np.testing.assert_allclose(M[:, :3], R_gt, atol=1e-5)
        t_est = M[:, 3]
        np.testing.assert_allclose(t_est / np.linalg.norm(t_est),
                                   t_gt / np.linalg.norm(t_gt), atol=1e-4)
        r = gp.gec_residual(jnp.asarray(np.hstack([R_gt, t_gt[:, None]])),
                            jnp.asarray(d1), jnp.asarray(c1),
                            jnp.asarray(d2), jnp.asarray(c2))
        assert float(jnp.max(r)) < 1e-12


class TestCameraRig:
    def _rig(self):
        from dagsfm_tpu.scene.camera_rig import CameraRig
        rig = CameraRig()
        rig.add_camera(0, np.array([1.0, 0, 0, 0]), np.zeros(3))
        q1 = np.asarray(rops.rotmat_to_quat_np(_rot(
            np.random.default_rng(5), 0.1)))
        rig.add_camera(1, q1, np.array([0.3, 0.0, 0.0]))
        rig.set_ref_camera_id(0)
        return rig

    def test_normalize_and_compose(self):
        rig = self._rig()
        rig.normalize_to_ref()
        np.testing.assert_allclose(rig.cam_from_rig_q[0],
                                   [1, 0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(rig.cam_from_rig_t[0], 0, atol=1e-12)

    def test_compute_rig_from_world(self):
        from dagsfm_tpu.scene.reconstruction import (Reconstruction,
                                                     ImageRecord)
        rig = self._rig()
        rng = np.random.default_rng(6)
        R_rw = _rot(rng)
        t_rw = rng.normal(0, 1, 3)
        q_rw = np.asarray(rops.rotmat_to_quat_np(R_rw))
        rec = Reconstruction()
        for iid, cid in ((10, 0), (11, 1)):
            q_cw, t_cw = rig.image_pose(cid, q_rw, t_rw)
            rec.add_image(ImageRecord(
                image_id=iid, name=f"i{iid}", camera_id=cid, qvec=q_cw,
                tvec=t_cw, xys=np.zeros((0, 2)),
                point3D_ids=np.zeros(0, np.int64)))
            rec.register_image(iid)
        rig.add_snapshot([10, 11])
        rig.check(rec)
        q_est, t_est = rig.compute_rig_from_world(0, rec)
        np.testing.assert_allclose(np.abs(np.dot(q_est, q_rw)), 1.0,
                                   atol=1e-9)
        np.testing.assert_allclose(t_est, t_rw, atol=1e-9)


class TestRigBA:
    def test_converges_and_respects_rig(self):
        from dagsfm_tpu.sfm import rig_bundle_adjustment as rba
        rng = np.random.default_rng(7)
        S, C, P = 4, 2, 60
        f = 500.0
        mount_q = np.stack([[1, 0, 0, 0],
                            np.asarray(rops.rotmat_to_quat_np(
                                _rot(rng, 0.05)))])
        mount_t = np.array([[0.0, 0, 0], [0.4, 0, 0]])
        rig_R = [_rot(rng, 0.2) for _ in range(S)]
        rig_t = [np.array([0.2 * s, 0, 0]) for s in range(S)]
        X = rng.uniform(-2, 2, (P, 3)) + np.array([0, 0, 8.0])
        snap_idx, cam_idx, pt_idx, obs = [], [], [], []
        for s in range(S):
            for c in range(C):
                Rm = np.asarray(rops.quat_to_rotmat_np(mount_q[c]))
                for p in range(P):
                    xr = rig_R[s] @ X[p] + rig_t[s]
                    xc = Rm @ xr + mount_t[c]
                    if xc[2] < 0.1:
                        continue
                    snap_idx.append(s); cam_idx.append(c); pt_idx.append(p)
                    obs.append(xc[:2] / xc[2] * f + 400.0)
        rig_q = np.stack([np.asarray(rops.rotmat_to_quat_np(R))
                          for R in rig_R])
        # perturb everything except gauge anchors
        rig_q_n = rig_q.copy(); rig_t_n = np.stack(rig_t).copy()
        for s in range(1, S):
            dq = np.asarray(rops.rotmat_to_quat_np(_rot(rng, 0.01)))
            Rn = np.asarray(rops.quat_to_rotmat_np(dq)) @ \
                np.asarray(rops.quat_to_rotmat_np(rig_q[s]))
            rig_q_n[s] = np.asarray(rops.rotmat_to_quat_np(Rn))
            rig_t_n[s] = rig_t_n[s] + rng.normal(0, 0.02, 3)
        X_n = X + rng.normal(0, 0.02, X.shape)
        prob = rba.RigBAProblem(
            snap_idx=jnp.asarray(snap_idx, jnp.int32),
            cam_idx=jnp.asarray(cam_idx, jnp.int32),
            pt_idx=jnp.asarray(pt_idx, jnp.int32),
            obs_xy=jnp.asarray(np.stack(obs)),
            focal=jnp.full((C,), f),
            pp=jnp.full((C, 2), 400.0),
            rig_q=jnp.asarray(rig_q_n), rig_t=jnp.asarray(rig_t_n),
            mount_q=jnp.asarray(mount_q), mount_t=jnp.asarray(mount_t),
            points=jnp.asarray(X_n))
        out = rba.solve(prob, rba.RigBAOptions(max_iterations=25))
        assert float(out.final_cost) < float(out.initial_cost) * 1e-3
        # rig constraint intact: mount 0 pinned at identity
        np.testing.assert_allclose(out.mount_q[0], [1, 0, 0, 0],
                                   atol=1e-9)
        rms = np.sqrt(2 * float(out.final_cost) / len(obs))
        assert rms < 0.05
