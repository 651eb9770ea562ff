"""Two-view classification tests (ref estimators/two_view_geometry_test)."""
import numpy as np
import pytest

from dagsfm_tpu.ops import two_view_classify as tvc
from dagsfm_tpu.ops import rotations as rops
import jax.numpy as jnp


K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
SIZE = (640, 480)


def general_scene(seed=0, n=100):
    rng = np.random.default_rng(seed)
    R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(
        rng.normal(0, 0.3, 3))))
    t = rng.normal(0, 1, 3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    p1 = x1 * K[0, 0] + K[:2, 2]
    p2 = x2 * K[0, 0] + K[:2, 2]
    return p1, p2, R, t


def planar_scene(seed=1, n=80):
    rng = np.random.default_rng(seed)
    R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray(
        rng.normal(0, 0.2, 3))))
    t = rng.normal(0, 0.5, 3)
    # points on the z=5 plane
    X = np.concatenate([rng.uniform(-2, 2, (n, 2)),
                        np.full((n, 1), 5.0)], 1)
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    p1 = x1 * K[0, 0] + K[:2, 2]
    p2 = x2 * K[0, 0] + K[:2, 2]
    return p1, p2, R, t / np.linalg.norm(t)


class TestClassify:
    def test_calibrated_general(self):
        p1, p2, R, t = general_scene()
        res = tvc.classify_two_view(p1, p2, K, K, SIZE, SIZE)
        assert res.config == tvc.CALIBRATED
        assert res.num_inliers > 80
        np.testing.assert_allclose(res.R, R, atol=1e-4)
        np.testing.assert_allclose(res.t, t, atol=1e-4)

    def test_planar(self):
        p1, p2, R, t = planar_scene()
        res = tvc.classify_two_view(p1, p2, K, K, SIZE, SIZE)
        assert res.config in (tvc.PLANAR, tvc.PLANAR_OR_PANORAMIC)
        assert res.H is not None
        if res.config == tvc.PLANAR and res.R is not None:
            ang = float(rops.rotation_angle_deg(jnp.asarray(R),
                                                jnp.asarray(res.R)))
            assert ang < 1.0, ang

    def test_panoramic_pure_rotation(self):
        rng = np.random.default_rng(3)
        R = np.asarray(rops.angleaxis_to_rotmat(jnp.asarray([0.0, 0.2, 0.0])))
        X = rng.uniform(-2, 2, (80, 3)) + np.array([0, 0, 6.0])
        x1 = X[:, :2] / X[:, 2:]
        Xc2 = X @ R.T          # no translation
        x2 = Xc2[:, :2] / Xc2[:, 2:]
        p1 = x1 * K[0, 0] + K[:2, 2]
        p2 = x2 * K[0, 0] + K[:2, 2]
        res = tvc.classify_two_view(p1, p2, K, K, SIZE, SIZE)
        assert res.config in (tvc.PANORAMIC, tvc.PLANAR_OR_PANORAMIC,
                              tvc.PLANAR)
        assert res.H is not None

    def test_degenerate_too_few(self):
        p1, p2, *_ = general_scene(n=10)
        res = tvc.classify_two_view(p1[:10], p2[:10], K, K, SIZE, SIZE)
        assert res.config == tvc.DEGENERATE

    def test_watermark(self):
        rng = np.random.default_rng(4)
        # identical border points (pure zero translation at image border)
        n = 60
        xs = np.concatenate([rng.uniform(0, 30, n // 2),
                             rng.uniform(610, 640, n - n // 2)])
        ys = rng.uniform(0, 480, n)
        p1 = np.stack([xs, ys], 1)
        p2 = p1 + np.array([0.3, 0.0])
        res = tvc.classify_two_view(p1, p2, K, K, SIZE, SIZE)
        assert res.config == tvc.WATERMARK


class TestPoseFromHomography:
    def test_recovers_planar_motion(self):
        p1, p2, R, t = planar_scene(seed=5)
        x1 = (p1 - K[:2, 2]) / K[0, 0]
        x2 = (p2 - K[:2, 2]) / K[0, 0]
        # exact homography from 4 points
        import jax.numpy as jnp
        from dagsfm_tpu.ops import epipolar as epi
        Hs, _ = epi.homography_dlt(jnp.asarray(x1), jnp.asarray(x2))
        R2, t2, cnt = tvc.pose_from_homography(np.asarray(Hs[0]), x1, x2)
        ang = float(rops.rotation_angle_deg(jnp.asarray(R),
                                            jnp.asarray(R2)))
        assert ang < 0.5, ang
        assert abs(abs(t2 @ t) - 1.0) < 1e-2  # direction up to sign


class TestClassifyPairs:
    """classify_pairs: the production (batched) verification path."""

    def test_batched_matches_sequential(self):
        # one compiled program over a pair batch == per-pair host loop
        rows = []
        for s in range(6):
            p1, p2, R, t = general_scene(seed=s)
            rows.append((s, p1, p2, K, K, SIZE, SIZE, True))
        seq = tvc.classify_pairs(rows, seed=7, batch_size=1)
        bat = tvc.classify_pairs(rows, seed=7, batch_size=6)
        for s in range(6):
            assert seq[s].config == bat[s].config
            assert seq[s].num_inliers == bat[s].num_inliers
            np.testing.assert_allclose(seq[s].R, bat[s].R, atol=1e-12)
            np.testing.assert_array_equal(seq[s].inlier_mask,
                                          bat[s].inlier_mask)

    def test_uncalibrated_pair_recovers_pose(self):
        # no focal prior -> F path -> pose via prior-K upgrade
        p1, p2, R, t = general_scene(seed=3)
        res = tvc.classify_pairs(
            [(0, p1, p2, K, K, SIZE, SIZE, False)], seed=0)[0]
        assert res.config == tvc.UNCALIBRATED
        assert res.F is not None and res.E is None
        ang = float(rops.rotation_angle_deg(jnp.asarray(R),
                                            jnp.asarray(res.R)))
        assert ang < 0.5, ang

    def test_mixed_batch_planar_and_general(self):
        pg = general_scene(seed=4)
        pp = planar_scene(seed=5)
        rows = [("g", pg[0], pg[1], K, K, SIZE, SIZE, True),
                ("p", pp[0], pp[1], K, K, SIZE, SIZE, True)]
        out = tvc.classify_pairs(rows, seed=0, batch_size=2)
        assert out["g"].config == tvc.CALIBRATED
        assert out["p"].config in (tvc.PLANAR, tvc.PANORAMIC,
                                   tvc.PLANAR_OR_PANORAMIC)


class TestViewGraphClassification:
    """E/F/H classification wired into the controller's view graph."""

    def test_uncalibrated_scene_builds_view_graph(self):
        from dagsfm_tpu.scene import synthetic
        from dagsfm_tpu.pipeline.distributed_mapper import (
            DistributedMapperController)
        spec = synthetic.SyntheticSceneSpec(num_cameras=8, num_points=300,
                                            pixel_noise=0.3, seed=6)
        sc = synthetic.generate(spec)
        cameras, images, graph = synthetic.to_matching_problem(sc)
        # drop the focal prior: pairs must go through the F path
        cameras = {cid: c._replace(prior_focal=False)
                   for cid, c in cameras.items()}
        ctrl = DistributedMapperController(cameras, images, graph)
        vg = ctrl.build_view_graph()
        assert len(vg.edges) >= 8
        # pose edges must match GT relative rotations
        for (i, j), e in list(vg.edges.items())[:5]:
            R_rel_gt = sc.R[j - 1] @ sc.R[i - 1].T
            ang = float(rops.rotation_angle_deg(
                jnp.asarray(R_rel_gt), jnp.asarray(e.rotation)))
            assert ang < 1.0, (i, j, ang)

    def test_precomputed_edges_short_circuit(self):
        from dagsfm_tpu.scene import synthetic
        from dagsfm_tpu.pipeline.distributed_mapper import (
            DistributedMapperController)
        spec = synthetic.SyntheticSceneSpec(num_cameras=6, num_points=200,
                                            pixel_noise=0.2, seed=8)
        sc = synthetic.generate(spec)
        cameras, images, graph = synthetic.to_matching_problem(sc)
        # GT-derived edges provided by the "matching stage"
        edges = {}
        for (i, j) in graph.image_pairs():
            R_rel = sc.R[j - 1] @ sc.R[i - 1].T
            t_rel = sc.t[j - 1] - R_rel @ sc.t[i - 1]
            edges[(i, j)] = (R_rel, t_rel, 100, tvc.CALIBRATED)
        ctrl = DistributedMapperController(cameras, images, graph,
                                           two_view_geometries=edges)
        vg = ctrl.build_view_graph()
        assert len(vg.edges) == len(edges)
