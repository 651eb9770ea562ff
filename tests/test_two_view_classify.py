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
