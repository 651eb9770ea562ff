"""Rotation algebra round-trip & identity tests (ref: src/math rotation tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.ops import rotations as rot


def random_rotmats(key, n):
    aa = jax.random.normal(key, (n, 3)) * 1.5
    return rot.angleaxis_to_rotmat(aa), aa


def test_quat_rotmat_roundtrip():
    key = jax.random.PRNGKey(0)
    R, _ = random_rotmats(key, 64)
    q = rot.rotmat_to_quat(R)
    R2 = rot.quat_to_rotmat(q)
    np.testing.assert_allclose(R, R2, atol=1e-9)


def test_rotmat_orthonormal():
    key = jax.random.PRNGKey(1)
    R, _ = random_rotmats(key, 32)
    eye = jnp.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-10)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-10)


def test_angleaxis_roundtrip():
    key = jax.random.PRNGKey(2)
    aa = jax.random.normal(key, (64, 3))
    # keep |theta| < pi so the representation is unique
    norm = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    aa = aa / norm * (norm % 3.0)
    R = rot.angleaxis_to_rotmat(aa)
    aa2 = rot.rotmat_to_angleaxis(R)
    np.testing.assert_allclose(aa, aa2, atol=1e-8)


def test_small_angle_stability():
    aa = jnp.array([[0.0, 0.0, 0.0], [1e-10, -1e-10, 1e-10], [1e-5, 0.0, 0.0]])
    R = rot.angleaxis_to_rotmat(aa)
    assert np.all(np.isfinite(R))
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-12)
    q = rot.angleaxis_to_quat(aa)
    assert np.all(np.isfinite(q))
    np.testing.assert_allclose(rot.quat_to_angleaxis(q), aa, atol=1e-12)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(3)
    R, aa = random_rotmats(key, 16)
    q = rot.rotmat_to_quat(R)
    v = jax.random.normal(jax.random.PRNGKey(4), (16, 3))
    np.testing.assert_allclose(rot.quat_rotate(q, v), (R @ v[..., None])[..., 0], atol=1e-9)
    np.testing.assert_allclose(rot.angleaxis_rotate(aa, v), (R @ v[..., None])[..., 0], atol=1e-9)


def test_quat_multiply_compose():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    R1, _ = random_rotmats(k1, 8)
    R2, _ = random_rotmats(k2, 8)
    q1, q2 = rot.rotmat_to_quat(R1), rot.rotmat_to_quat(R2)
    q12 = rot.quat_multiply(q1, q2)
    np.testing.assert_allclose(rot.quat_to_rotmat(q12), R1 @ R2, atol=1e-9)


def test_rotation_angle():
    aa = jnp.array([[0.3, 0.0, 0.0]])
    R = rot.angleaxis_to_rotmat(aa)
    ang = rot.rotation_angle_deg(jnp.eye(3)[None], R)
    np.testing.assert_allclose(ang, np.degrees(0.3), atol=1e-8)


def test_project_to_rotmat():
    key = jax.random.PRNGKey(6)
    R, _ = random_rotmats(key, 8)
    noisy = R + 0.01 * jax.random.normal(jax.random.PRNGKey(7), R.shape)
    P = rot.project_to_rotmat(noisy)
    eye = jnp.eye(3)[None].repeat(8, 0)
    np.testing.assert_allclose(P @ jnp.swapaxes(P, -1, -2), eye, atol=1e-9)
    assert float(rot.rotation_angle_deg(P, R).max()) < 2.0


def test_pose_compose_invert():
    key = jax.random.PRNGKey(8)
    R, _ = random_rotmats(key, 4)
    t = jax.random.normal(jax.random.PRNGKey(9), (4, 3))
    Ri, ti = rot.invert_pose(R, t)
    Rc, tc = rot.compose_pose(R, t, Ri, ti)
    np.testing.assert_allclose(Rc, jnp.eye(3)[None].repeat(4, 0), atol=1e-10)
    np.testing.assert_allclose(tc, jnp.zeros((4, 3)), atol=1e-10)
    C = rot.camera_center(R, t)
    # x_cam = R (C) + t = 0
    np.testing.assert_allclose((R @ C[..., None])[..., 0] + t, jnp.zeros((4, 3)), atol=1e-10)
