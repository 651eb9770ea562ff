"""Camera model tests: project/unproject round trips for all 11 models.

Mirrors the reference's camera_models_test.cc strategy: synthetic points,
exact round-trip checks per model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagsfm_tpu.scene import cameras as cm

# representative params per model (mild distortion so inversion converges)
MODEL_PARAMS = {
    cm.SIMPLE_PINHOLE: [800.0, 320.0, 240.0],
    cm.PINHOLE: [800.0, 820.0, 320.0, 240.0],
    cm.SIMPLE_RADIAL: [800.0, 320.0, 240.0, 0.08],
    cm.RADIAL: [800.0, 320.0, 240.0, 0.08, -0.02],
    cm.OPENCV: [800.0, 820.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002],
    cm.OPENCV_FISHEYE: [800.0, 820.0, 320.0, 240.0, 0.03, -0.01, 0.005, -0.002],
    cm.FULL_OPENCV: [800.0, 820.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002,
                     0.001, 0.01, -0.002, 0.001],
    cm.FOV: [800.0, 820.0, 320.0, 240.0, 0.9],
    cm.SIMPLE_RADIAL_FISHEYE: [800.0, 320.0, 240.0, 0.03],
    cm.RADIAL_FISHEYE: [800.0, 320.0, 240.0, 0.03, -0.005],
    cm.THIN_PRISM_FISHEYE: [800.0, 820.0, 320.0, 240.0, 0.03, -0.01, 0.001,
                            -0.002, 0.001, -0.0005, 0.0005, -0.0005],
}


@pytest.mark.parametrize("model_id", sorted(MODEL_PARAMS))
def test_project_unproject_roundtrip(model_id):
    params = cm.pad_params(jnp.array(MODEL_PARAMS[model_id]), model_id)
    key = jax.random.PRNGKey(model_id)
    uv = jax.random.uniform(key, (50, 2), minval=-0.35, maxval=0.35)
    xyz = jnp.concatenate([uv, jnp.ones((50, 1))], axis=-1) * 2.5

    project = jax.jit(jax.vmap(lambda p: cm.img_from_cam(model_id, params, p)))
    unproject = jax.jit(jax.vmap(lambda x: cm.cam_from_img(model_id, params, x)))

    px = project(xyz)
    assert np.all(np.isfinite(px))
    uv_back = unproject(px)
    np.testing.assert_allclose(uv_back, uv, atol=1e-6)


def test_pinhole_exact():
    model_id = cm.PINHOLE
    params = cm.pad_params(jnp.array(MODEL_PARAMS[model_id]), model_id)
    xyz = jnp.array([1.0, -0.5, 2.0])
    px = cm.img_from_cam(model_id, params, xyz)
    np.testing.assert_allclose(px, [800.0 * 0.5 + 320.0, 820.0 * -0.25 + 240.0], atol=1e-10)


def test_batched_mixed_models():
    ids = jnp.array([cm.SIMPLE_PINHOLE, cm.OPENCV, cm.RADIAL, cm.OPENCV_FISHEYE])
    params = jnp.stack([cm.pad_params(jnp.array(MODEL_PARAMS[int(i)]), int(i)) for i in ids])
    xyz = jnp.tile(jnp.array([[0.2, 0.1, 1.5]]), (4, 1))
    px = cm.img_from_cam_batched(ids, params, xyz)
    for k in range(4):
        expected = cm.img_from_cam(int(ids[k]), params[k], xyz[k])
        np.testing.assert_allclose(px[k], expected, atol=1e-9)


def test_behind_camera_finite():
    model_id = cm.SIMPLE_RADIAL
    params = cm.pad_params(jnp.array(MODEL_PARAMS[model_id]), model_id)
    px = cm.img_from_cam(model_id, params, jnp.array([0.1, 0.1, -1.0]))
    assert np.all(np.isfinite(px))


def test_camera_record():
    cam = cm.make_simple_camera(1, 640, 480)
    assert cam.model_name == "SIMPLE_PINHOLE"
    K = cam.calibration_matrix()
    assert K[0, 0] == 1.2 * 640
    assert K[0, 2] == 320
