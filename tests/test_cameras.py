import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import cameras

# Test parameter vectors mirroring the reference's getTestProjections
# (/root/reference/include/visnav/camera_models.h:60-66,144-150,231-238,325-331)
PARAMS = {
    "pinhole": jnp.array([0.5 * 805, 0.5 * 800, 505, 509, 0, 0, 0, 0]),
    "eucm": jnp.array([0.5 * 500, 0.5 * 500, 319.5, 239.5, 0.51231234, 0.9, 0, 0]),
    "ds": jnp.array(
        [0.5 * 805, 0.5 * 800, 505, 509, 0.5 * -0.150694, 0.5 * 1.48785, 0, 0]
    ),
    "kb4": jnp.array(
        [379.045, 379.008, 505.512, 509.969, 0.00693023, -0.0013828,
         -0.000272596, -0.000452646]
    ),
}

# EuRoC ds calibration (calibration_file/euroc_v1_123_ds_calib.json)
EUROC_DS = jnp.array(
    [351.037283216868, 350.00745559773659, 365.8880973548215,
     249.34573836993605, -0.23853128172699646, 0.5678694845290938, 0.0, 0.0]
)


@pytest.mark.parametrize("name", cameras.CAMERA_MODELS)
def test_project_unproject_roundtrip(name):
    params = PARAMS[name]
    key = jax.random.PRNGKey(0)
    # forward-facing unit bearings (modest FoV so all models are valid)
    d = jax.random.normal(key, (256, 3)) * jnp.array([0.4, 0.4, 0.0]) + jnp.array(
        [0.0, 0.0, 1.0]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    uv = cameras.project(name, params, d)
    d2 = cameras.unproject(name, params, uv)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)


@pytest.mark.parametrize("name", cameras.CAMERA_MODELS)
def test_unproject_project_roundtrip(name):
    params = PARAMS[name]
    key = jax.random.PRNGKey(1)
    cx, cy = params[2], params[3]
    uv = jax.random.uniform(key, (256, 2)) * 200.0 + jnp.stack([cx - 100, cy - 100])
    d = cameras.unproject(name, params, uv)
    uv2 = cameras.project(name, params, d)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)


def test_project_scale_invariance():
    # projection should only depend on the ray direction
    p = jnp.array([[0.1, -0.2, 1.0]])
    for name in cameras.CAMERA_MODELS:
        uv1 = cameras.project(name, PARAMS[name], p)
        uv2 = cameras.project(name, PARAMS[name], 3.7 * p)
        np.testing.assert_allclose(uv1, uv2, atol=1e-3)


def test_euroc_ds_center():
    # optical axis should project to principal point
    uv = cameras.project("ds", EUROC_DS, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(uv, EUROC_DS[2:4], atol=1e-4)


def test_grad_flows():
    def loss(params):
        uv = cameras.project("ds", params, jnp.array([0.1, 0.2, 1.5]))
        return jnp.sum(uv**2)

    g = jax.grad(loss)(EUROC_DS)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_batched_params_broadcast():
    params = jnp.stack([PARAMS["ds"], EUROC_DS])  # [2, 8]
    p = jnp.ones((2, 5, 3)) * jnp.array([0.1, 0.2, 1.0])
    uv = cameras.project("ds", params[:, None, :], p)
    assert uv.shape == (2, 5, 2)
