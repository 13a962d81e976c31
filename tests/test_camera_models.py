"""Camera model round-trip tests (style of ref: src/base/camera_models_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry import camera_models as cmod

# Per-model synthetic parameters (mild distortion so undistortion converges).
PARAMS = {
    0: [500.0, 320.0, 240.0],
    1: [500.0, 510.0, 320.0, 240.0],
    2: [500.0, 320.0, 240.0, 0.08],
    3: [500.0, 320.0, 240.0, 0.06, -0.02],
    4: [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002],
    5: [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.004, -0.002],
    6: [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002, 0.01, 0.002, -0.001, 0.0005],
    7: [500.0, 510.0, 320.0, 240.0, 0.9],
    8: [500.0, 320.0, 240.0, 0.03],
    9: [500.0, 320.0, 240.0, 0.03, -0.005],
    10: [500.0, 510.0, 320.0, 240.0, 0.03, -0.01, 0.001, -0.002, 0.0005, -0.0002, 0.001, -0.001],
}


@pytest.mark.parametrize("model_id", sorted(PARAMS))
def test_world_image_roundtrip(model_id):
    spec = cmod.model_by_id(model_id)
    assert spec.num_params == len(PARAMS[model_id])
    params = jnp.asarray(PARAMS[model_id])
    rng = np.random.default_rng(model_id)
    uv = jnp.asarray(rng.uniform(-0.4, 0.4, size=(64, 2)))
    xy = spec.world_to_image(params, uv)
    uv2 = spec.image_to_world(params, xy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-6)


@pytest.mark.parametrize("model_id", sorted(PARAMS))
def test_image_world_roundtrip(model_id):
    spec = cmod.model_by_id(model_id)
    params = jnp.asarray(PARAMS[model_id])
    rng = np.random.default_rng(100 + model_id)
    xy = jnp.asarray(rng.uniform([200, 150], [440, 330], size=(64, 2)))
    uv = spec.image_to_world(params, xy)
    xy2 = spec.world_to_image(params, uv)
    np.testing.assert_allclose(np.asarray(xy2), np.asarray(xy), atol=1e-5)


def test_principal_point_maps_to_origin():
    for model_id, p in PARAMS.items():
        spec = cmod.model_by_id(model_id)
        c = jnp.asarray(p)[jnp.asarray(spec.principal_idxs)] if spec.principal_idxs else None
        uv = spec.image_to_world(jnp.asarray(p), c[None, :])
        np.testing.assert_allclose(np.asarray(uv), 0.0, atol=1e-8,
                                   err_msg=f"model {spec.name}")


def test_switch_dispatch_matches_static():
    rng = np.random.default_rng(42)
    uv = jnp.asarray(rng.uniform(-0.3, 0.3, size=(16, 2)))
    for model_id, p in PARAMS.items():
        padded = jnp.asarray(cmod.pad_params(p))
        xy_switch = cmod.world_to_image_switch(jnp.int32(model_id), padded, uv)
        xy_static = cmod.world_to_image(model_id, jnp.asarray(p), uv)
        np.testing.assert_allclose(np.asarray(xy_switch), np.asarray(xy_static), atol=1e-10)


def test_registry_names():
    names = [m.name for m in cmod.all_models()]
    assert names == [
        "SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL", "RADIAL", "OPENCV",
        "OPENCV_FISHEYE", "FULL_OPENCV", "FOV", "SIMPLE_RADIAL_FISHEYE",
        "RADIAL_FISHEYE", "THIN_PRISM_FISHEYE",
    ]
    assert [m.model_id for m in cmod.all_models()] == list(range(11))


def test_init_params_lengths():
    for m in cmod.all_models():
        assert len(m.init_params(500.0, 640, 480)) == m.num_params
