"""Undistortion + warping tests (ref style: base/undistortion_test.cc,
base/warp_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.geometry import camera_models
from sba_tpu.geometry.undistortion import (
    UndistortCameraOptions,
    undistort_camera,
    undistort_image,
    warp_image_between_cameras,
)
from sba_tpu.io.colmap_models import Camera


def radial_camera(k=0.05):
    return Camera(camera_id=1,
                  model_id=camera_models.model_by_name(
                      "SIMPLE_RADIAL").model_id,
                  width=200, height=160,
                  params=np.array([150.0, 100.0, 80.0, k]))


def test_undistort_camera_pinhole_output():
    cam = radial_camera()
    out = undistort_camera(cam)
    assert out.model_id == camera_models.model_by_name("PINHOLE").model_id
    assert out.params[0] == pytest.approx(150.0)  # focal preserved
    assert out.width > 0 and out.height > 0


def test_undistort_camera_identity_for_pinhole():
    cam = Camera(camera_id=1,
                 model_id=camera_models.model_by_name("PINHOLE").model_id,
                 width=200, height=160,
                 params=np.array([150.0, 150.0, 100.0, 80.0]))
    out = undistort_camera(cam)
    assert out.width == 200 and out.height == 160
    np.testing.assert_allclose(out.params, cam.params, atol=1.0)


def test_blank_pixels_monotone_viewport():
    cam = radial_camera(k=0.08)
    tight = undistort_camera(cam, UndistortCameraOptions(blank_pixels=0.0))
    loose = undistort_camera(cam, UndistortCameraOptions(blank_pixels=1.0))
    # Keeping all source pixels needs a viewport at least as large.
    assert loose.width >= tight.width
    assert loose.height >= tight.height


def test_warp_identity():
    cam = Camera(camera_id=1,
                 model_id=camera_models.model_by_name("PINHOLE").model_id,
                 width=64, height=48,
                 params=np.array([50.0, 50.0, 32.0, 24.0]))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    out = np.asarray(warp_image_between_cameras(cam, cam, jnp.asarray(img)))
    np.testing.assert_allclose(out[4:-4, 4:-4], img[4:-4, 4:-4], atol=1e-4)


def test_undistort_straightens_lines():
    """A horizontal line imaged under radial distortion becomes straight
    after undistortion — the defining property."""
    cam = radial_camera(k=0.15)
    # Synthesize the DISTORTED image of a bright horizontal world line
    # v = const: for each distorted pixel, undistort and evaluate line.
    h, w = cam.height, cam.width
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    pix = np.stack([xx.reshape(-1), yy.reshape(-1)], -1)
    uv = np.asarray(camera_models.image_to_world(
        cam.model_id, jnp.asarray(cam.params), jnp.asarray(pix)))
    v_line = 0.25
    img = np.exp(-((uv[:, 1] - v_line) / 0.01) ** 2).reshape(h, w) \
        .astype(np.float32)

    und, new_cam = undistort_image(jnp.asarray(img), cam)
    und = np.asarray(und)
    # In the undistorted image the line must sit at constant row
    # y = fy * v + cy for every column with signal.
    fy, cy = new_cam.params[1], new_cam.params[3]
    expected_row = fy * v_line + cy
    cols = range(5, new_cam.width - 5, 7)
    rows = []
    for c in cols:
        col = und[:, c]
        if col.max() > 0.3:
            rows.append(np.argmax(col))
    assert len(rows) > 10
    rows = np.asarray(rows, float)
    assert np.abs(rows - expected_row).max() < 2.0, \
        f"line not straight: rows {rows.min()}..{rows.max()}"


def test_undistort_reconstruction_keypoints():
    from sba_tpu.geometry.undistortion import undistort_reconstruction
    from sba_tpu.io.colmap_models import Image
    from sba_tpu.models.reconstruction import Reconstruction

    cam = radial_camera(k=0.05)
    rec = Reconstruction()
    rec.add_camera(cam)
    xys = np.array([[100.0, 80.0], [30.0, 20.0], [180.0, 150.0]])
    rec.add_image(Image(image_id=1, qvec=np.array([1.0, 0, 0, 0]),
                        tvec=np.zeros(3), camera_id=1, name="a",
                        xys=xys.copy(),
                        point3D_ids=np.full(3, -1, np.int64)),
                  registered=True)
    uv_before = np.asarray(camera_models.image_to_world(
        cam.model_id, jnp.asarray(cam.params), jnp.asarray(xys)))
    undistort_reconstruction(rec)
    new_cam = rec.cameras[1]
    img = rec.images[1]
    uv_after = np.asarray(camera_models.image_to_world(
        new_cam.model_id, jnp.asarray(new_cam.params),
        jnp.asarray(img.xys)))
    # Same viewing rays through either camera model.
    np.testing.assert_allclose(uv_after, uv_before, atol=1e-8)
