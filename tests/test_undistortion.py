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


def _tiny_reconstruction_with_points(tmp_path, n_images=3):
    """Registered SIMPLE_RADIAL reconstruction + images on disk."""
    from PIL import Image as PILImage

    from sba_tpu.io.colmap_models import Image, Point3D
    from sba_tpu.models.reconstruction import Reconstruction

    rng = np.random.default_rng(0)
    rec = Reconstruction()
    rec.add_camera(radial_camera(k=0.03))
    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    for i in range(n_images):
        name = f"im{i}.png"
        rec.add_image(Image(image_id=i + 1, qvec=np.array([1.0, 0, 0, 0]),
                            tvec=np.array([0.1 * i, 0, 0]), camera_id=1,
                            name=name,
                            xys=rng.uniform(10, 150, size=(4, 2)),
                            point3D_ids=np.array([1, 2, -1, -1],
                                                 np.int64)),
                      registered=True)
        PILImage.fromarray(
            rng.integers(0, 255, (160, 200), np.uint8)).save(
            img_dir / name)
    for pid in (1, 2):
        rec.add_point3d(rng.normal(size=3) + [0, 0, 5],
                        [(i + 1, pid - 1) for i in range(n_images)],
                        error=0.5)
    sparse = tmp_path / "sparse_in"
    sparse.mkdir(exist_ok=True)
    rec.write(str(sparse))
    return rec, str(img_dir), str(sparse)


def test_undistorter_colmap_workspace_configs(tmp_path):
    """COLMAP output writes patch-match.cfg / fusion.cfg / run scripts
    (ref: undistortion.cc:271-300)."""
    from sba_tpu.cli import main

    _, img_dir, sparse = _tiny_reconstruction_with_points(tmp_path)
    out = str(tmp_path / "colmap_ws")
    assert main(["image_undistorter", "--image_path", img_dir,
                 "--input_path", sparse, "--output_path", out]) == 0
    cfg = open(f"{out}/stereo/patch-match.cfg").read().splitlines()
    assert cfg[0] == "im0.png" and cfg[1] == "__auto__, 20"
    fusion = open(f"{out}/stereo/fusion.cfg").read().split()
    assert fusion == ["im0.png", "im1.png", "im2.png"]
    import os
    assert os.path.exists(f"{out}/run-colmap-photometric.sh")
    assert os.path.exists(f"{out}/run-colmap-geometric.sh")
    assert os.path.isdir(f"{out}/stereo/consistency_graphs")


def test_undistorter_pmvs_workspace(tmp_path):
    """PMVS layout: visualize/%08d.jpg, txt/%08d.txt, bundle.rd.out,
    vis.dat, option-all (ref: undistortion.cc:314-366)."""
    from sba_tpu.cli import main

    _, img_dir, sparse = _tiny_reconstruction_with_points(tmp_path)
    out = str(tmp_path / "pmvs_ws")
    assert main(["image_undistorter", "--image_path", img_dir,
                 "--input_path", sparse, "--output_path", out,
                 "--output_type", "PMVS"]) == 0
    import os
    assert os.path.exists(f"{out}/pmvs/visualize/00000000.jpg")
    ptxt = open(f"{out}/pmvs/txt/00000000.txt").read().splitlines()
    assert ptxt[0] == "CONTOUR" and len(ptxt) == 4
    P = np.array([[float(v) for v in row.split()] for row in ptxt[1:]])
    assert P.shape == (3, 4)
    vis = open(f"{out}/pmvs/vis.dat").read().splitlines()
    assert vis[0] == "VISDATA" and vis[1] == "3"
    # images 0/1/2 all co-see points 1,2 -> each sees the other two
    assert vis[2].split() == ["0", "2", "1", "2"]
    opt = open(f"{out}/pmvs/option-all").read()
    assert "level 1" in opt and "timages 3 0 1 2" in opt
    assert os.path.exists(f"{out}/pmvs/bundle.rd.out")
    assert os.path.exists(f"{out}/run-pmvs.sh")


def test_undistorter_cmpmvs_workspace(tmp_path):
    """CMP-MVS layout: %05d.jpg + %05d_P.txt
    (ref: undistortion.cc:569-596)."""
    from sba_tpu.cli import main

    _, img_dir, sparse = _tiny_reconstruction_with_points(tmp_path)
    out = str(tmp_path / "cmpmvs_ws")
    assert main(["image_undistorter", "--image_path", img_dir,
                 "--input_path", sparse, "--output_path", out,
                 "--output_type", "CMP-MVS"]) == 0
    import os
    assert os.path.exists(f"{out}/00001.jpg")
    ptxt = open(f"{out}/00001_P.txt").read().splitlines()
    assert ptxt[0] == "CONTOUR" and len(ptxt) == 4
