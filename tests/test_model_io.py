"""COLMAP model IO round-trip tests (style of
ref: src/base/reconstruction_test.cc + scripts/python/test_read_write_model.py)."""

import numpy as np
import pytest

from sba_tpu.io import colmap_models as cm
from sba_tpu.models import Reconstruction


def make_synthetic_model():
    rng = np.random.default_rng(0)
    cameras = {
        1: cm.Camera(1, 0, 640, 480, np.array([525.0, 320.0, 240.0])),
        2: cm.Camera(2, 4, 1024, 768,
                     np.array([800.0, 810.0, 512.0, 384.0, 0.01, -0.002, 0.0, 0.0])),
    }
    images = {}
    for i in range(1, 5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n = 10
        images[i] = cm.Image(
            i, q, rng.normal(size=3), 1 if i % 2 else 2, f"image_{i}.jpg",
            rng.uniform(0, 600, size=(n, 2)),
            np.array([j if j % 3 else -1 for j in range(n)], dtype=np.int64),
        )
    points = {}
    for pid in [1, 2, 4, 5, 7, 8]:
        points[pid] = cm.Point3D(
            pid, rng.normal(size=3), rng.integers(0, 256, size=3).astype(np.uint8),
            float(rng.uniform(0, 2)),
            np.array([1, 2], dtype=np.int32), np.array([pid % 10, (pid + 1) % 10], dtype=np.int32))
    return cameras, images, points


def assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb) and set(ia) == set(ib) and set(pa) == set(pb)
    for k in ca:
        assert ca[k].model_id == cb[k].model_id
        assert ca[k].width == cb[k].width and ca[k].height == cb[k].height
        np.testing.assert_allclose(ca[k].params, cb[k].params)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec)
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(ia[k].xys, ib[k].xys)
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        assert pa[k].error == pytest.approx(pb[k].error)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)
        np.testing.assert_array_equal(pa[k].point2D_idxs, pb[k].point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_roundtrip(tmp_path, ext):
    model = make_synthetic_model()
    cm.write_model(*model, tmp_path, ext=ext)
    back = cm.read_model(tmp_path, ext=ext)
    assert_models_equal(model, back)


def test_format_autodetect(tmp_path):
    model = make_synthetic_model()
    cm.write_model(*model, tmp_path, ext=".bin")
    assert cm.detect_model_format(tmp_path) == ".bin"
    back = cm.read_model(tmp_path)
    assert_models_equal(model, back)


def test_reconstruction_read_write(tmp_path):
    model = make_synthetic_model()
    cm.write_model(*model, tmp_path / "in", ext=".bin")
    rec = Reconstruction.read(tmp_path / "in")
    assert rec.num_registered_images() == 4
    assert rec.num_points3d() == 6
    rec.write(tmp_path / "out", ext=".txt")
    back = cm.read_model(tmp_path / "out", ext=".txt")
    assert_models_equal(model, back)


def test_scene_arrays_roundtrip(tmp_path):
    model = make_synthetic_model()
    cm.write_model(*model, tmp_path, ext=".bin")
    rec = Reconstruction.read(tmp_path)
    arrays = rec.to_arrays()
    assert arrays.num_images == 4
    # Every observation references a valid triangulated point.
    assert arrays.obs_xy.shape == (arrays.num_observations, 2)
    assert arrays.obs_point.max() < arrays.num_points if arrays.num_observations else True
    # Mutate and write back.
    new_points = arrays.points + 1.0
    rec.update_from_arrays(arrays, points=new_points)
    pid0 = int(arrays.point_ids[0])
    np.testing.assert_allclose(rec.points3D[pid0].xyz, arrays.points[0] + 1.0)


def test_ply_export(tmp_path):
    model = make_synthetic_model()
    cm.export_ply(model[2], tmp_path / "cloud.ply")
    text = (tmp_path / "cloud.ply").read_text()
    assert text.startswith("ply")
    assert f"element vertex {len(model[2])}" in text


def test_observation_bookkeeping():
    cameras, images, points = make_synthetic_model()
    rec = Reconstruction()
    rec.cameras, rec.images = cameras, images
    for im in images.values():
        im.point3D_ids[:] = -1
        rec.register_image(im.image_id)
    pid = rec.add_point3d([0, 0, 5.0], [(1, 0), (2, 0)])
    assert rec.points3D[pid].image_ids.tolist() == [1, 2]
    assert rec.images[1].point3D_ids[0] == pid
    rec.add_observation(pid, 3, 2)
    assert len(rec.points3D[pid].image_ids) == 3
    rec.delete_observation(3, 2)
    assert len(rec.points3D[pid].image_ids) == 2
    # Deleting one more drops below min track length -> point removed.
    rec.delete_observation(1, 0)
    assert pid not in rec.points3D
    assert rec.images[2].point3D_ids[0] == -1


def test_export_formats(tmp_path):
    """NVM / Bundler / CAM / Recon3D / VRML exports produce parseable
    files (ref: reconstruction.cc Export* family)."""
    import jax.numpy as jnp

    from sba_tpu.io.colmap_models import Camera, Image
    from sba_tpu.models.reconstruction import Reconstruction

    rng = np.random.default_rng(0)
    rec = Reconstruction()
    rec.add_camera(Camera(1, 2, 64, 48, np.array([60.0, 32, 24, 0.01])))
    pts = rng.uniform(-1, 1, (12, 3)) + [0, 0, 5]
    for i in range(3):
        rec.add_image(Image(i + 1, np.array([1.0, 0, 0, 0]),
                            np.array([0.2 * i, 0, 0]), 1, f"im{i}.png",
                            rng.uniform(0, 40, (12, 2)),
                            np.full(12, -1, np.int64)), registered=True)
    for p in range(len(pts)):
        rec.add_point3d(pts[p], [(i + 1, p) for i in range(3)],
                        rgb=(10, 20, 30))

    nvm = tmp_path / "m.nvm"
    assert rec.export_nvm(str(nvm))
    lines = nvm.read_text().splitlines()
    assert lines[0].startswith("NVM_V3")
    assert int(lines[2]) == 3
    n_img_lines = 3
    assert int(lines[3 + n_img_lines + 1]) == 12

    out = tmp_path / "bundle"
    assert rec.export_bundler(str(out) + ".bundle.out",
                              str(out) + ".list.txt")
    bl = (tmp_path / "bundle.bundle.out").read_text().splitlines()
    assert bl[0].startswith("# Bundle file")
    assert bl[1] == "3 12"
    assert len((tmp_path / "bundle.list.txt").read_text().splitlines()) == 3

    camdir = tmp_path / "cams"
    camdir.mkdir()
    assert rec.export_cam(str(camdir))
    cam_files = sorted(camdir.glob("*.cam"))
    assert len(cam_files) == 3
    assert len(cam_files[0].read_text().splitlines()) == 2

    r3d = tmp_path / "r3d"
    r3d.mkdir()
    assert rec.export_recon3d(str(r3d))
    synth = (r3d / "Recon" / "synth_0.out").read_text().splitlines()
    assert synth[0] == "colmap 1.0"
    assert synth[1] == "3 12"

    rec.export_vrml(str(tmp_path / "i.wrl"), str(tmp_path / "p.wrl"))
    assert "Shape{" in (tmp_path / "i.wrl").read_text()
    assert "#VRML" in (tmp_path / "p.wrl").read_text()
