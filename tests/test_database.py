"""Database round-trip tests (ref style: base/database_test.cc against
in-memory SQLite)."""

import numpy as np
import pytest

from sba_tpu.io.database import (
    Database,
    image_pair_to_pair_id,
    pair_id_to_image_pair,
)


def test_pair_id_packing():
    for a, b in [(1, 2), (2, 1), (100, 100000), (1, 2147483646)]:
        pid = image_pair_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_pair(pid) == (lo, hi)


def test_camera_image_roundtrip():
    with Database() as db:
        cid = db.write_camera(model_id=2, width=640, height=480,
                              params=[500.0, 320.0, 240.0, 0.01],
                              prior_focal_length=True)
        iid = db.write_image("img0.png", cid)
        assert db.num_cameras() == 1 and db.num_images() == 1
        cam = db.read_camera(cid)
        assert cam["model_id"] == 2
        np.testing.assert_allclose(cam["params"], [500.0, 320.0, 240.0, 0.01])
        assert cam["prior_focal_length"] is True
        imgs = db.read_images()
        assert imgs[iid]["name"] == "img0.png"
        assert db.image_id_from_name("img0.png") == iid
        with pytest.raises(KeyError):
            db.read_camera(999)
        with pytest.raises(KeyError):
            db.image_id_from_name("nope.png")


def test_features_roundtrip():
    with Database() as db:
        cid = db.write_camera(0, 100, 100, [50, 50, 50])
        iid = db.write_image("a", cid)
        kp = np.random.default_rng(0).uniform(0, 100, (77, 4)).astype(np.float32)
        desc = np.random.default_rng(1).integers(0, 256, (77, 128)).astype(np.uint8)
        db.write_keypoints(iid, kp)
        db.write_descriptors(iid, desc)
        np.testing.assert_array_equal(db.read_keypoints(iid), kp)
        np.testing.assert_array_equal(db.read_descriptors(iid), desc)
        assert db.num_keypoints() == 77
        assert db.read_keypoints(12345).shape == (0, 4)


def test_matches_swap_on_order():
    with Database() as db:
        cid = db.write_camera(0, 10, 10, [5, 5, 5])
        i1 = db.write_image("a", cid)
        i2 = db.write_image("b", cid)
        m = np.array([[0, 5], [1, 6], [2, 7]], np.uint32)
        db.write_matches(i2, i1, m)  # reversed order on write
        got = db.read_matches(i1, i2)
        np.testing.assert_array_equal(got, m[:, ::-1])
        got_rev = db.read_matches(i2, i1)
        np.testing.assert_array_equal(got_rev, m)
        assert db.num_matches() == 3


def test_two_view_geometry_roundtrip():
    with Database() as db:
        cid = db.write_camera(0, 10, 10, [5, 5, 5])
        i1 = db.write_image("a", cid)
        i2 = db.write_image("b", cid)
        m = np.array([[0, 1], [2, 3]], np.uint32)
        F = np.arange(9, dtype=np.float64).reshape(3, 3)
        db.write_two_view_geometry(i1, i2, m, config=3, F=F,
                                   qvec=[0.5, 0.5, 0.5, 0.5], tvec=[1, 2, 3])
        g = db.read_two_view_geometry(i1, i2)
        np.testing.assert_array_equal(g["inlier_matches"], m)
        assert g["config"] == 3
        np.testing.assert_allclose(g["F"], F)
        np.testing.assert_allclose(g["qvec"], [0.5, 0.5, 0.5, 0.5])
        np.testing.assert_allclose(g["tvec"], [1, 2, 3])
        allg = db.read_all_two_view_geometries()
        assert (i1, i2) in allg


def test_persistence(tmp_path):
    p = str(tmp_path / "test.db")
    db = Database(p)
    cid = db.write_camera(1, 640, 480, [500, 320, 240])
    db.write_image("x.jpg", cid)
    db.close()
    db2 = Database(p)
    assert db2.num_images() == 1
    db2.close()
