"""Tests for profiling utils, image reader EXIF priors, database
management commands (ref style: util/timer_test.cc, base/image_reader
behavior)."""

import os
import time

import numpy as np
import pytest
from PIL import Image as PILImage

from sba_tpu.utils.profiling import Metrics, Timer


def test_timer_basics():
    t = Timer().start()
    time.sleep(0.02)
    assert 0.01 < t.elapsed_seconds() < 1.0
    t.pause()
    e1 = t.elapsed_seconds()
    time.sleep(0.02)
    assert t.elapsed_seconds() == pytest.approx(e1, abs=1e-6)
    t.resume()
    time.sleep(0.01)
    assert t.elapsed_seconds() > e1
    t.restart()
    assert t.elapsed_seconds() < 0.01


def test_metrics_phases():
    m = Metrics()
    with m.phase("ba"):
        time.sleep(0.01)
    with m.phase("ba"):
        pass
    m.set("ate", 0.5)
    m.add("registered", 3)
    m.add("registered", 2)
    d = m.as_dict()
    assert d["phases"]["ba"]["count"] == 2
    assert d["phases"]["ba"]["seconds"] > 0.005
    assert d["values"] == {"ate": 0.5, "registered": 5.0}
    assert "ba" in m.report()


def test_exif_focal_prior(tmp_path):
    from sba_tpu.io.image_reader import (
        camera_params_for_image,
        focal_length_from_exif,
    )

    p = str(tmp_path / "exif.jpg")
    im = PILImage.fromarray(
        np.zeros((120, 160), np.uint8))
    exif = PILImage.Exif()
    exif[0x8769] = {0xA405: 50}  # ExifIFD: FocalLengthIn35mmFilm = 50mm
    im.save(p, exif=exif)
    focal, has = focal_length_from_exif(p, 160, 120)
    assert has
    assert focal == pytest.approx(50 / 36 * 160)

    name, params, prior = camera_params_for_image(p, 160, 120)
    assert name == "SIMPLE_RADIAL"
    assert prior and params[0] == pytest.approx(50 / 36 * 160)
    assert params[1:3] == [80.0, 60.0]

    # No EXIF -> default factor fallback.
    p2 = str(tmp_path / "plain.png")
    PILImage.fromarray(np.zeros((120, 160), np.uint8)).save(p2)
    name, params, prior = camera_params_for_image(p2, 160, 120)
    assert not prior
    assert params[0] == pytest.approx(1.2 * 160)


def test_database_cleaner_and_merger(tmp_path):
    from sba_tpu.cli import main
    from sba_tpu.io.database import Database

    def make_db(path, prefix):
        db = Database(path)
        cid = db.write_camera(0, 64, 64, [50, 32, 32])
        i1 = db.write_image(f"{prefix}_a.png", cid)
        i2 = db.write_image(f"{prefix}_b.png", cid)
        db.write_keypoints(i1, np.zeros((5, 4), np.float32))
        db.write_descriptors(i1, np.zeros((5, 128), np.uint8))
        db.write_matches(i1, i2, np.array([[0, 1]], np.uint32))
        db.write_two_view_geometry(i1, i2, np.array([[0, 1]], np.uint32))
        db.close()

    p1 = str(tmp_path / "a.db")
    p2 = str(tmp_path / "b.db")
    make_db(p1, "x")
    make_db(p2, "y")

    merged = str(tmp_path / "m.db")
    assert main(["database_merger", "--database_path1", p1,
                 "--database_path2", p2,
                 "--merged_database_path", merged]) == 0
    db = Database(merged)
    assert db.num_images() == 4
    assert db.num_matches() == 2
    db.close()

    assert main(["database_cleaner", "--database_path", merged,
                 "--type", "matches"]) == 0
    db = Database(merged)
    assert db.num_matches() == 0
    assert db.num_images() == 4
    db.close()

    assert main(["database_cleaner", "--database_path", merged,
                 "--type", "all"]) == 0
    db = Database(merged)
    assert db.num_images() == 0 and db.num_cameras() == 0
    db.close()
