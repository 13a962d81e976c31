"""CLI surface tests: colmap-compatible commands end-to-end on tiny data
(ref: exe/colmap.cc command registry; the reference has no CLI tests —
these guard the 1:1 flag-translation contract)."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

from sba_tpu.cli import main
from sba_tpu.options import (
    apply_flags,
    parse_flags,
    read_project_ini,
    write_project_ini,
)


def _write_textured_images(tmp_path, n=3, size=160, shift=4):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    base = gaussian_filter(
        rng.standard_normal((size + n * shift, size + n * shift)), 3.0)
    base = (base - base.min()) / (base.max() - base.min())
    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    for k in range(n):
        crop = base[k * shift:k * shift + size, k * shift:k * shift + size]
        PILImage.fromarray((crop * 255).astype(np.uint8)).save(
            img_dir / f"img{k}.png")
    return str(img_dir)


def test_parse_flags():
    flags, pos = parse_flags(
        ["--a.b", "1", "--c=2", "positional", "--d", "x y"])
    assert flags == {"a.b": "1", "c": "2", "d": "x y"}
    assert pos == ["positional"]
    with pytest.raises(ValueError):
        parse_flags(["--dangling"])


def test_apply_flags_typed():
    from sba_tpu.features.sift import SiftExtractionOptions

    opt = apply_flags(SiftExtractionOptions(),
                      "SiftExtraction",
                      {"SiftExtraction.max_num_features": "123",
                       "SiftExtraction.peak_threshold": "0.01",
                       "SiftExtraction.upright": "true",
                       "Other.x": "9"})
    assert opt.max_num_features == 123
    assert abs(opt.peak_threshold - 0.01) < 1e-12
    assert opt.upright is True
    with pytest.raises(ValueError):
        apply_flags(opt, "SiftExtraction", {"SiftExtraction.nope": "1"})


def test_project_ini_roundtrip(tmp_path):
    from sba_tpu.features.sift import SiftExtractionOptions

    p = str(tmp_path / "project.ini")
    write_project_ini(p, {"SiftExtraction": SiftExtractionOptions()},
                      top_level={"database_path": "/tmp/db.db"})
    ini = read_project_ini(p)
    assert "SiftExtraction" in ini
    assert ini["SiftExtraction"]["max_num_features"] == "8192"


def test_cli_help_and_unknown(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "mapper" in out and "semantic_bundle_adjuster" in out
    assert main(["definitely_not_a_command"]) == 1


def test_cli_feature_matcher_pipeline(tmp_path, capsys):
    """database_creator -> feature_extractor -> exhaustive_matcher on real
    (tiny) images, checking DB contents after each stage."""
    img_dir = _write_textured_images(tmp_path)
    db_path = str(tmp_path / "db.db")

    assert main(["database_creator", "--database_path", db_path]) == 0
    assert main(["feature_extractor",
                 "--database_path", db_path,
                 "--image_path", img_dir,
                 "--ImageReader.camera_model", "SIMPLE_PINHOLE",
                 "--ImageReader.single_camera", "1",
                 "--SiftExtraction.max_num_features", "128",
                 "--SiftExtraction.candidates_per_octave", "256",
                 "--SiftExtraction.num_octaves", "3",
                 "--SiftExtraction.max_num_orientations", "1"]) == 0

    from sba_tpu.io.database import Database

    db = Database(db_path)
    assert db.num_images() == 3
    assert db.num_keypoints() > 30
    db.close()

    assert main(["exhaustive_matcher", "--database_path", db_path,
                 "--SiftMatching.max_distance", "1.0",
                 "--TwoViewGeometry.detect_watermark", "0",
                 "--TwoViewGeometry.min_num_inliers", "8"]) == 0
    db = Database(db_path)
    assert db.num_matches() > 10
    geoms = db.read_all_two_view_geometries()
    assert len(geoms) == 3  # all pairs attempted
    db.close()


def test_cli_model_tools(tmp_path, capsys):
    """model_converter / model_analyzer / model_comparer on a synthetic
    reconstruction written through the package API."""
    from sba_tpu.utils.synthetic import make_sba_scene
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.io import colmap_models as cm
    import jax.numpy as jnp

    # Build a small reconstruction from the BA synthetic helper.
    from sba_tpu.utils.synthetic import make_ba_problem
    problem, truth = make_ba_problem(num_images=4, num_points=50,
                                     observations_per_point=3, seed=1,
                                     dtype=jnp.float64)
    rec = Reconstruction()
    cam = cm.Camera(camera_id=1, model_id=0, width=640, height=480,
                    params=np.array([500.0, 320.0, 240.0]))
    rec.add_camera(cam)
    q = np.asarray(problem.qvecs)
    t = np.asarray(problem.tvecs)
    pts = np.asarray(problem.points)
    obs_im = np.asarray(problem.obs_image)
    obs_pt = np.asarray(problem.obs_point)
    # group observations per image
    for i in range(4):
        sel = obs_im == i
        xys = np.asarray(problem.obs_xy)[sel] * 500.0 + [320.0, 240.0]
        rec.add_image(cm.Image(
            image_id=i + 1, qvec=q[i], tvec=t[i], camera_id=1,
            name=f"im{i}.png", xys=xys,
            point3D_ids=np.full(len(xys), -1, np.int64)), registered=True)
    # add tracks
    obs_counter = {i: 0 for i in range(4)}
    per_point = {}
    for k in range(len(obs_im)):
        per_point.setdefault(int(obs_pt[k]), []).append(
            (int(obs_im[k]) + 1, obs_counter[int(obs_im[k])]))
        obs_counter[int(obs_im[k])] += 1
    for p, track in per_point.items():
        if len(track) >= 2:
            rec.add_point3d(pts[p], track)

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    rec.write(str(model_dir))

    out_txt = tmp_path / "model_txt"
    out_txt.mkdir()
    assert main(["model_converter", "--input_path", str(model_dir),
                 "--output_path", str(out_txt),
                 "--output_type", "TXT"]) == 0
    assert (out_txt / "images.txt").exists()

    assert main(["model_analyzer", "--input_path", str(model_dir)]) == 0
    out = capsys.readouterr().out
    assert "Registered images: 4" in out

    assert main(["model_comparer", "--input_path1", str(model_dir),
                 "--input_path2", str(out_txt)]) == 0
    out = capsys.readouterr().out
    assert "ATE mean: 0.000000" in out

    ply = tmp_path / "model.ply"
    assert main(["model_converter", "--input_path", str(model_dir),
                 "--output_path", str(ply), "--output_type", "PLY"]) == 0
    assert ply.exists()

def _write_sfm_database(db_path, n_images=6, n_points=250, seed=7):
    """On-disk SQLite database of a synthetic arc scene with verified
    matches (the file-level analogue of test_incremental_mapper's
    in-memory fixture) for driving DB-consuming CLI commands."""
    import jax.numpy as jnp

    from sba_tpu.geometry.quaternions import quat_to_rotmat, rotmat_to_quat
    from sba_tpu.io.database import Database

    rng = np.random.default_rng(seed)
    f, w, h = 500.0, 640, 480
    pts = rng.uniform(-2, 2, (n_points, 3))
    pts[:, 2] *= 0.5

    db = Database(db_path)
    cid = db.write_camera(model_id=0, width=w, height=h,
                          params=[f, w / 2, h / 2])
    image_ids, vis, gt = [], [], []
    for k in range(n_images):
        ang = 2 * np.pi * k / n_images
        center = np.array([4 * np.cos(ang), 4 * np.sin(ang), 2.0])
        z = -center / np.linalg.norm(center)
        x = np.cross(z, [0.0, 0.0, 1.0]); x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z])
        t = -R @ center
        pc = pts @ R.T + t
        xy = pc[:, :2] / pc[:, 2:] * f + [w / 2, h / 2]
        xy += rng.normal(0, 0.3, xy.shape)
        visible = (pc[:, 2] > 0.5) & (xy[:, 0] > 0) & (xy[:, 0] < w) \
            & (xy[:, 1] > 0) & (xy[:, 1] < h)
        iid = db.write_image(f"img{k}.png", cid)
        image_ids.append(iid)
        db.write_keypoints(iid, np.concatenate(
            [xy, np.ones_like(xy)], -1).astype(np.float32))
        vis.append(visible)
        gt.append((np.asarray(rotmat_to_quat(jnp.asarray(R))), t))
    for a in range(n_images):
        for b in range(a + 1, n_images):
            common = np.nonzero(vis[a] & vis[b])[0]
            if len(common) < 20:
                continue
            m = np.stack([common, common], -1).astype(np.uint32)
            db.write_two_view_geometry(image_ids[a], image_ids[b], m,
                                       config=2)
    db.close()
    return gt


def test_cli_mapper_end_to_end(tmp_path, capsys):
    """database file -> `mapper` command -> written model -> `model_analyzer`:
    the reference's primary invocation (exe/sfm.cc:249) at CLI scope."""
    db_path = str(tmp_path / "scene.db")
    out_dir = str(tmp_path / "sparse")
    _write_sfm_database(db_path)

    assert main(["mapper", "--database_path", db_path,
                 "--output_path", out_dir,
                 "--Mapper.init_min_num_inliers", "50",
                 "--Mapper.abs_pose_min_num_inliers", "15"]) == 0

    from sba_tpu.models.reconstruction import Reconstruction

    rec = Reconstruction.read(os.path.join(out_dir, "0"))
    assert rec.num_registered_images() == 6
    assert len(rec.points3D) > 150

    capsys.readouterr()
    assert main(["model_analyzer", "--path", os.path.join(out_dir, "0")]) == 0
    report = capsys.readouterr().out
    assert "6" in report
    import re as _re
    err = _re.search(r"reprojection error[^\d]*([\d.]+)", report, _re.I)
    assert err is not None and float(err.group(1)) < 1.0, report
