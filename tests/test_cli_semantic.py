"""CLI end-to-end tests for the fork's headline commands:
`semantic_bundle_adjuster` and `geometric_semantic_bundle_adjuster`
driven exactly as a reference user would — COLMAP model + TIFF
depth/semantic maps (+ cylinders text) on disk, dot-namespaced flags
(ref: exe/sfm.cc:169 RunSemanticBundleAdjuster, :200
RunGeometricSemanticBundleAdjuster)."""

import os

import numpy as np
import pytest

from sba_tpu.cli import main
from sba_tpu.geometry import camera_models
from sba_tpu.io.colmap_models import Camera, Image
from sba_tpu.io.maps import write_float_map_tiff
from sba_tpu.models.reconstruction import Reconstruction


def _write_sba_workspace(tmp_path, num_images=4):
    """make_sba_scene -> COLMAP model (noisy poses) + TIFF maps on disk.
    Returns (input_dir, data_dir, gt_poses)."""
    from sba_tpu.utils.synthetic import make_sba_scene

    q_gt, t_gt, cam_params, depth, sem, q0, t0 = make_sba_scene(
        num_images=num_images, image_size=(64, 48), pose_noise=0.01,
        cell=0.5, seed=3)

    rec = Reconstruction()
    sp = camera_models.model_by_name("SIMPLE_PINHOLE").model_id
    rec.add_camera(Camera(camera_id=1, model_id=sp, width=64, height=48,
                          params=np.asarray(cam_params[0], np.float64)))
    for i in range(num_images):
        rec.add_image(Image(image_id=i + 1, qvec=np.asarray(q0[i]),
                            tvec=np.asarray(t0[i]), camera_id=1,
                            name=f"im{i}.png",
                            xys=np.zeros((0, 2)),
                            point3D_ids=np.zeros(0, np.int64)),
                      registered=True)
    input_dir = tmp_path / "sparse_in"
    input_dir.mkdir()
    rec.write(str(input_dir))

    data_dir = tmp_path / "maps"
    data_dir.mkdir()
    for i in range(num_images):
        write_float_map_tiff(depth[i].astype(np.float32),
                             data_dir / f"im{i}_depth.tiff")
        write_float_map_tiff(sem[i].astype(np.float32),
                             data_dir / f"im{i}_semantic.tiff")
    return str(input_dir), str(data_dir), (q_gt, t_gt, q0, t0)


def test_cli_semantic_bundle_adjuster(tmp_path, capsys):
    input_dir, data_dir, (q_gt, t_gt, q0, t0) = _write_sba_workspace(
        tmp_path)
    out_dir = str(tmp_path / "sparse_out")
    run_dir = str(tmp_path / "run")
    assert main(["semantic_bundle_adjuster",
                 "--input_path", input_dir,
                 "--output_path", out_dir,
                 "--data_path", data_dir,
                 "--run_path", run_dir,
                 "--SemanticBundleAdjustment.pixel_step", "2",
                 "--SemanticBundleAdjustment.max_iterations", "30"]) == 0
    out = capsys.readouterr().out
    assert "SBA: cost" in out

    refined = Reconstruction.read(out_dir)
    t_ref = np.stack([refined.images[i + 1].tvec for i in range(4)])
    # The dense-semantic basin is ~1 pixel wide (z/f ~ 0.08 world units
    # here), so poses are judged at the observability floor, not against
    # the sub-pixel init error (same criterion as the direct-API test).
    assert np.abs(t_ref - t_gt).max() < 0.12
    # And the semantic consistency the solve optimizes must not degrade:
    # final cost <= initial cost from the CLI report.
    import re

    m = re.search(r"SBA: cost (\S+) -> (\S+)", out)
    assert float(m.group(2)) <= float(m.group(1)) + 1e-9
    # Gauge: first pose untouched.
    np.testing.assert_allclose(refined.images[1].tvec, t0[0], atol=1e-12)


def test_cli_semantic_bundle_adjuster_rejects_radial(tmp_path):
    """Reference Assert parity: non-SimplePinhole cameras are refused
    (ref: optim/semantic_bundle_adjustment.cc:604-644)."""
    input_dir, data_dir, _ = _write_sba_workspace(tmp_path)
    rec = Reconstruction.read(input_dir)
    cam = rec.cameras[1]
    rec.cameras[1] = Camera(
        camera_id=1,
        model_id=camera_models.model_by_name("SIMPLE_RADIAL").model_id,
        width=cam.width, height=cam.height,
        params=np.concatenate([cam.params, [0.01]]))
    bad_dir = tmp_path / "sparse_radial"
    bad_dir.mkdir()
    rec.write(str(bad_dir))
    with pytest.raises((ValueError, SystemExit)):
        main(["semantic_bundle_adjuster",
              "--input_path", str(bad_dir),
              "--output_path", str(tmp_path / "out"),
              "--data_path", data_dir])


def test_cli_geometric_semantic_bundle_adjuster(tmp_path, capsys):
    from sba_tpu.models.cylinder import Cylinder, write_cylinders_text
    from sba_tpu.utils.synthetic import make_gsba_scene

    q_gt, t_gt, cam_params, sem, cyl, q0, t0, cyl0 = make_gsba_scene(
        num_images=4, image_size=(64, 48), pose_noise=0.0,
        cylinder_noise=0.08, seed=1)

    rec = Reconstruction()
    sp = camera_models.model_by_name("SIMPLE_PINHOLE").model_id
    rec.add_camera(Camera(camera_id=1, model_id=sp, width=64, height=48,
                          params=np.asarray(cam_params[0], np.float64)))
    for i in range(4):
        rec.add_image(Image(image_id=i + 1, qvec=np.asarray(q0[i]),
                            tvec=np.asarray(t0[i]), camera_id=1,
                            name=f"im{i}.png",
                            xys=np.zeros((0, 2)),
                            point3D_ids=np.zeros(0, np.int64)),
                      registered=True)
    input_dir = tmp_path / "sparse_in"
    input_dir.mkdir()
    rec.write(str(input_dir))

    data_dir = tmp_path / "maps"
    data_dir.mkdir()
    for i in range(4):
        write_float_map_tiff(sem[i].astype(np.float32),
                             data_dir / f"im{i}_semantic.tiff")
        # GSBA loads depth maps too when present; none needed here.
    geom_in = str(tmp_path / "cylinders.txt")
    write_cylinders_text([cyl0], geom_in)
    geom_out = str(tmp_path / "cylinders_out.txt")

    out_dir = str(tmp_path / "sparse_out")
    assert main(["geometric_semantic_bundle_adjuster",
                 "--input_path", str(input_dir),
                 "--output_path", out_dir,
                 "--data_path", data_dir,
                 "--input_geometry", geom_in,
                 "--output_geometry", geom_out,
                 "--GeometricSemanticBundleAdjustment.refine_extrinsics",
                 "0",
                 "--GeometricSemanticBundleAdjustment.max_iterations",
                 "40"]) == 0
    out = capsys.readouterr().out
    assert "GSBA: cost" in out and "mean IoU" in out
    assert os.path.exists(geom_out)

    from sba_tpu.models.cylinder import read_cylinders_text

    (cyl_ref,) = read_cylinders_text(geom_out)
    # Cylinder pulled back toward truth from the perturbed init (center;
    # the radius trades off against tau-blurred silhouette width at this
    # tiny 64x48 resolution and is covered by the direct-API tests).
    d0 = np.linalg.norm(cyl0.tvec - cyl.tvec)
    d1 = np.linalg.norm(cyl_ref.tvec - cyl.tvec)
    assert d1 < d0, f"cylinder center error {d0:.4f} -> {d1:.4f}"
    assert abs(cyl_ref.radius - cyl.radius) < 0.08
