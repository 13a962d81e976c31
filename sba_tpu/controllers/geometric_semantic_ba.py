"""Geometric-Semantic BA controller: model + masks + cylinders workflow.

Capability parity with ref:
src/controllers/geometric_semantic_bundle_adjustment.{h,cc}
(`GeometricSemanticBundleAdjustmentController::Run` :76): >= 2 images
check, negative-depth filter, gauge fixing (first pose + tvec x of second,
:109-110), constant intrinsics (:127-131), cylinder parametrization
dispatch (:133-147), adjuster run, final cylinder export
(ref: optim/geometric_semantic_bundle_adjustment.cc:584-589).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from sba_tpu.io.maps import load_depth_semantic_maps, read_float_map_tiff, \
    find_map_path
from sba_tpu.models.cylinder import (
    Cylinder,
    read_cylinders_text,
    write_cylinders_text,
)
from sba_tpu.models.reconstruction import Reconstruction
from sba_tpu.optim.gsba import (
    GSBAOptions,
    build_gsba_problem,
    evaluate_iou,
    geometric_semantic_bundle_adjust,
)


@dataclass
class GeometricSemanticBAControllerOptions:
    """Controller options (ref: RunGeometricSemanticBundleAdjuster
    exe/sfm.cc:200 flag surface)."""

    input_path: str = ""
    output_path: str = ""
    data_path: str = ""              # per-image *_semantic .tiff dir
    input_geometry: str = ""         # cylinders text file
    output_geometry: Optional[str] = None
    run_path: Optional[str] = None
    export_steps: bool = False
    gsba: GSBAOptions = field(default_factory=GSBAOptions)


def run_geometric_semantic_bundle_adjustment(
    options: GeometricSemanticBAControllerOptions,
    reconstruction: Optional[Reconstruction] = None,
    cylinders: Optional[List[Cylinder]] = None,
    semantic_maps: Optional[np.ndarray] = None,
    callback: Optional[Callable[[int, float], bool]] = None,
):
    """Full GSBA workflow. Returns (reconstruction, cylinders, summary)."""
    rec = reconstruction or Reconstruction.read(options.input_path)

    reg = sorted(i for i in rec.images if rec.is_registered(i))
    if len(reg) < 2:
        raise ValueError(
            "geometric-semantic BA needs >= 2 registered images "
            "(ref: controllers/geometric_semantic_bundle_adjustment.cc:86)")
    rec.filter_observations_with_negative_depth()

    if cylinders is None:
        cylinders = read_cylinders_text(options.input_geometry)
    if len(cylinders) == 0:
        raise ValueError("no cylinders in input geometry")

    names = [rec.images[i].name for i in reg]
    if semantic_maps is None:
        semantic_maps = np.stack([
            read_float_map_tiff(find_map_path(
                options.data_path, n, "semantic")) for n in names])

    qvecs = np.stack([rec.images[i].qvec for i in reg])
    tvecs = np.stack([rec.images[i].tvec for i in reg])
    cam_params = np.stack([
        rec.cameras[rec.images[i].camera_id].params[:3] for i in reg])

    # Optional landmark (reprojection) term shares the scene observations
    # (ref: .cc:729-794 SetUpLandmarkError).
    points = None
    obs = None
    if options.gsba.landmark_error_weight > 0 and rec.points3D:
        arrays = rec.to_arrays(image_ids=reg)
        points = arrays.points
        obs = (arrays.obs_image, arrays.obs_point, arrays.obs_xy)

    problem = build_gsba_problem(
        qvecs, tvecs, cam_params, semantic_maps, cylinders,
        options=options.gsba, points=points, obs=obs)

    out, summary = geometric_semantic_bundle_adjust(problem, options.gsba)

    q_new = np.asarray(out.qvecs)
    t_new = np.asarray(out.tvecs)
    for row, iid in enumerate(reg):
        rec.images[iid].qvec = q_new[row]
        rec.images[iid].tvec = t_new[row]

    new_cylinders = []
    cq = np.asarray(out.cyl_qvec)
    ct = np.asarray(out.cyl_tvec)
    cr = np.exp(np.asarray(out.cyl_log_radius))
    ch = np.exp(np.asarray(out.cyl_log_height))
    for k in range(len(cylinders)):
        new_cylinders.append(Cylinder(
            qvec=cq[k], tvec=ct[k], radius=float(cr[k]),
            height=float(ch[k])))

    if options.run_path and options.export_steps:
        _export_projected_masks(options.run_path, reg, rec, new_cylinders,
                                semantic_maps, options.gsba, out, summary)

    if options.output_path:
        os.makedirs(options.output_path, exist_ok=True)
        rec.write(options.output_path)
    out_geom = options.output_geometry
    if out_geom is None and options.output_path:
        out_geom = os.path.join(options.output_path, "cylinders.txt")
    if out_geom:
        os.makedirs(os.path.dirname(out_geom) or ".", exist_ok=True)
        write_cylinders_text(new_cylinders, out_geom)

    if callback is not None:
        callback(int(np.asarray(summary.num_iterations)),
                 float(np.asarray(summary.final_cost)))
    return rec, new_cylinders, summary


def _export_projected_masks(run_path, reg, rec, cylinders, semantic_maps,
                            gsba_options, out, summary):
    """Per-image projected-cylinder-mask JPEG dumps + IoU table
    (ref: the MyClass iteration callback,
    optim/geometric_semantic_bundle_adjustment.cc:1475-1558, and the
    per-image IoU report :1089-1123)."""
    import jax.numpy as jnp

    from sba_tpu.io.maps import write_matrix_jpeg
    from sba_tpu.models.cylinder import project_quadrilateral, \
        quadrilateral_mask

    step_dir = os.path.join(run_path, "optim_steps", "final")
    os.makedirs(step_dir, exist_ok=True)
    H, W = semantic_maps.shape[-2:]
    iou = np.asarray(summary.per_image_iou)
    with open(os.path.join(step_dir, "iou.txt"), "w") as f:
        for row, iid in enumerate(reg):
            f.write(f"{rec.images[iid].name} "
                    + " ".join(f"{v:.4f}" for v in np.atleast_1d(iou[row]))
                    + "\n")
        f.write(f"mean {float(np.asarray(summary.mean_iou)):.4f}\n")
    for row, iid in enumerate(reg):
        img = rec.images[iid]
        cam = rec.cameras[img.camera_id]
        mask_total = np.zeros((H, W), np.float32)
        for cyl in cylinders:
            quad, valid = project_quadrilateral(
                jnp.asarray(cyl.qvec), jnp.asarray(cyl.tvec),
                jnp.asarray(cyl.radius), jnp.asarray(cyl.height),
                jnp.asarray(img.qvec), jnp.asarray(img.tvec),
                jnp.asarray(cam.params[:3]))
            if not bool(np.asarray(valid)):
                continue
            m = quadrilateral_mask(quad, H, W, hard=True)
            mask_total = np.maximum(mask_total, np.asarray(m, np.float32))
        stem = os.path.splitext(img.name)[0].replace("/", "_")
        write_matrix_jpeg(mask_total,
                          os.path.join(step_dir, f"{stem}_mask.jpg"),
                          vmin=0.0, vmax=1.0)
        write_matrix_jpeg(np.asarray(semantic_maps[row]),
                          os.path.join(step_dir, f"{stem}_semantic.jpg"))
